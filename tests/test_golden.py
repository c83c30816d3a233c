"""Frozen end-to-end golden regression (mirror of the reference's C001
golden maps, /root/reference/tests/integration/fixtures/
C001_small_tensorfiles_mf_ref_*.nii, which ship expected MFModel.fit
output maps). The fixture (tests/golden/golden_fit.npz) pins the full
pipeline's numeric output — dictionary precompute, rotation, exhaustive
scan, finalize, map assembly — so a refactor that changes ANY map value
fails here. Regenerate only for intentional behavior changes:
tests/golden/make_golden.py."""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_fit.npz")


@pytest.mark.skipif(not os.path.isfile(GOLDEN),
                    reason="golden fixture not generated")
def test_golden_fit_maps(tmp_path):
    from microstructure_fingerprinting_tpu import MFModel
    g = np.load(GOLDEN, allow_pickle=False)
    dic = {
        "dictionary": g["dictionary"],
        "sch_mat": g["sch_mat"],
        "orientation": g["orientation"],
        "num_atom": g["dictionary"].shape[1],
        "num_ear": g["DIFF_ear"].size,
        "fasc_propnames": ["dpar", "dperp"],
        "dpar": g["dpar"],
        "dperp": g["dperp"],
        "T2_csf": 2.0,
        "DIFF_csf": 3.0e-9,
        "T2_ear": 0.8,
        "DIFF_ear": g["DIFF_ear"],
    }
    model = MFModel(dic)
    fit = model.fit(g["data"], g["mask"], g["numfasc"], peaks=g["peaks"],
                    pgse_scheme=g["sch_mat"], csf_mask=g["csf_mask"],
                    ear_mask=g["ear_mask"], verbose=0)
    names = [str(p) for p in g["param_names"]]
    assert fit.param_names == names
    scale = {p: max(1.0, float(np.max(np.abs(g["map_" + p]))))
             for p in names}
    for p in names:
        np.testing.assert_allclose(
            getattr(fit, p), g["map_" + p], rtol=0, atol=1e-5 * scale[p],
            err_msg="golden map regression: %s" % p)
    # write_nifti round-trip stays exact against the in-memory maps
    base = str(tmp_path / "g")
    files = fit.write_nifti(base, affine=np.eye(4))
    assert len(files) == len(names)
