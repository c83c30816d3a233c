"""I/O + infrastructure tests: interpolator disk cache, profiling hooks,
loadmat struct conversion."""

import numpy as np

from conftest import fixture_path, has_fixture

from microstructure_fingerprinting_tpu.ops import interp as mfi
from microstructure_fingerprinting_tpu.utils import io as mfio
from microstructure_fingerprinting_tpu.utils.profiling import StageTimer
from microstructure_fingerprinting_tpu import testing as mft


def test_interpolator_save_load(tmp_path):
    sch = mft.make_dense_scheme(n_shells=3, dirs_per_shell=16, n_b0=4)
    sig, _, _ = mft.make_dictionary(sch, num_atom=20)
    ms = mfi.init_PGSE_multishell_interp(sig, sch, np.array([0.0, 0, 1.0]))
    path = ms.save(str(tmp_path / "tables.npz"))
    ms2 = mfi.MultiShellInterp.load(path)
    assert np.array_equal(ms.xs, ms2.xs)
    assert np.array_equal(ms.ys, ms2.ys)
    assert np.array_equal(ms.cnt, ms2.cnt)
    assert ms2.num_subs == 20
    d = np.array([0.3, 0.4, np.sqrt(1 - 0.25)])
    a = mfi.interp_PGSE_from_multishell(sch, d, msinterp=ms)
    b = mfi.interp_PGSE_from_multishell(sch, d, msinterp=ms2)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_stage_timer():
    import jax.numpy as jnp
    t = StageTimer()
    with t.stage("work"):
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    with t.stage("work", sync_value=x):
        x = x + 1
    totals = t.report(printer=lambda *_: None)
    assert totals["work"] > 0


def test_nifti_slope_zero_means_no_scaling():
    """nibabel semantics: scl_slope of 0 (or NaN) disables scaling entirely,
    including the intercept (ADVICE round 1)."""
    from microstructure_fingerprinting_tpu.utils import nifti
    data = np.arange(6.0).reshape(2, 3)
    img = nifti.NiftiImage(data, np.eye(4),
                           header={"scl_slope": 0.0, "scl_inter": 5.0})
    assert np.array_equal(img.get_fdata(), data)
    img = nifti.NiftiImage(data, np.eye(4),
                           header={"scl_slope": np.nan, "scl_inter": 5.0})
    assert np.array_equal(img.get_fdata(), data)
    img = nifti.NiftiImage(data, np.eye(4),
                           header={"scl_slope": 2.0, "scl_inter": 1.0})
    assert np.array_equal(img.get_fdata(), data * 2.0 + 1.0)


def test_loadmat_nested_structs():
    if not has_fixture("MC_dictionary_hcp.mat"):
        import pytest
        pytest.skip("fixture unavailable")
    d = mfio.loadmat(fixture_path("MC_dictionary_hcp.mat"))
    # nested Matlab struct comes back as a plain dict
    assert isinstance(d["subinfo"], dict)
    assert "rad" in d["subinfo"]
    assert np.asarray(d["subinfo"]["rad"]).ndim == 1
