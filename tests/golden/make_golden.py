"""Regenerate the frozen end-to-end golden fixture.

Mirrors the reference's C001 golden-map strategy
(/root/reference/tests/integration/fixtures/C001_small_tensorfiles_mf_ref_*.nii):
a small generated dictionary + a noisy synthetic volume + the expected
parameter maps produced by MFModel.fit, committed so that ANY refactor
that changes a map value fails tests/test_golden.py.

Run from the repo root (CPU, x64 — the float64 reference-parity path):

    JAX_PLATFORMS=cpu JAX_ENABLE_X64=true python tests/golden/make_golden.py

The fixture is one .npz holding the dictionary contract arrays, the
volume/mask/peaks inputs, and every output map.
"""

import os
import sys

import numpy as np


def build_inputs():
    from microstructure_fingerprinting_tpu import testing as mft
    from microstructure_fingerprinting_tpu.ops.noise import gen_SoS_MRI
    from microstructure_fingerprinting_tpu.utils.scheme import b_values

    rng = np.random.RandomState(20260817)
    sch = mft.make_dense_scheme(n_shells=4, dirs_per_shell=16, n_b0=6)
    sig, dpar, dperp = mft.make_dictionary(sch, num_atom=60)
    num_atom = sig.shape[1]
    TE = sch[:, 6]
    b = b_values(sch)
    dic = {
        "dictionary": sig,
        "sch_mat": sch,
        "orientation": np.array([0.0, 0.0, 1.0]),
        "num_atom": num_atom,
        "num_ear": 4,
        "fasc_propnames": ["dpar", "dperp"],
        "dpar": dpar,
        "dperp": dperp,
        "T2_csf": 2.0,
        "DIFF_csf": 3.0e-9,
        "T2_ear": 0.8,
        "DIFF_ear": np.linspace(0.8e-9, 2.6e-9, 4),
    }
    sig_csf = np.exp(-TE / dic["T2_csf"]) * np.exp(-b * dic["DIFF_csf"])
    sig_ear = (np.exp(-TE / dic["T2_ear"])[:, None]
               * np.exp(-b[:, None] * dic["DIFF_ear"][None, :]))

    # 4 x 3 x 2 volume, mixed configurations incl. a masked-out voxel
    shape = (4, 3, 2)
    nvox = int(np.prod(shape))
    mask = np.ones(shape)
    mask[3, 2, 1] = 0
    numfasc = rng.randint(0, 3, size=shape).astype(float)
    csf_mask = (rng.rand(*shape) > 0.3).astype(float)
    ear_mask = (rng.rand(*shape) > 0.5).astype(float)
    # every voxel needs at least one compartment
    numfasc[(numfasc + csf_mask + ear_mask) == 0] += 1

    pk = rng.randn(nvox, 2, 3)
    pk /= np.linalg.norm(pk, axis=2, keepdims=True)
    peaks = pk.reshape(shape + (6,))

    # noiseless synthesis with the host-exact rotation, then Rician noise
    from microstructure_fingerprinting_tpu.ops.interp import (
        init_PGSE_multishell_interp, interp_PGSE_from_multishell)
    ms = init_PGSE_multishell_interp(sig, sch, dic["orientation"])
    S0 = 320.0
    data = np.zeros(shape + (sch.shape[0],))
    np.random.seed(77)                    # gen_SoS_MRI uses global state
    for vox in np.ndindex(shape):
        K = int(numfasc[vox])
        nu = rng.rand(K + 2) + 0.3
        nu[K] *= csf_mask[vox]
        nu[K + 1] *= ear_mask[vox]
        if nu.sum() == 0:
            continue
        nu /= nu.sum()
        y = np.zeros(sch.shape[0])
        for k in range(K):
            pk = peaks[vox][3 * k:3 * k + 3]
            ids = rng.randint(0, num_atom)
            D = interp_PGSE_from_multishell(sch, pk, msinterp=ms)
            y += nu[k] * np.asarray(D, np.float64)[:, ids]
        y += nu[K] * sig_csf
        y += nu[K + 1] * sig_ear[:, rng.randint(0, 4)]
        data[vox] = gen_SoS_MRI(S0 * y, sigma_g=S0 * 0.01, N=1)
    return dic, data, mask, numfasc, peaks, csf_mask, ear_mask


def main(out_path):
    import jax
    assert jax.default_backend() == "cpu" and jax.config.jax_enable_x64, \
        "regenerate on CPU with JAX_ENABLE_X64=true (reference-parity path)"
    from microstructure_fingerprinting_tpu import MFModel
    dic, data, mask, numfasc, peaks, csf_mask, ear_mask = build_inputs()
    model = MFModel(dic)
    fit = model.fit(data, mask, numfasc, peaks=peaks,
                    pgse_scheme=dic["sch_mat"], csf_mask=csf_mask,
                    ear_mask=ear_mask, verbose=0)
    out = {
        "data": data, "mask": mask, "numfasc": numfasc, "peaks": peaks,
        "csf_mask": csf_mask, "ear_mask": ear_mask,
        "sch_mat": dic["sch_mat"], "dictionary": dic["dictionary"],
        "orientation": dic["orientation"], "dpar": dic["dpar"],
        "dperp": dic["dperp"], "DIFF_ear": dic["DIFF_ear"],
        "param_names": np.array(fit.param_names),
    }
    for p in fit.param_names:
        out["map_" + p] = getattr(fit, p)
    np.savez_compressed(out_path, **out)
    print("wrote %s with %d maps" % (out_path, len(fit.param_names)))


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    main(sys.argv[1] if len(sys.argv) > 1
         else os.path.join(here, "golden_fit.npz"))
