"""EAR two-pass row-budget sweep (run on the TPU).

Times `df4_twopass` + device finalize at several row budgets R and
reports per-R throughput and overflow rates, on the bench workload
(552 seq x 782 atoms, CSF + 10 EAR diffusivities, 512-voxel chunks).
The production budget (config.twopass_rows_ear) should sit where
throughput x (1 - overflow-cost) peaks; overflowing voxels re-solve at
2R then full grid (models/fit.run_bucket_fast), so percent-level
overflow is acceptable.

Usage: python examples/ear_rsweep.py [chunk]
"""

import os
import sys
import time

import numpy as np

# allow running from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax          # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main(chunk=512, reps=5):
    from microstructure_fingerprinting_tpu import testing as mft
    from microstructure_fingerprinting_tpu.ops import interp as mfi
    from microstructure_fingerprinting_tpu.ops import f32scan
    from microstructure_fingerprinting_tpu.models.fit import _finalize_top1
    from microstructure_fingerprinting_tpu.utils.scheme import b_values
    import microstructure_fingerprinting_tpu as mf
    mf.enable_compile_cache()

    wl = mft.make_fit_workload(num_atom=782, n_vox=chunk)
    ms, plan = wl["msinterp"], wl["plan"]
    _xs, ys_t, _cnt = ms.device_tables()
    dt = ys_t.dtype
    rot, perm = mfi.make_grouped_rotation_paired(ms, plan)
    pk = jnp.asarray(wl["peaks"].astype(dt))
    y_np = np.asarray(wl["y"])[:, perm] if perm is not None \
        else np.asarray(wl["y"])
    sch = wl["sch_mat"]
    TE, b = sch[:, 6], b_values(sch)
    if perm is not None:
        TE, b = TE[perm], b[perm]
    Dear = np.linspace(0.8e-9, 2.6e-9, 10)
    sig_ear = np.exp(-TE / 0.8)[:, None] * np.exp(-b[:, None] * Dear[None])
    # plant an EAR component so the workload matches the bench's
    y_np = y_np + 35 * sig_ear[:, 4][None, :]
    y = jnp.asarray(y_np.astype(dt))
    csf_np = np.asarray(wl["sig_csf"])[perm] if perm is not None \
        else np.asarray(wl["sig_csf"])
    csf_d = jnp.asarray(csf_np.astype(dt))
    ear_d = jnp.asarray(sig_ear.astype(dt))
    S = y.shape[1]
    D = rot(ys_t, pk)
    csf_blk = jnp.broadcast_to(csf_d[None, :, None], (chunk, S, 1))
    ear_blk = jnp.broadcast_to(ear_d[None], (chunk, S, 10))

    for R in (64, 128, 192, 256):
        def step():
            c, _v, _q, ok = f32scan.df4_twopass(
                D[:, 0], D[:, 1], csf_blk, ear_blk, y, M=1, R=R)
            w, obj, r2 = _finalize_top1(D, csf_d, ear_d, y, c[:, 0],
                                        csf_on=True, ear_on=True, K=2)
            return c, ok, w, obj, r2
        out = step()
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = step()
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        n_bad = int(np.sum(~np.asarray(out[1])))
        print("R=%3d  %7.1f ms  -> %6.0f vox/s   overflow %d/%d"
              % (R, t * 1e3, chunk / t, n_bad, chunk))


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["chunk"] = int(sys.argv[1])
    main(**kw)
