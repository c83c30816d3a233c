"""Per-stage device timings of the fast fit path (run on the TPU).

Measures, at bench shapes (552 seq x 782 atoms, 512-voxel chunks):
rotation, one-pass fused df3 kernel, two-pass stages (f32 row scan,
row selection, gathered df re-scan), finalize — so regressions and wins
are attributable. Prints one line per stage; all timings are medians of
``reps`` with a warmup, synchronized via block_until_ready.
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# allow running from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main(num_atom=782, chunk=512, reps=5):
    from microstructure_fingerprinting_tpu import testing as mft
    from microstructure_fingerprinting_tpu.ops import interp as mfi
    from microstructure_fingerprinting_tpu.ops import dfscan, f32scan
    from microstructure_fingerprinting_tpu.models.fit import _finalize_top1
    import microstructure_fingerprinting_tpu as mf
    mf.enable_compile_cache()

    wl = mft.make_fit_workload(num_atom=num_atom, n_vox=chunk)
    ms, plan = wl["msinterp"], wl["plan"]
    xs, ys_t, cnt = ms.device_tables()
    dt = ys_t.dtype
    rot, perm = mfi.make_grouped_rotation_paired(ms, plan)
    pk = jnp.asarray(wl["peaks"].astype(dt))
    y_np = np.asarray(wl["y"])[:, perm] if perm is not None \
        else np.asarray(wl["y"])
    y = jnp.asarray(y_np.astype(dt))
    csf_np = np.asarray(wl["sig_csf"])[perm] if perm is not None \
        else np.asarray(wl["sig_csf"])
    csf_d = jnp.asarray(csf_np.astype(dt))
    S = y.shape[1]

    t_rot, D = timed(lambda: rot(ys_t, pk), reps)
    print("rotation          %7.1f ms" % (t_rot * 1e3))
    csf_blk = jnp.broadcast_to(csf_d[None, :, None], (chunk, S, 1))
    A1, A2 = D[:, 0], D[:, 1]

    if jax.default_backend() == "tpu":
        from microstructure_fingerprinting_tpu.ops import pallas_dfscan \
            as pdf
        t_fused, (rr, ri, _q) = timed(
            lambda: pdf.row_scan_df3(A1, A2, csf_blk, y), reps)
        print("one-pass fused    %7.1f ms" % (t_fused * 1e3))

    on_tpu = jax.default_backend() == "tpu"
    t_rm, (lo, up, upf) = timed(
        lambda: f32scan.rowmin_3(A1, A2, csf_blk, y, pallas=on_tpu), reps)
    print("two-pass: rowmin  %7.1f ms" % (t_rm * 1e3))
    R = 256
    t_sel, (rows, ok, _oh) = timed(
        lambda: f32scan._select_rows(lo, up, upf, R), reps)
    n_bad = int(np.sum(~np.asarray(ok)))
    print("two-pass: select  %7.1f ms   overflow %d/%d"
          % (t_sel * 1e3, n_bad, chunk))

    def stage2():
        A1s = jnp.take_along_axis(A1, rows[:, None, :], axis=2)
        return dfscan.df3_candidates(A1s, A2, csf_blk, y, M=1)
    t_s2, (cand, vals, _) = timed(stage2, reps)
    print("two-pass: df scan %7.1f ms" % (t_s2 * 1e3))

    t_tp, _ = timed(lambda: f32scan.df3_twopass(A1, A2, csf_blk, y,
                                                M=1, R=R), reps)
    print("two-pass: total   %7.1f ms" % (t_tp * 1e3))

    def fin():
        c, _v, _q, _ok = f32scan.df3_twopass(A1, A2, csf_blk, y, M=1, R=R)
        return _finalize_top1(D, csf_d, None, y, c[:, 0],
                              csf_on=True, ear_on=False, K=2)
    t_fin, _ = timed(fin, reps)
    print("twopass+finalize  %7.1f ms  -> %7.0f vox/s (scan+fin only)"
          % (t_fin * 1e3, chunk / t_fin))

    # EAR bucket
    from microstructure_fingerprinting_tpu.utils.scheme import b_values
    sch = wl["sch_mat"]
    TE, b = sch[:, 6][perm], b_values(sch)[perm]
    Dear = np.linspace(0.8e-9, 2.6e-9, 10)
    sig_ear = np.exp(-TE / 0.8)[:, None] * np.exp(-b[:, None] * Dear[None])
    ear_d = jnp.asarray(sig_ear.astype(dt))
    ear_blk = jnp.broadcast_to(ear_d[None], (chunk, S, 10))
    t_rm4, (lo4, up4, upf4) = timed(
        lambda: f32scan.rowmin_4(A1, A2, csf_blk, ear_blk, y,
                                 pallas=on_tpu), reps)
    print("EAR rowmin_4      %7.1f ms" % (t_rm4 * 1e3))
    if on_tpu:
        from microstructure_fingerprinting_tpu.ops import pallas_dfscan \
            as pdf
        _rows4, _ok4s, oh4 = f32scan._select_rows(lo4, up4, upf4, R)
        A1s4 = f32scan._gather_cols(A1, oh4)
        t_df4, _ = timed(
            lambda: pdf.row_scan_df4(A1s4, A2, csf_blk, ear_blk, y), reps)
        print("EAR df4 re-scan   %7.1f ms" % (t_df4 * 1e3))
    t_tp4, (c4, _v4, _q4, ok4) = timed(
        lambda: f32scan.df4_twopass(A1, A2, csf_blk, ear_blk, y,
                                    M=1, R=R), reps)
    n_bad4 = int(np.sum(~np.asarray(ok4)))
    print("EAR twopass total %7.1f ms   overflow %d/%d -> %7.0f vox/s"
          % (t_tp4 * 1e3, n_bad4, chunk, chunk / t_tp4))


if __name__ == "__main__":
    import sys
    kw = {}
    if len(sys.argv) > 1:
        kw["num_atom"] = int(sys.argv[1])
    main(**kw)
