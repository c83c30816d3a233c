"""Synthetic workload generators (benchmarks, graft entry, smoke tests).

Self-contained: no test fixtures required. Generates an HCP-like dense
multi-shell PGSE scheme and a smooth single-fascicle fingerprint dictionary
(zeppelin-like signals with per-atom diffusivities), matching the shapes of
the real workloads (552 sequences, ~800 atoms; see SURVEY.md section 6).
"""

import numpy as np

from .utils.scheme import b_values
from .ops import interp as mfi


def fibonacci_sphere(n):
    """n roughly-uniform unit directions (golden-angle spiral)."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack([np.sin(phi) * np.cos(theta),
                     np.sin(phi) * np.sin(theta),
                     np.cos(phi)], axis=1)


def make_dense_scheme(n_shells=8, dirs_per_shell=64, n_b0=40,
                      G_max=0.28, Delta=0.0431, delta=0.0106, TE=0.057):
    """Dense multi-HARDI scheme: n_shells G-shells + b0 block (7 cols, SI)."""
    rows = [np.zeros((n_b0, 7))]
    rows[0][:, 4:7] = [Delta, delta, TE]
    for s in range(n_shells):
        G = G_max * (s + 1) / n_shells
        sh = np.zeros((dirs_per_shell, 7))
        sh[:, :3] = fibonacci_sphere(dirs_per_shell)
        sh[:, 3] = G
        sh[:, 4:7] = [Delta, delta, TE]
        rows.append(sh)
    return np.concatenate(rows, axis=0)


def make_dictionary(sch_mat, num_atom=782, seed=0):
    """Smooth synthetic fingerprint dictionary along e_z.

    Atoms are zeppelins S = exp(-b (d_par - d_perp) (g.n)^2 - b d_perp) with
    per-atom (d_par, d_perp) grids — highly correlated columns, like real
    Monte-Carlo dictionaries.
    """
    rng = np.random.RandomState(seed)
    b = b_values(sch_mat)
    gnorm = np.sqrt(np.sum(sch_mat[:, :3] ** 2, axis=1))
    gnorm[gnorm == 0] = np.inf
    dotz = np.abs(sch_mat[:, 2] / gnorm)
    d_par = np.linspace(1.0e-9, 2.4e-9, int(np.ceil(np.sqrt(num_atom))))
    d_perp = np.linspace(0.05e-9, 0.9e-9, int(np.ceil(np.sqrt(num_atom))))
    dp, dq = np.meshgrid(d_par, d_perp, indexing="ij")
    dp, dq = dp.ravel()[:num_atom], dq.ravel()[:num_atom]
    sig = np.exp(-b[:, None] * (dq[None, :]
                                + (dp - dq)[None, :] * dotz[:, None] ** 2))
    return sig, dp, dq


def make_fit_workload(num_atom=782, n_vox=64, seed=0,
                      n_shells=8, dirs_per_shell=64, n_b0=40):
    """Full fused-fit-step workload: tables, plan, peaks, signals.

    Returns a dict with device-ready numpy arrays for the 2-fascicle + CSF
    configuration (the reference's flagship workload: dicsizes
    [num_atom, num_atom, 1] on a 552-sequence protocol; mf_utils.py:462-465).
    """
    rng = np.random.RandomState(seed)
    sch = make_dense_scheme(n_shells, dirs_per_shell, n_b0)
    sig, dp, dq = make_dictionary(sch, num_atom, seed)
    ordir = np.array([0.0, 0.0, 1.0])
    ms = mfi.init_PGSE_multishell_interp(sig, sch, ordir)
    plan = mfi.plan_target_scheme(ms, sch)

    peaks = rng.randn(n_vox, 2, 3)
    peaks /= np.linalg.norm(peaks, axis=2, keepdims=True)
    TE = sch[:, 6]
    b = b_values(sch)
    sig_csf = np.exp(-TE / 2.0) * np.exp(-b * 3.0e-9)

    # noiseless ground-truth mixtures through the same interpolator,
    # synthesized in one batched device call
    import jax.numpy as jnp
    gt_ids = rng.randint(0, num_atom, size=(n_vox, 2))
    gt_nu = rng.rand(n_vox, 3) + 0.25
    gt_nu /= gt_nu.sum(axis=1, keepdims=True)
    xs, ys_t, cnt = ms.device_tables()
    dt = xs.dtype
    gdir_d = jnp.asarray(plan.gdir, dtype=dt)
    lo_d = jnp.asarray(plan.shell_lo)
    hi_d = jnp.asarray(plan.shell_hi)
    wG_d = jnp.asarray(plan.wG, dtype=dt)
    # chunked synthesis: the rotated dictionary for the whole set would not
    # fit HBM; gather the ground-truth atom columns on device per chunk
    cols = np.zeros((n_vox, 2, sch.shape[0]))
    chunk = 128
    for st in range(0, n_vox, chunk):
        en = min(st + chunk, n_vox)
        D = mfi.eval_rotation_batch(xs, ys_t, cnt, gdir_d, lo_d, hi_d, wG_d,
                                    jnp.asarray(peaks[st:en], dtype=dt))
        cols[st:en] = np.asarray(jnp.take_along_axis(
            D, jnp.asarray(gt_ids[st:en])[:, :, None, None],
            axis=3)[:, :, :, 0])
    y = 400 * (gt_nu[:, 0, None] * cols[:, 0]
               + gt_nu[:, 1, None] * cols[:, 1]
               + gt_nu[:, 2, None] * sig_csf[None, :])
    return {"sch_mat": sch, "msinterp": ms, "plan": plan, "peaks": peaks,
            "y": y, "sig_csf": sig_csf, "gt_ids": gt_ids, "gt_nu": gt_nu,
            "dictionary": sig}
