"""Exact coordinate polish of scan candidates (device, direct residuals).

The f32 algebraic candidate scan (ops/pallas_nnls row scans) ranks the
10^6-point grid with ~1e-7 * ||y||^2 residual noise (the float32 Gram is the
hard floor), so on nearly-noiseless voxels the true optimum can lose its
per-row argmin to noise and never reach the top-M pool. Rather than paying
emulated float64 for the whole grid, this module polishes a handful of pool
candidates by block coordinate descent over the atom axes:

    for each start candidate: repeat `iters` times:
        i1 <- argmin over ALL i1 of the direct residual (i2, i3, i4 fixed)
        i2 <- argmin over ALL i2 of the direct residual (others fixed)
        (i4 <- same over the EAR block, when present)

Each axis sweep solves the closed-form small NNLS per candidate from
directly-computed Gram entries and evaluates r = y - sum_i w_i a_i
explicitly. At a least-squares optimum the residual is second-order
insensitive to weight error, so the sweep resolves residual gaps down to
~1e-11 * ||y||^2 on float32 hardware — deep below the scan's noise floor.
A polished point is a coordinate-wise minimum of the exact objective;
multi-starting from the top `starts` pool candidates makes reaching the
global optimum overwhelmingly likely in practice (asserted by the exact-
recovery tests on the real UKBB dictionary).

This is the float32-hardware answer to the reference's float64 Numba scan
(mf_utils.py:284-392): same selections, at TPU speed, without x64.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax

from . import nnls as mfn

_HP = dict(preferred_element_type=jnp.float32,
           precision=lax.Precision.HIGHEST)


def _solve_small(y_sq, G, Y):
    """Closed-form exact NNLS for 1-4 blocks from Gram scalars.

    G: nested list (C, C) of broadcastable arrays, Y: list length C.
    Returns list of C weight arrays.
    """
    C = len(Y)
    if C == 1:
        w, _ = mfn.lsqnonneg_1var(y_sq, G[0][0], Y[0])
        return [w]
    if C == 2:
        w1, w2, _ = mfn.lsqnonneg_2var(y_sq, G[0][0], G[0][1], G[1][1],
                                       Y[0], Y[1])
        return [w1, w2]
    if C == 3:
        w1, w2, w3, _ = mfn.lsqnonneg_3var(
            y_sq, G[0][0], G[1][1], G[2][2], G[0][1], G[0][2], G[1][2],
            Y[0], Y[1], Y[2])
        return [w1, w2, w3]
    w1, w2, w3, w4, _ = mfn.lsqnonneg_4var(
        y_sq, tuple(tuple(G[i][j] for j in range(4)) for i in range(4)),
        tuple(Y))
    return [w1, w2, w3, w4]


def _nnls_direct(cols, y, G=None, Y=None):
    """Exact small NNLS per candidate with directly-evaluated residual.

    cols: list of C (B, S, P) column stacks (one column set per candidate).
    The closed-form solve from f32 Gram entries carries an O(kappa * eps)
    weight error; the residual is evaluated directly (r = y - sum w_i c_i,
    second-order insensitive) and then improved with ONE step of iterative
    refinement on the active support — delta = G^-1 (A^T r) with the
    accurately-computed direct residual on the right-hand side — which
    collapses the ill-conditioned inflation ||A delta_w||^2 to negligible.
    The computed residual can only OVERestimate the true one (it evaluates
    the objective at a feasible point), never underestimate it.
    Returns (w list of (B, P), res (B, P)).
    """
    C = len(cols)
    y_sq = jnp.einsum("bs,bs->b", y, y, **_HP)[:, None]
    if G is None:
        G = [[jnp.einsum("bsp,bsp->bp", cols[i], cols[j], **_HP)
              if j >= i else None for j in range(C)] for i in range(C)]
        for i in range(C):
            for j in range(i):
                G[i][j] = G[j][i]
    if Y is None:
        Y = [jnp.einsum("bs,bsp->bp", y, cols[i], **_HP) for i in range(C)]
    w = _solve_small(y_sq, G, Y)

    def residual(wl):
        r = y[:, :, None] - sum(wi[:, None, :] * ci
                                for wi, ci in zip(wl, cols))
        return r, jnp.einsum("bsp,bsp->bp", r, r, **_HP)

    r, res0 = residual(w)
    # one iterative-refinement step on the active support
    t = [jnp.einsum("bsp,bsp->bp", cols[i], r, **_HP) for i in range(C)]
    act = [wi > 0 for wi in w]
    Gm = tuple(tuple(jnp.where(act[i] & act[j], G[i][j],
                               jnp.float32(1.0 if i == j else 0.0))
                     for j in range(C)) for i in range(C))
    tm = tuple(jnp.where(act[i], t[i], 0.0) for i in range(C))
    delta, _det = mfn._solve_posdef_cramer(Gm, tm)
    w1 = [jnp.maximum(wi + jnp.where(jnp.isfinite(d), d, 0.0), 0.0)
          for wi, d in zip(w, delta)]
    _r1, res1 = residual(w1)
    use1 = res1 < res0
    res = jnp.where(use1, res1, res0)
    w = [jnp.where(use1, a, b) for a, b in zip(w1, w)]
    return w, jnp.where(jnp.isnan(res), jnp.inf, res)


def _axis_sweep(block, fixed_cols, y, pos):
    """Exact sweep of one block axis with the other columns fixed.

    block: (B, S, N) all candidate columns of the swept sub-dictionary;
    fixed_cols: list of (B, S) selected columns of the other blocks, in
    block order with the swept block removed; pos: index of the swept block
    in the full block order. Returns (best_idx (B,), best_res (B,)) by
    refined direct residual, first minimum on ties.
    """
    B, S, N = block.shape
    C = len(fixed_cols) + 1

    g_bb = jnp.einsum("bsn,bsn->bn", block, block, **_HP)    # (B, N)
    g_bf = [jnp.einsum("bsn,bs->bn", block, f, **_HP) for f in fixed_cols]
    g_ff = [[jnp.einsum("bs,bs->b", fi, fj, **_HP)[:, None]
             for fj in fixed_cols] for fi in fixed_cols]
    Y_b = jnp.einsum("bsn,bs->bn", block, y, **_HP)
    Y_f = [jnp.einsum("bs,bs->b", f, y, **_HP)[:, None] for f in fixed_cols]

    # assemble the (C, C) Gram in full block order: index `pos` is the
    # swept block, the rest are the fixed columns in order
    fixed_of = [i for i in range(C) if i != pos]
    G = [[None] * C for _ in range(C)]
    Y = [None] * C
    G[pos][pos] = g_bb
    Y[pos] = Y_b
    for a, i in enumerate(fixed_of):
        G[pos][i] = G[i][pos] = g_bf[a]
        Y[i] = Y_f[a]
        for b_, j in enumerate(fixed_of):
            G[i][j] = g_ff[a][b_]

    cols = [None] * C
    cols[pos] = block
    for a, i in enumerate(fixed_of):
        cols[i] = jnp.broadcast_to(fixed_cols[a][:, :, None],
                                   block.shape)
    _w, res = _nnls_direct(cols, y, G=G, Y=Y)                # (B, N)
    idx = jnp.argmin(res, axis=1).astype(jnp.int32)          # first minimum
    return idx, jnp.take_along_axis(res, idx[:, None], axis=1)[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("csf_on", "ear_on", "starts", "iters"))
def exact_polish(D, sig_csf, sig_ear, y, cand, res, csf_on, ear_on,
                 starts=4, iters=2):
    """Block-coordinate-descent polish of the top pool candidates.

    Args:
      D (B, 2, S, N): rotated fascicle blocks; sig_csf (S,), sig_ear (S, E);
      y (B, S); cand (B, M, C) pool, res (B, M) its direct residuals (both
      from ops/pallas_nnls.rescore_direct; C = 2 + csf_on + ear_on, EAR
      candidates carry [i1, i2, i3, i4]).
    Returns (cand, res) with the polished fixed points of the first
    `starts` entries merged in, re-ranked by (direct residual, reference
    product rank).
    """
    B, M, C = cand.shape
    S = y.shape[1]
    N = D.shape[3]
    E = sig_ear.shape[1] if ear_on else 0
    csf_col = (jnp.broadcast_to(sig_csf[None, :], (B, S)) if csf_on
               else None)
    ear_block = (jnp.broadcast_to(sig_ear[None], (B, S, E)) if ear_on
                 else None)

    def gather(Dk, idx):
        return jnp.take_along_axis(Dk, idx[:, None, None], axis=2)[:, :, 0]

    pol_idx = []
    pol_res = []
    for s in range(starts):
        i1 = cand[:, s, 0]
        i2 = cand[:, s, 1]
        i4 = cand[:, s, C - 1] if ear_on else None
        res_s = None
        for _ in range(iters):
            fixed = [gather(D[:, 1], i2)]
            if csf_on:
                fixed.append(csf_col)
            if ear_on:
                fixed.append(gather(ear_block, i4))
            i1, res_s = _axis_sweep(D[:, 0], fixed, y, 0)

            fixed = [gather(D[:, 0], i1)]
            if csf_on:
                fixed.append(csf_col)
            if ear_on:
                fixed.append(gather(ear_block, i4))
            i2, res_s = _axis_sweep(D[:, 1], fixed, y, 0)

            if ear_on:
                fixed = [gather(D[:, 0], i1), gather(D[:, 1], i2)]
                if csf_on:
                    fixed.append(csf_col)
                i4, res_s = _axis_sweep(ear_block, fixed, y, 0)
        # match the incoming candidate layout: [i1, i2] for the 2/3-block
        # pools (the CSF index column is appended downstream), [i1, i2, i3,
        # i4] for the 4-block pool
        ids = [i1, i2]
        if C == 4:
            ids.extend([jnp.zeros_like(i1), i4])
        pol_idx.append(jnp.stack(ids, axis=1))
        pol_res.append(res_s)

    pol_cand = jnp.stack(pol_idx, axis=1).astype(jnp.int32)  # (B, st, C)
    pol_res = jnp.stack(pol_res, axis=1)                     # (B, st)

    all_cand = jnp.concatenate([pol_cand, cand], axis=1)
    all_res = jnp.concatenate([pol_res, res], axis=1)
    # product rank (int32-safe: N^2 * E < 2^31 for real dictionaries) for
    # deterministic reference-order tie-breaking
    rank = all_cand[:, :, 0] * N + all_cand[:, :, 1]
    if ear_on:
        rank = rank * E + all_cand[:, :, C - 1]
    order = jnp.lexsort((rank, all_res), axis=-1)[:, :M]
    return (jnp.take_along_axis(all_cand, order[:, :, None], axis=1),
            jnp.take_along_axis(all_res, order, axis=1))
