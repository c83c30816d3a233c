"""Fused Pallas TPU kernel for the double-float candidate scan (K=3).

The XLA implementation (ops/dfscan.df3_candidates) materializes the
double-float Gram tiles and every compensated-chain intermediate in HBM
between fused regions, and its batched int8 einsums schedule poorly on the
MXU. This kernel performs the whole per-tile pipeline in VMEM:

    grid (voxel, atom-tile):
        P       = [Q1a|Q2a]^T [Q1b|Q2b]     (ONE int8 MXU dot, exact int32)
        c1, c2  = A1h^T Rb, Ra^T ab         (f32 HIGHEST cross matmuls)
        (hi,lo) = exact-sum combine         (double-float Gram g12)
        res     = compensated bordered determinants + reference case logic
        out     = per-(row, segment) minimum residual + arg-i2

All per-row (i1) / per-column (i2) double-float factors arrive PRE-SPLIT
(df32.presplit) from the XLA prep, so each per-point product costs ~12
flops (df32.mul_ps). Residual semantics are identical to
dfscan.df3_candidates: support selection booleans in plain f32, values from
compensated determinants, ~1e-10 * ||y||^2 resolution.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df32
from . import dfscan
from . import nnls as mfn

_LANE = 128
_SEGMENTS = 8
_TOL = float(100 * 1.1920929e-07)  # python float: jnp constants can't be captured by pallas kernels


def _round_up(x, m):
    return int(math.ceil(x / m) * m)


def n_segments(N2, segments=_SEGMENTS):
    """Total per-row segment count of row_scan_df3's output for a given
    second-sub-dictionary size (static shape math; pass to
    ops/pallas_nnls.candidates_from_rows). ``segments`` must match the
    value given to row_scan_df3 (1 suffices for top-1 consumers like the
    device finalize; more segments diversify a top-M pool)."""
    N2p = _round_up(N2, _LANE)
    NB = 1
    while N2p // NB > 512 and NB < _SEGMENTS:
        NB *= 2
    return NB * segments


def candidates_from_rows(row_res, row_i2, M, segments=_SEGMENTS):
    """Top-M (row, segment) minima -> ((B, M, 2) [i1, i2] candidates,
    (B, M) residual values) (XLA, cheap). Input is the flattened
    (B, Q*N1p) per-row-per-segment minima from row_scan_df3 (``segments``
    must match the kernel's total segment count, n_segments)."""
    n1p = row_res.shape[1] // segments
    negv, flat = lax.top_k(-row_res, M)
    i1 = flat % n1p
    i2 = jnp.take_along_axis(row_i2, flat, axis=1)
    return jnp.stack([i1, i2], axis=2).astype(jnp.int32), -negv


def _ps_rows(ref, i):
    """Four presplit components from a packed (1, R, T) ref at row i,
    shaped (T, 1) for row-factor broadcasting."""
    return tuple(ref[0, i + k][:, None] for k in range(4))


def _ps_cols(ref, i):
    return tuple(ref[0, i + k][None, :] for k in range(4))


def _acc(parts):
    """Compensated sum of (main, err) partials -> f32 value."""
    hi, lo = parts[0]
    for p, e in parts[1:]:
        hi, s = df32.two_sum(hi, p)
        lo = lo + (s + e)
    return hi + lo


def _kernel(q1ab_ref, a1h_ref, ra_ref, qb_ref, rb_ref, ab_ref,
            row_ref, col_ref, vox_ref, res_ref, idx_ref,
            *, n2, n2b, tile, segs):
    # ---- double-float Gram tile (one column block of the grid) ----
    Qa = q1ab_ref[0]                                   # (S, 2T) int8
    Qb = qb_ref[0]                                     # (S, 2N2B) int8
    P = lax.dot_general(Qa, Qb, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    t11 = P[:tile, :n2b]
    t12 = P[:tile, n2b:] + P[tile:, :n2b]
    t22 = P[tile:, n2b:]
    v_a = t11.astype(jnp.float32) * jnp.float32(2.0 ** -14)
    v_b = t12.astype(jnp.float32) * jnp.float32(2.0 ** -22)
    v_c = t22.astype(jnp.float32) * jnp.float32(2.0 ** -30)
    # cross terms carry O(2^-15)-magnitude corrections; Mosaic supports
    # only DEFAULT (single-pass bf16, too coarse for the ~1e-9 target) and
    # HIGHEST for f32 dots, so HIGHEST it is
    hp = dict(preferred_element_type=jnp.float32,
              precision=lax.Precision.HIGHEST)
    c1 = lax.dot_general(a1h_ref[0], rb_ref[0], (((0,), (0,)), ((), ())),
                         **hp)
    c2 = lax.dot_general(ra_ref[0], ab_ref[0], (((0,), (0,)), ((), ())),
                         **hp)
    g_hi, g_lo = df32.df_from_sum(v_a, v_b, v_c, c1, c2)   # (T, N2p)
    gh, gl = df32.split(g_hi)
    a_ps = (g_hi, g_lo, gh, gl)

    # ---- unpack hoisted factors ----
    (Rb2, Rbp, d1p, Rp2, b_p, p_p) = (
        _ps_rows(row_ref, 4 * k) for k in range(6))
    res1_row = row_ref[0, 24][:, None]
    res13_row = row_ref[0, 25][:, None]
    rowD2a = row_ref[0, 26][:, None]
    rowEG = row_ref[0, 27][:, None]                    # pf*bf - d1f*rf
    rowF = row_ref[0, 28][:, None]                     # d1f*d3f - bf^2

    (U1, U2, U3, U4, V1, V2, X1c, d2p, q_p, c_p) = (
        _ps_cols(col_ref, 4 * k) for k in range(10))
    res2_col = col_ref[0, 40][None, :]
    res23_col = col_ref[0, 41][None, :]
    colA = col_ref[0, 42][None, :]                     # d2f*d3f - cf^2
    colB = col_ref[0, 43][None, :]                     # cf*rf - qf*d3f
    colC = col_ref[0, 44][None, :]                     # qf*cf - rf*d2f
    colH = col_ref[0, 45][None, :]                     # qf*cf

    C2v = tuple(vox_ref[0, 0, k] for k in range(4))
    wv = tuple(vox_ref[0, 0, 4 + k] for k in range(4))
    d3f = vox_ref[0, 0, 8]
    rf = vox_ref[0, 0, 9]
    wf = vox_ref[0, 0, 10]

    d1f, bf, pf = d1p[0], b_p[0], p_p[0]
    d2f, qf, cf = d2p[0], q_p[0], c_p[0]
    af = a_ps[0]

    # ---- support {1,2,3}: compensated bordered 4x4 ----
    m1 = df32.mul_ps(b_p, V1)
    m2 = df32.mul_ps(p_p, V2)
    s_hi, s_e = df32.two_sum(m1[0], m2[0])
    s_df = df32.fast_two_sum(s_hi, s_e + m1[1] + m2[1])
    s_ps = df32.presplit(s_df)
    a2 = df32.mul_ps(a_ps, a_ps)
    a2_df = df32.fast_two_sum(a2[0], a2[1])
    a2_ps = df32.presplit(a2_df)
    det4 = _acc([
        df32.mul_ps(Rb2, U1), df32.mul_ps(Rbp, U2),
        df32.mul_ps(d1p, U3), df32.mul_ps(Rp2, U4),
        df32.mul_ps(a_ps, s_ps), df32.mul_ps(a2_ps, C2v)])

    detG3 = (d1f * colA - (bf * bf) * d2f + af * (2.0 * bf * cf)
             - (af * af) * d3f)
    ok3 = detG3 > _TOL * d1f * d2f * d3f
    res123 = jnp.where(ok3, det4 / jnp.where(ok3, detG3, 1.0), jnp.inf)
    res123 = jnp.where(jnp.isnan(res123), jnp.inf, res123)

    # full-support feasibility (Cramer numerator signs, f32)
    D1 = pf * colA + af * colB + bf * colC
    D2 = af * rowD2a + rowEG * cf + rowF * qf
    D3 = (af * (pf * cf + bf * qf) - rowEG * d2f - d1f * colH
          - (af * af) * rf)
    full = (D1 >= -_TOL) & (D2 >= -_TOL) & (D3 >= -_TOL)

    # ---- support {1,2}: compensated bordered 3x3 ----
    m3 = df32.mul_ps(p_p, q_p)
    pq_df = df32.fast_two_sum(m3[0], m3[1])
    pq_ps = df32.presplit(pq_df)
    ap_q = df32.mul_ps(a_ps, pq_ps)
    num12 = _acc([
        df32.mul_ps(d1p, X1c),
        (-df32.mul_ps(Rp2, d2p)[0], -df32.mul_ps(Rp2, d2p)[1]),
        (2.0 * ap_q[0], 2.0 * ap_q[1]),
        (-df32.mul_ps(a2_ps, wv)[0], -df32.mul_ps(a2_ps, wv)[1])])
    det12 = d1f * d2f - af * af
    ok12 = det12 > _TOL * d1f * d2f
    res12full = jnp.where(ok12, num12 / jnp.where(ok12, det12, 1.0),
                          jnp.inf)
    res12full = jnp.where(jnp.isnan(res12full), jnp.inf, res12full)
    w1D = d2f * pf - af * qf
    w2D = d1f * qf - af * pf
    res12 = dfscan._two_var_cases(res12full, w1D, w2D, pf, qf,
                                  res1_row, res2_col, wf)[0]

    # fallback chain (reference priority: 12, then 13, then 23)
    fb = res12
    r13 = jnp.broadcast_to(res13_row, fb.shape)
    fb = jnp.where(r13 < fb, r13, fb)
    r23 = jnp.broadcast_to(res23_col, fb.shape)
    fb = jnp.where(r23 < fb, r23, fb)
    res = jnp.where(full, res123, fb)

    # ---- per-(row, segment) minima over this column block ----
    # (masked full-width passes: Mosaic rejects sub-width lane slices of
    # the residual tile — a 64-lane static slice crashes its layout pass)
    cb = pl.program_id(1)
    col = (cb * n2b
           + lax.broadcasted_iota(jnp.int32, res.shape, 1))  # global i2
    res = jnp.where(col < n2, res, jnp.inf)
    seg = n2b // segs
    big = jnp.int32(2 ** 30)
    for q in range(segs):
        lo = q * seg
        r_q = jnp.where(
            (col >= cb * n2b + lo) & (col < cb * n2b + lo + seg),
            res, jnp.inf)
        rmin = jnp.min(r_q, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(r_q == rmin, col, big), axis=1)
        idx = jnp.where(jnp.isfinite(rmin[:, 0]), idx, 0)
        res_ref[0, q] = rmin[:, 0]
        idx_ref[0, q] = idx.astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "segments"))
def row_scan_df3(A1, A2, a3, y, interpret=False, tile=_LANE,
                 segments=_SEGMENTS):
    """Per-(row, segment) best candidate for [N1, N2, 1] with double-float
    selection, via the fused kernel. Returns (row_res (B, Q*N1p),
    row_i2 (B, Q*N1p), y_sq (B,)); consume with
    ops/pallas_nnls.candidates_from_rows (``segments`` here and in
    n_segments must match; 1 is enough for top-1 consumers and skips
    most of the in-kernel reduction passes).
    """
    B, S, N1 = A1.shape
    N2 = A2.shape[2]
    N1p = _round_up(N1, tile)
    N2p = _round_up(N2, _LANE)
    A1p, _ = mfn._pad_cols(A1, tile)
    A1h, _an1 = mfn._normalize_block(A1p)
    A2h, _an2 = mfn._normalize_block(A2)
    A3h, _an3 = mfn._normalize_block(a3)
    yh, yn, _ys = mfn._normalize_y(y)

    qA1 = dfscan.quantize2(A1h)
    qA2 = dfscan.quantize2(A2h)
    qA3 = dfscan.quantize2(A3h)
    qy = dfscan.quantize2(yh)

    vec = "bsn,bs->bn"
    diag = "bsn,bsn->bn"
    d1 = dfscan.df_gram(qA1, qA1, diag)
    d2 = dfscan.df_gram(qA2, qA2, diag)
    d3 = dfscan.df_gram(qA3, qA3, diag)
    p_ = dfscan.df_gram(qA1, qy, vec)
    q_ = dfscan.df_gram(qA2, qy, vec)
    r3 = dfscan.df_gram(qA3, qy, vec)
    b_ = dfscan.df_gram(qA1, qA3, "bsn,bsm->bn")
    c_ = dfscan.df_gram(qA2, qA3, "bsn,bsm->bn")
    w_ = dfscan.df_gram(qy, qy, "bs,bs->b")
    w_ = (w_[0][:, None], w_[1][:, None])

    mul, add, neg, sc = (dfscan._mul, dfscan._add, dfscan._neg,
                         dfscan._scale)
    val = dfscan._val

    C2v = add(mul(r3, r3), neg(mul(d3, w_)))
    d3w_r2 = neg(C2v)

    Rb2 = mul(b_, b_)
    Rbp = mul(b_, p_)
    Rp2 = mul(p_, p_)
    res1_row = val(add(mul(d1, w_), neg(Rp2))) / val(d1)
    det13 = add(mul(d1, d3), neg(Rb2))
    num13 = dfscan._accumulate([
        mul(mul(d1, d3), w_), neg(mul(mul(d1, r3), r3)),
        neg(mul(Rb2, w_)), sc(mul(mul(b_, p_), r3), 2.0),
        neg(mul(d3, Rp2))])
    res13_row = num13 / val(det13)
    w1D_13 = val(d3) * val(p_) - val(b_) * val(r3)
    w2D_13 = val(d1) * val(r3) - val(b_) * val(p_)
    res3_only = val(w_) - val(r3) ** 2 / val(d3)
    res13_row, _ = dfscan._two_var_cases(
        res13_row, w1D_13, w2D_13, val(p_), val(r3),
        res1_row, res3_only, val(w_))

    Cq2 = mul(q_, q_)
    Cc2 = mul(c_, c_)
    Ccq = mul(c_, q_)
    U1 = add(Cq2, neg(mul(d2, w_)))
    U2 = sc(add(mul(d2, r3), neg(Ccq)), 2.0)
    U3 = add(mul(d2, d3w_r2), neg(mul(d3, Cq2)),
             sc(mul(Ccq, r3), 2.0), neg(mul(Cc2, w_)))
    U4 = add(Cc2, neg(mul(d2, d3)))
    V1 = sc(add(mul(c_, w_), neg(mul(q_, r3))), 2.0)
    V2 = sc(add(mul(d3, q_), neg(mul(c_, r3))), 2.0)
    X1c = add(mul(d2, w_), neg(Cq2))
    res2_col = val(X1c) / val(d2)
    det23 = add(mul(d2, d3), neg(Cc2))
    num23 = dfscan._accumulate([
        mul(mul(d2, d3), w_), neg(mul(mul(d2, r3), r3)),
        neg(mul(Cc2, w_)), sc(mul(Ccq, r3), 2.0), neg(mul(d3, Cq2))])
    res23_col = num23 / val(det23)
    w1D_23 = val(d3) * val(q_) - val(c_) * val(r3)
    w2D_23 = val(d2) * val(r3) - val(c_) * val(q_)
    res23_col, _ = dfscan._two_var_cases(
        res23_col, w1D_23, w2D_23, val(q_), val(r3),
        res2_col, res3_only, val(w_))

    # f32 hoists for the in-kernel decision booleans
    d1f, bf, pf = val(d1), val(b_), val(p_)
    d2f, qf, cf = val(d2), val(q_), val(c_)
    d3f, rf, wf = val(d3), val(r3), val(w_)
    rowD2a = rf * bf - d3f * pf
    rowEG = pf * bf - d1f * rf
    rowF = d1f * d3f - bf * bf
    colA = d2f * d3f - cf * cf
    colB = cf * rf - qf * d3f
    colC = qf * cf - rf * d2f
    colH = qf * cf

    def ps_stack(dfs):
        comps = []
        for x in dfs:
            comps.extend(df32.presplit(x))
        return jnp.stack(comps, axis=1)                # (B, 4*len, N)

    row_pack = jnp.concatenate([
        ps_stack([Rb2, Rbp, d1, Rp2, b_, p_]),
        jnp.stack([res1_row, res13_row, rowD2a, rowEG, rowF], axis=1),
    ], axis=1).astype(jnp.float32)                     # (B, 29, N1p)
    col_pack = jnp.concatenate([
        ps_stack([U1, U2, U3, U4, V1, V2, X1c, d2, q_, c_]),
        jnp.stack([res2_col, res23_col, colA, colB, colC, colH], axis=1),
    ], axis=1).astype(jnp.float32)                     # (B, 46, N2)
    col_pack = jnp.pad(col_pack, ((0, 0), (0, 0), (0, N2p - N2)))

    vox = []
    for x in (C2v, w_):
        vox.extend(df32.presplit(x))
    vox = jnp.stack([v[:, 0] for v in vox]
                    + [d3f[:, 0], rf[:, 0], wf[:, 0],
                       jnp.zeros_like(d3f[:, 0])], axis=1)
    vox = vox[:, None, :].astype(jnp.float32)          # (B, 1, 12) -> pad
    vox = jnp.pad(vox, ((0, 0), (0, 0), (0, 16 - vox.shape[2])))

    # column blocking: large second sub-dictionaries are processed in NB
    # lane blocks of N2B columns so the (S, N2B) f32 operands + the chain
    # temporaries stay inside the 16 MB VMEM budget. NB must divide the
    # global segment count (the Q output rows split across blocks).
    NB = 1
    while N2p // NB > 512 and NB < _SEGMENTS:
        NB *= 2
    N2B = _round_up(int(math.ceil(N2p / NB)), _LANE)
    N2pb = NB * N2B
    segs = segments  # per column block -> NB * segments total

    def padb(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, N2pb - x.shape[2])))

    # int8 levels packed [Q1 | Q2] per column block / per row tile so one
    # VMEM block carries both levels contiguously
    q1b_p = padb(jnp.pad(qA2[0], ((0, 0), (0, 0), (0, N2p - N2))))
    q2b_p = padb(jnp.pad(qA2[1], ((0, 0), (0, 0), (0, N2p - N2))))
    qb2 = jnp.concatenate([q1b_p.reshape(B, S, NB, N2B),
                           q2b_p.reshape(B, S, NB, N2B)],
                          axis=3).reshape(B, S, -1)    # (B, S, NB*2N2B)
    Rb = padb(jnp.pad(qA2[2], ((0, 0), (0, 0), (0, N2p - N2))))
    ab = padb(jnp.pad(qA2[3], ((0, 0), (0, 0), (0, N2p - N2))))
    col_pack = jnp.pad(col_pack, ((0, 0), (0, 0), (0, N2pb - N2p)))

    grid = (B, NB, N1p // tile)
    tiled2 = lambda: pl.BlockSpec(
        (1, S, 2 * tile), lambda b, c, t: (b, 0, t),
        memory_space=pltpu.VMEM)
    tiled = lambda: pl.BlockSpec((1, S, tile), lambda b, c, t: (b, 0, t),
                                 memory_space=pltpu.VMEM)
    colblk = lambda d1_: pl.BlockSpec(
        (1, S, d1_), lambda b, c, t: (b, 0, c), memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, n2=N2, n2b=N2B, tile=tile,
                               segs=segs)
    q1_t = qA1[0].reshape(B, S, N1p // tile, tile)
    q2_t = qA1[1].reshape(B, S, N1p // tile, tile)
    q1ab_t = jnp.concatenate([q1_t, q2_t], axis=3)     # (B, S, nt, 2T)
    q1ab_t = q1ab_t.reshape(B, S, -1)                  # (B, S, nt*2T)

    row_res, row_i2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tiled2(),                                  # int8 [Q1|Q2] tile
            tiled(),                                   # A1h tile (f32)
            tiled(),                                   # Ra tile (f32)
            colblk(2 * N2B),                           # int8 [Q1b|Q2b]
            colblk(N2B),                               # Rb
            colblk(N2B),                               # ab
            pl.BlockSpec((1, 29, tile), lambda b, c, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 46, N2B), lambda b, c, t: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 16), lambda b, c, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, segs, tile), lambda b, c, t: (b, c, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, segs, tile), lambda b, c, t: (b, c, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, NB * segs, N1p), jnp.float32),
            jax.ShapeDtypeStruct((B, NB * segs, N1p), jnp.int32),
        ],
        interpret=interpret,
    )(q1ab_t, A1h.astype(jnp.float32), qA1[2].astype(jnp.float32),
      qb2, Rb.astype(jnp.float32), ab.astype(jnp.float32),
      row_pack, col_pack, vox)
    row = lax.broadcasted_iota(jnp.int32, (B, 1, N1p), 2)
    row_res = jnp.where(row < N1, row_res, jnp.inf)
    n_seg = NB * segs
    return (row_res.reshape(B, n_seg * N1p),
            row_i2.reshape(B, n_seg * N1p), yn * yn)
