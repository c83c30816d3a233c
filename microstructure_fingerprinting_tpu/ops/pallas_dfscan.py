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
_TOL_DET = 1e-12  # df-determinant floor; MUST mirror dfscan._TOL_DET


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


def _df_gram_ps(Qa, Qb, a1h, ra, rb, ab, tile, n2b):
    """In-kernel double-float Gram tile, presplit: one int8 MXU dot on the
    packed [Q1|Q2] levels + two f32 HIGHEST cross matmuls on the
    quantization residuals, combined with an error-free two_sum cascade.
    (Mosaic supports only DEFAULT — single-pass bf16, too coarse for the
    ~1e-9 target — and HIGHEST for f32 dots, so HIGHEST it is.)"""
    P = lax.dot_general(Qa, Qb, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    t11 = P[:tile, :n2b]
    t12 = P[:tile, n2b:] + P[tile:, :n2b]
    t22 = P[tile:, n2b:]
    v_a = t11.astype(jnp.float32) * jnp.float32(2.0 ** -14)
    v_b = t12.astype(jnp.float32) * jnp.float32(2.0 ** -22)
    v_c = t22.astype(jnp.float32) * jnp.float32(2.0 ** -30)
    hp = dict(preferred_element_type=jnp.float32,
              precision=lax.Precision.HIGHEST)
    c1 = lax.dot_general(a1h, rb, (((0,), (0,)), ((), ())), **hp)
    c2 = lax.dot_general(ra, ab, (((0,), (0,)), ((), ())), **hp)
    g_hi, g_lo = df32.df_from_sum(v_a, v_b, v_c, c1, c2)   # (T, N2B)
    gh, gl = df32.split(g_hi)
    return (g_hi, g_lo, gh, gl)


def _kernel(q1ab_ref, a1h_ref, ra_ref, qb_ref, rb_ref, ab_ref,
            row_ref, col_ref, vox_ref, res_ref, idx_ref,
            *, n2, n2b, tile, segs):
    # ---- double-float Gram tile (one column block of the grid) ----
    a_ps = _df_gram_ps(q1ab_ref[0], qb_ref[0], a1h_ref[0], ra_ref[0],
                       rb_ref[0], ab_ref[0], tile, n2b)

    # ---- unpack hoisted factors ----
    (Rb2, Rbp, d1p, Rp2, b_p, p_p, rowD2a, rowEG, rowF) = (
        _ps_rows(row_ref, 4 * k) for k in range(9))
    res1_row = row_ref[0, 36][:, None]
    res13_row = row_ref[0, 37][:, None]

    (U1, U2, U3, U4, V1, V2, X1c, d2p, q_p, c_p,
     colA, colB, colC, colH) = (
        _ps_cols(col_ref, 4 * k) for k in range(14))
    res2_col = col_ref[0, 56][None, :]
    res23_col = col_ref[0, 57][None, :]

    C2v = tuple(vox_ref[0, 0, k] for k in range(4))
    wv = tuple(vox_ref[0, 0, 4 + k] for k in range(4))
    d3v = tuple(vox_ref[0, 0, 8 + k] for k in range(4))
    r3v = tuple(vox_ref[0, 0, 12 + k] for k in range(4))
    wf = vox_ref[0, 0, 16]

    pf, qf = p_p[0], q_p[0]

    def nps(t):
        return (-t[0], -t[1])

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

    # detG3 = d1 colA - b^2 d2 + 2 a b c - a^2 d3, DOUBLE-FLOAT: for
    # highly correlated atoms the O(1) terms cancel to ~1e-6, pure noise
    # in plain f32 — the old f32 guard rejected genuinely optimal
    # supports the reference resolves in float64 (see dfscan._TOL_DET,
    # mirrored semantics)
    bc = df32.mul_ps(b_p, c_p)
    bc_ps = df32.presplit(df32.fast_two_sum(bc[0], bc[1]))
    m_abc = df32.mul_ps(a_ps, bc_ps)
    detG3 = _acc([
        df32.mul_ps(d1p, colA), nps(df32.mul_ps(Rb2, d2p)),
        (2.0 * m_abc[0], 2.0 * m_abc[1]),
        nps(df32.mul_ps(a2_ps, d3v))])
    ok3 = detG3 > _TOL_DET
    res123 = jnp.where(ok3, det4 / jnp.where(ok3, detG3, 1.0), jnp.inf)
    res123 = jnp.where(jnp.isnan(res123), jnp.inf, res123)

    # full-support feasibility (Cramer numerator signs, double-float)
    D1 = _acc([df32.mul_ps(p_p, colA), df32.mul_ps(a_ps, colB),
               df32.mul_ps(b_p, colC)])
    D2 = _acc([df32.mul_ps(a_ps, rowD2a), df32.mul_ps(rowEG, c_p),
               df32.mul_ps(rowF, q_p)])
    pc = df32.mul_ps(p_p, c_p)
    bq = df32.mul_ps(b_p, q_p)
    s3_hi, s3_e = df32.two_sum(pc[0], bq[0])
    pcbq_ps = df32.presplit(
        df32.fast_two_sum(s3_hi, s3_e + pc[1] + bq[1]))
    D3 = _acc([df32.mul_ps(a_ps, pcbq_ps),
               nps(df32.mul_ps(rowEG, d2p)),
               nps(df32.mul_ps(d1p, colH)),
               nps(df32.mul_ps(a2_ps, r3v))])
    full = (D1 >= -_TOL_DET) & (D2 >= -_TOL_DET) & (D3 >= -_TOL_DET)

    # ---- support {1,2}: compensated bordered 3x3 ----
    m3 = df32.mul_ps(p_p, q_p)
    pq_df = df32.fast_two_sum(m3[0], m3[1])
    pq_ps = df32.presplit(pq_df)
    ap_q = df32.mul_ps(a_ps, pq_ps)
    num12 = _acc([
        df32.mul_ps(d1p, X1c),
        nps(df32.mul_ps(Rp2, d2p)),
        (2.0 * ap_q[0], 2.0 * ap_q[1]),
        nps(df32.mul_ps(a2_ps, wv))])
    det12 = _acc([df32.mul_ps(d1p, d2p), nps(a2)])
    ok12 = det12 > _TOL_DET
    res12full = jnp.where(ok12, num12 / jnp.where(ok12, det12, 1.0),
                          jnp.inf)
    res12full = jnp.where(jnp.isnan(res12full), jnp.inf, res12full)
    w1D = _acc([df32.mul_ps(d2p, p_p), nps(df32.mul_ps(a_ps, q_p))])
    w2D = _acc([df32.mul_ps(d1p, q_p), nps(df32.mul_ps(a_ps, p_p))])
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
        res_ref[0, 0, q] = rmin[:, 0]
        idx_ref[0, 0, q] = idx.astype(jnp.int32)


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
    # 2-var case numerators df-accurate (near-duplicate atoms cancel
    # these to ~1e-6; cf. dfscan._TOL_DET)
    w1D_13 = dfscan._accumulate([mul(d3, p_), neg(mul(b_, r3))])
    w2D_13 = dfscan._accumulate([mul(d1, r3), neg(mul(b_, p_))])
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
    w1D_23 = dfscan._accumulate([mul(d3, q_), neg(mul(c_, r3))])
    w2D_23 = dfscan._accumulate([mul(d2, r3), neg(mul(c_, q_))])
    res23_col, _ = dfscan._two_var_cases(
        res23_col, w1D_23, w2D_23, val(q_), val(r3),
        res2_col, res3_only, val(w_))

    # df hoists for the in-kernel determinant/Cramer evaluation: the
    # O(1) normalized-Gram terms of detG3 and the D_i cancel to ~1e-6
    # for highly correlated atoms, so the kernel evaluates them in
    # double-float from these presplit factors (cf. dfscan._TOL_DET)
    wf = val(w_)
    rowD2a = add(mul(r3, b_), neg(mul(d3, p_)))        # r b - d3 p
    rowEG = add(mul(p_, b_), neg(mul(d1, r3)))         # p b - d1 r
    # rowF = d1 d3 - b^2 == det13 (hoisted above)
    colB = add(mul(c_, r3), neg(mul(q_, d3)))          # c r - q d3
    colC = add(mul(q_, c_), neg(mul(r3, d2)))          # q c - r d2
    # colA = d2 d3 - c^2 == det23; colH = q c == Ccq (hoisted above)

    def ps_stack(dfs):
        comps = []
        for x in dfs:
            comps.extend(df32.presplit(x))
        return jnp.stack(comps, axis=1)                # (B, 4*len, N)

    row_pack = jnp.concatenate([
        ps_stack([Rb2, Rbp, d1, Rp2, b_, p_, rowD2a, rowEG, det13]),
        jnp.stack([res1_row, res13_row], axis=1),
    ], axis=1).astype(jnp.float32)                     # (B, 38, N1p)
    col_pack = jnp.concatenate([
        ps_stack([U1, U2, U3, U4, V1, V2, X1c, d2, q_, c_,
                  det23, colB, colC, Ccq]),
        jnp.stack([res2_col, res23_col], axis=1),
    ], axis=1).astype(jnp.float32)                     # (B, 58, N2)
    col_pack = jnp.pad(col_pack, ((0, 0), (0, 0), (0, N2p - N2)))

    vox = []
    for x in (C2v, w_, d3, r3):
        vox.extend(df32.presplit(x))
    vox = jnp.stack([v[:, 0] for v in vox]
                    + [wf[:, 0]], axis=1)
    vox = vox[:, None, :].astype(jnp.float32)          # (B, 1, 17) -> pad
    vox = jnp.pad(vox, ((0, 0), (0, 0), (0, 24 - vox.shape[2])))

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
            pl.BlockSpec((1, 38, tile), lambda b, c, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 58, N2B), lambda b, c, t: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 24), lambda b, c, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # 4D (B, NB, segs, N1p) layout: the last-two block dims
            # (segs, tile) satisfy Mosaic's full-dim/divisibility rule
            # for ANY (NB, segs) combination (the flat (B, NB*segs, N1p)
            # form needs segs % 8 == 0 whenever NB > 1)
            pl.BlockSpec((1, 1, segs, tile), lambda b, c, t: (b, c, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, segs, tile), lambda b, c, t: (b, c, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, NB, segs, N1p), jnp.float32),
            jax.ShapeDtypeStruct((B, NB, segs, N1p), jnp.int32),
        ],
        interpret=interpret,
    )(q1ab_t, A1h.astype(jnp.float32), qA1[2].astype(jnp.float32),
      qb2, Rb.astype(jnp.float32), ab.astype(jnp.float32),
      row_pack, col_pack, vox)
    row_res = row_res.reshape(B, NB * segs, N1p)
    row_i2 = row_i2.reshape(B, NB * segs, N1p)
    row = lax.broadcasted_iota(jnp.int32, (B, 1, N1p), 2)
    row_res = jnp.where(row < N1, row_res, jnp.inf)
    n_seg = NB * segs
    return (row_res.reshape(B, n_seg * N1p),
            row_i2.reshape(B, n_seg * N1p), yn * yn)


# ---------------------------------------------------------------------------
# Fused double-float re-scan for the 4-block (EAR) configuration
# ---------------------------------------------------------------------------
#
# The two-pass EAR path (ops/f32scan.df4_twopass) re-ranks the selected
# R rows with dfscan.df4_candidates, whose XLA form materializes every
# (B, R, N2) double-float sweep intermediate in HBM (10+ sweeps). This
# kernel performs the whole per-(row, column) support enumeration in VMEM
# with the same residual semantics: base supports ({1,2} unconstrained-
# sign + hoisted row/col/empty minima), {1,2,X} per extra column via the
# quadratic-in-g12 bordered determinant (dfscan._sub3_df), and the
# {1,2,3,4} LDL' finish (order csf, ear, fasc1, fasc2 — dfscan
# df4_candidates:640-719) — compensated values, f32 feasibility booleans,
# first-minimum (i1, i2, i3, i4) tie order via the in-kernel flat rank.


def _df4_kernel(q1ab_ref, a1h_ref, ra_ref, qb_ref, rb_ref, ab_ref,
                row_ref, col_ref, vox_ref, res_ref, idx_ref,
                *, n2, n2b, tile, n3, n4, segs):
    NS = n3 * n4
    nx = n3 + n4
    INF = float(jnp.inf)
    a_ps = _df_gram_ps(q1ab_ref[0, 0], qb_ref[0, 0], a1h_ref[0, 0],
                       ra_ref[0, 0], rb_ref[0, 0], ab_ref[0, 0],
                       tile, n2b)

    rp = lambda i: tuple(row_ref[0, i + k][:, None] for k in range(4))
    rf = lambda i: row_ref[0, i][:, None]
    cp = lambda i: tuple(col_ref[0, i + k][None, :] for k in range(4))
    cf = lambda i: col_ref[0, i][None, :]
    vp = lambda i: tuple(vox_ref[0, 0, i + k] for k in range(4))
    vf = lambda i: vox_ref[0, 0, i]
    sanit = lambda x: jnp.where(jnp.isnan(x), INF, x)

    # pack layout offsets (mirrored by row_scan_df4's packing)
    r_ldl = 12 + 12 * nx
    r_res1 = r_ldl + 16 * NS
    r_ok = r_res1 + 1
    r_row0 = r_ok + 3 * NS
    c_x0 = 16
    c_l23 = c_x0 + 24 * nx
    c_ldl = c_l23 + 4 * n3
    c_res2 = c_ldl + 12 * NS
    c_col0 = c_res2 + 1
    v_x0 = 4
    v_s0 = v_x0 + 6 * nx
    v_fix0 = v_s0 + 4 * NS

    d1, p_, p2 = rp(0), rp(4), rp(8)
    d2, q_, q2, d2w = cp(0), cp(4), cp(8), cp(12)
    w_ = vp(0)
    d1f, pf = d1[0], p_[0]
    d2f, qf = d2[0], q_[0]
    wf = w_[0]
    af = a_ps[0]

    a2 = df32.mul_ps(a_ps, a_ps)
    a2_ps = df32.presplit(df32.fast_two_sum(a2[0], a2[1]))
    pq = df32.mul_ps(p_, q_)
    pq_ps = df32.presplit(df32.fast_two_sum(pq[0], pq[1]))

    # ---- base: {1,2} (unconstrained-sign feasibility), row/col/empty ----
    apq = df32.mul_ps(a_ps, pq_ps)
    t_a2w = df32.mul_ps(a2_ps, w_)
    t_d1q2 = df32.mul_ps(d1, q2)
    t_p2d2 = df32.mul_ps(p2, d2)
    num12 = _acc([df32.mul_ps(d1, d2w), (-t_a2w[0], -t_a2w[1]),
                  (2.0 * apq[0], 2.0 * apq[1]),
                  (-t_d1q2[0], -t_d1q2[1]), (-t_p2d2[0], -t_p2d2[1])])
    det2 = d1f * d2f - af * af
    n1w = d2f * pf - af * qf
    n2w = d1f * qf - af * pf
    feas12 = (det2 > _TOL * d1f * d2f) & (n1w >= 0) & (n2w >= 0)
    r12 = jnp.where(feas12, num12 / jnp.where(feas12, det2, 1.0), INF)
    base = jnp.minimum(sanit(r12), rf(r_res1))
    base = jnp.minimum(base, cf(c_res2))
    base = jnp.minimum(base, wf)

    # U1 = q^2 - d2*w (column-level, X-independent)
    mU1 = df32.df_add((q2[0], q2[1]), (-d2w[0], -d2w[1]))
    U1_ps = df32.presplit(mU1)

    # ---- supports {1,2,X} per extra column X (i3's first, then i4's) ----
    r1x = []
    for x in range(nx):
        bX, bX2, bXp = rp(12 + 12 * x), rp(16 + 12 * x), rp(20 + 12 * x)
        U2X, U3X, U4X = (cp(c_x0 + 24 * x + 4 * j) for j in range(3))
        V1X, V2X, cX = (cp(c_x0 + 24 * x + 4 * j) for j in range(3, 6))
        C2X = vp(v_x0 + 6 * x)
        dXf = vf(v_x0 + 6 * x + 4)
        rXf = vf(v_x0 + 6 * x + 5)
        m1 = df32.mul_ps(bX, V1X)
        m2 = df32.mul_ps(p_, V2X)
        s_hi, s_e = df32.two_sum(m1[0], m2[0])
        s_ps = df32.presplit(df32.fast_two_sum(s_hi, s_e + m1[1] + m2[1]))
        det4 = _acc([df32.mul_ps(bX2, U1_ps), df32.mul_ps(bXp, U2X),
                     df32.mul_ps(d1, U3X), df32.mul_ps(p2, U4X),
                     df32.mul_ps(a_ps, s_ps), df32.mul_ps(a2_ps, C2X)])
        bf, cfX = bX[0], cX[0]
        det3 = (d1f * (d2f * dXf - cfX * cfX) - af * (af * dXf - cfX * bf)
                + bf * (af * cfX - d2f * bf))
        D1 = (pf * (d2f * dXf - cfX * cfX) - qf * (af * dXf - cfX * bf)
              + rXf * (af * cfX - d2f * bf))
        D2 = (-pf * (af * dXf - bf * cfX) + qf * (d1f * dXf - bf * bf)
              - rXf * (d1f * cfX - af * bf))
        D3 = (pf * (af * cfX - bf * d2f) - qf * (d1f * cfX - bf * af)
              + rXf * (d1f * d2f - af * af))
        feas = ((det3 > _TOL * d1f * d2f * dXf)
                & (D1 >= 0) & (D2 >= 0) & (D3 >= 0))
        r1x.append(sanit(jnp.where(
            feas, det4 / jnp.where(feas, det3, 1.0), INF)))

    # ---- sweeps: {1,2,3,4} LDL' finish + per-sweep folds ----
    best = jnp.full(a_ps[0].shape, INF, jnp.float32)
    best_s = jnp.zeros(a_ps[0].shape, jnp.int32)
    for s in range(NS):
        i3, i4 = divmod(s, n4)
        b3ps = rp(12 + 12 * i3)
        L23 = cp(c_l23 + 4 * i3)
        e4r, kap1, invD1h, rho1 = (rp(r_ldl + 16 * s + 4 * j)
                                   for j in range(4))
        L24, d2r, q2r = (cp(c_ldl + 12 * s + 4 * j) for j in range(3))
        ok34s, u3fs, u4fs, L43fs = (vf(v_s0 + 4 * s + j)
                                    for j in range(4))
        rowoks = rf(r_ok + 3 * s)
        L13fs = rf(r_ok + 3 * s + 1)
        L14fs = rf(r_ok + 3 * s + 2)

        m1 = df32.mul_ps(b3ps, L23)
        m2 = df32.mul_ps(e4r, L24)
        hi, e = df32.two_sum(af, -m1[0])
        lo = a_ps[1] + e - m1[1]
        hi, e = df32.two_sum(hi, -m2[0])
        NUM = df32.fast_two_sum(hi, lo + e - m2[1])
        NUM_ps = df32.presplit(NUM)
        n2d = df32.mul_ps(NUM_ps, NUM_ps)
        n2_ps = df32.presplit(df32.fast_two_sum(n2d[0], n2d[1]))
        tD = df32.mul_ps(n2_ps, invD1h)
        hi, e = df32.two_sum(d2r[0], -tD[0])
        D2h = df32.fast_two_sum(hi, d2r[1] + e - tD[1])
        pointok = D2h[0] > _TOL * d2f
        D2hs = (jnp.where(pointok, D2h[0], 1.0),
                jnp.where(pointok, D2h[1], 0.0))
        uK = df32.mul_ps(NUM_ps, kap1)
        hi, e = df32.two_sum(q2r[0], -uK[0])
        pi2 = df32.fast_two_sum(hi, q2r[1] + e - uK[1])
        pi2_ps = df32.presplit(pi2)
        p2q = df32.mul_ps(pi2_ps, pi2_ps)
        p2q_df = df32.fast_two_sum(p2q[0], p2q[1])
        # double-float division (dfscan._df_div, inlined)
        q0 = p2q_df[0] / D2hs[0]
        pdiv, ediv = df32.two_prod(q0, D2hs[0])
        r_hi = (p2q_df[0] - pdiv) - ediv + p2q_df[1] - q0 * D2hs[1]
        div = df32.fast_two_sum(q0, r_hi / D2hs[0])
        hi, e = df32.two_sum(rho1[0], -div[0])
        res1234 = hi + (rho1[1] + e - div[1])
        pi2f = pi2[0]
        wb2 = pi2f / D2hs[0]
        L21f = NUM[0] * invD1h[0]
        wb1 = kap1[0] - L21f * wb2
        we4 = u4fs - L14fs * wb1 - L24[0] * wb2
        we3 = u3fs - L43fs * we4 - L13fs * wb1 - L23[0] * wb2
        feasF = ((ok34s > 0.5) & (rowoks > 0.5) & pointok
                 & (pi2f >= 0) & (wb1 >= 0) & (we4 >= 0) & (we3 >= 0))
        r1234 = jnp.where(feasF, sanit(res1234), INF)

        res_s = jnp.minimum(base, r1x[i3])
        res_s = jnp.minimum(res_s, r1x[n3 + i4])
        res_s = jnp.minimum(res_s, r1234)
        res_s = jnp.minimum(res_s, rf(r_row0 + s))
        res_s = jnp.minimum(res_s, cf(c_col0 + s))
        res_s = jnp.minimum(res_s, vf(v_fix0 + s))
        res_s = sanit(res_s)
        upd = res_s < best
        best = jnp.where(upd, res_s, best)
        best_s = jnp.where(upd, jnp.int32(s), best_s)

    # ---- per-(row, segment) minima over this column block ----
    cb = pl.program_id(1)
    col = cb * n2b + lax.broadcasted_iota(jnp.int32, best.shape, 1)
    best = jnp.where(col < n2, best, INF)
    gflat = col * jnp.int32(NS) + best_s        # (i2, s) lexicographic
    seg = n2b // segs
    big = jnp.int32(2 ** 30)
    for q in range(segs):
        lo_c = q * seg
        r_q = jnp.where(
            (col >= cb * n2b + lo_c) & (col < cb * n2b + lo_c + seg),
            best, INF)
        rmin = jnp.min(r_q, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(r_q == rmin, gflat, big), axis=1)
        idx = jnp.where(jnp.isfinite(rmin[:, 0]), idx, 0)
        res_ref[0, 0, q] = rmin[:, 0]
        idx_ref[0, 0, q] = idx.astype(jnp.int32)


def candidates_from_rows_df4(row_res, row_flat, M, NS, N4, N2,
                             segments_total):
    """Top-M from row_scan_df4's per-(row, segment) minima, in the
    reference (i1, i2, i3, i4) first-minimum product order
    (mf_utils.py:637): candidates are re-keyed by the global flat rank
    i1 * (N2 * NS) + i2 * NS + s, index-sorted, then stably sorted by
    value so exact ties resolve to the earliest candidate. Returns
    (cand (B, M, 4) int32 [i1, i2, i3, i4], vals (B, M))."""
    B, L = row_res.shape
    n1p = L // segments_total
    pos_i1 = (jnp.arange(L, dtype=jnp.int32) % n1p)[None, :]
    gflat = pos_i1 * jnp.int32(N2 * NS) + row_flat
    order = jnp.argsort(gflat, axis=1)
    v_o = jnp.take_along_axis(row_res, order, axis=1)
    f_o = jnp.take_along_axis(gflat, order, axis=1)
    rank = jnp.argsort(v_o, axis=1, stable=True)[:, :M]
    vals = jnp.take_along_axis(v_o, rank, axis=1)
    g_m = jnp.take_along_axis(f_o, rank, axis=1)
    i1 = g_m // jnp.int32(N2 * NS)
    rest = g_m % jnp.int32(N2 * NS)
    i2 = rest // jnp.int32(NS)
    s = rest % jnp.int32(NS)
    cand = jnp.stack([i1, i2, s // N4, s % N4], axis=2).astype(jnp.int32)
    return cand, vals


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "segments"))
def row_scan_df4(A1, A2, a3, a4, y, interpret=False, tile=_LANE,
                 segments=1):
    """Per-(row, segment) best candidate for [N1, N2, N3, N4] with
    double-float selection, via the fused kernel (_df4_kernel). The
    intended consumer is the two-pass EAR re-scan (ops/f32scan.
    df4_twopass) with N1 = the selected row budget; residual semantics
    mirror dfscan.df4_candidates (support enumeration: {1,2}
    unconstrained-sign, {1,2,X} quadratic-in-g12 bordered determinants,
    {1,2,3,4} LDL' finish in (csf, ear, fasc1, fasc2) order, hoisted
    row/col/fixed sub-support minima folded per sweep; cf.
    dfscan.py:640-726 and reference mf_utils.py:612-657).
    Returns (row_res (B, Q*N1p), row_flat (B, Q*N1p) [= i2 * NS + s],
    y_sq (B,)); consume with candidates_from_rows_df4
    (segments_total = n_segments_df4(N2, segments))."""
    B, S, N1 = A1.shape
    N2, N3, N4 = A2.shape[2], a3.shape[2], a4.shape[2]
    NS, nx = N3 * N4, N3 + N4
    N2p = _round_up(N2, _LANE)
    A1p, _ = mfn._pad_cols(A1, tile)
    A1h, _ = mfn._normalize_block(A1p)
    A2h, _ = mfn._normalize_block(A2)
    A3h, _ = mfn._normalize_block(a3)
    A4h, _ = mfn._normalize_block(a4)
    yh, yn, _ys = mfn._normalize_y(y)
    N1p = A1h.shape[2]

    qA1, qA2, qA3, qA4, qy = (dfscan.quantize2(x)
                              for x in (A1h, A2h, A3h, A4h, yh))
    diag, vec, cross = "bsn,bsn->bn", "bsn,bs->bn", "bsn,bsm->bnm"
    dfg = dfscan.df_gram
    d1 = dfg(qA1, qA1, diag)
    d2 = dfg(qA2, qA2, diag)
    d3 = dfg(qA3, qA3, diag)                      # (B, N3)
    d4 = dfg(qA4, qA4, diag)                      # (B, N4)
    p_ = dfg(qA1, qy, vec)
    q_ = dfg(qA2, qy, vec)
    r3 = dfg(qA3, qy, vec)
    r4 = dfg(qA4, qy, vec)
    b3 = dfg(qA1, qA3, cross)                     # (B, N1p, N3)
    b4 = dfg(qA1, qA4, cross)
    c3 = dfg(qA2, qA3, cross)                     # (B, N2, N3)
    c4 = dfg(qA2, qA4, cross)
    g34 = dfg(qA3, qA4, cross)                    # (B, N3, N4)
    w0 = dfg(qy, qy, "bs,bs->b")
    w_ = (w0[0][:, None], w0[1][:, None])         # (B, 1)

    mul, add, neg, sc = (dfscan._mul, dfscan._add, dfscan._neg,
                         dfscan._scale)
    val, dfm = dfscan._val, dfscan._dfm
    one_df = lambda x: (jnp.ones_like(x[0]), jnp.zeros_like(x[0]))
    df_where = lambda c, x, y: (jnp.where(c, x[0], y[0]),
                                jnp.where(c, x[1], y[1]))
    safe_recip = lambda x, ok: dfscan._df_div(
        one_df(x), df_where(ok, x, one_df(x)))
    ax = lambda x, sh: (x[0].reshape(sh), x[1].reshape(sh))

    # ---- voxel/row/col LDL' hoists (mirror dfscan.df4_candidates) ----
    d3e, r3e = ax(d3, (B, 1, N3, 1)), ax(r3, (B, 1, N3, 1))
    d4e, r4e = ax(d4, (B, 1, 1, N4)), ax(r4, (B, 1, 1, N4))
    ge = ax(g34, (B, 1, N3, N4))
    w4 = ax(w0, (B, 1, 1, 1))
    invd3 = dfscan._df_div(one_df(d3e), d3e)
    L43 = mul(ge, invd3)
    D4h = add(d4e, neg(mul(ge, L43)))
    ok34 = val(D4h) > float(dfscan._TOL) * val(d4e)
    invD4h = safe_recip(D4h, ok34)
    t4 = add(r4e, neg(mul(L43, r3e)))
    rho34 = add(w4, neg(mul(mul(r3e, r3e), invd3)),
                neg(mul(mul(t4, t4), invD4h)))

    d1e, p1e = ax(d1, (B, N1p, 1, 1)), ax(p_, (B, N1p, 1, 1))
    b3e = ax(b3, (B, N1p, N3, 1))
    b4e = (b4[0][:, :, None, :], b4[1][:, :, None, :])
    d2e, q2e = ax(d2, (B, N2, 1, 1)), ax(q_, (B, N2, 1, 1))
    c3e = ax(c3, (B, N2, N3, 1))
    c4e = (c4[0][:, :, None, :], c4[1][:, :, None, :])

    L13 = mul(b3e, invd3)
    e4r = add(b4e, neg(mul(L43, b3e)))
    L14 = mul(e4r, invD4h)
    D1h = add(d1e, neg(mul(b3e, L13)), neg(mul(e4r, L14)))
    rowok = val(D1h) > float(dfscan._TOL) * val(d1e)
    invD1h = safe_recip(D1h, rowok)
    pi1 = add(p1e, neg(mul(L13, r3e)), neg(mul(L14, t4)))
    kap1 = mul(pi1, invD1h)
    rho1 = add(rho34, neg(mul(pi1, kap1)))        # (B, N1p, N3, N4)

    L23 = mul(c3e, invd3)
    e4c = add(c4e, neg(mul(L43, c3e)))
    L24 = mul(e4c, invD4h)
    d2r = add(d2e, neg(mul(c3e, L23)), neg(mul(e4c, L24)))
    q2r = add(q2e, neg(mul(L23, r3e)), neg(mul(L24, t4)))

    u3f = val(mul(r3e, invd3))                    # (B, 1, N3, 1)
    u4f = val(mul(t4, invD4h))                    # (B, 1, N3, N4)
    L43f = val(L43)

    # hoisted sub-support minima (per-sweep fold attribution)
    r_fix = jnp.minimum(dfscan._sub1_df(d3e, r3e, w4),
                        dfscan._sub1_df(d4e, r4e, w4))
    r_fix = jnp.minimum(
        r_fix, dfscan._sub2_df(d3e, d4e, ge, r3e, r4e, w4))
    r_fix = jnp.broadcast_to(r_fix[:, 0], (B, N3, N4))
    r_row = jnp.minimum(dfscan._sub2_df(d1e, d3e, b3e, p1e, r3e, w4),
                        dfscan._sub2_df(d1e, d4e, b4e, p1e, r4e, w4))
    r_row = jnp.minimum(r_row, dfscan._sub3_df(
        d1e, d3e, d4e, b3e, b4e, ge, p1e, r3e, r4e, w4))
    r_row = jnp.broadcast_to(r_row, (B, N1p, N3, N4))
    r_col = jnp.minimum(dfscan._sub2_df(d2e, d3e, c3e, q2e, r3e, w4),
                        dfscan._sub2_df(d2e, d4e, c4e, q2e, r4e, w4))
    r_col = jnp.minimum(r_col, dfscan._sub3_df(
        d2e, d3e, d4e, c3e, c4e, ge, q2e, r3e, r4e, w4))
    r_col = jnp.broadcast_to(r_col, (B, N2, N3, N4))
    res1_row = dfscan._sub1_df(d1, p_, w_)        # (B, N1p)
    res2_col = dfscan._sub1_df(d2, q_, w_)        # (B, N2)

    # ---- presplit packing (layout mirrored by _df4_kernel) ----
    ps = df32.presplit
    p2 = mul(p_, p_)
    q2sq = mul(q_, q_)
    d2w = mul(d2, w_)
    xs_d = ([(d3[0][:, i:i + 1], d3[1][:, i:i + 1]) for i in range(N3)]
            + [(d4[0][:, i:i + 1], d4[1][:, i:i + 1]) for i in range(N4)])
    xs_r = ([(r3[0][:, i:i + 1], r3[1][:, i:i + 1]) for i in range(N3)]
            + [(r4[0][:, i:i + 1], r4[1][:, i:i + 1]) for i in range(N4)])
    xs_b = ([(b3[0][:, :, i], b3[1][:, :, i]) for i in range(N3)]
            + [(b4[0][:, :, i], b4[1][:, :, i]) for i in range(N4)])
    xs_c = ([(c3[0][:, :, i], c3[1][:, :, i]) for i in range(N3)]
            + [(c4[0][:, :, i], c4[1][:, :, i]) for i in range(N4)])

    rows = list(ps(d1)) + list(ps(p_)) + list(ps(p2))
    for x in range(nx):
        bX = xs_b[x]
        rows += list(ps(bX)) + list(ps(mul(bX, bX))) \
            + list(ps(mul(bX, p_)))
    sw = lambda z, i3, i4: (z[0][:, :, i3, i4], z[1][:, :, i3, i4])
    for s in range(NS):
        i3, i4 = divmod(s, N4)
        for z in (sw(e4r, i3, i4), sw(kap1, i3, i4),
                  sw(invD1h, i3, i4), sw(rho1, i3, i4)):
            rows += list(ps(z))
    rows.append(res1_row)
    fl = jnp.float32
    for s in range(NS):
        i3, i4 = divmod(s, N4)
        rows += [rowok[:, :, i3, i4].astype(fl),
                 val(L13)[:, :, i3, 0] * jnp.ones((B, N1p), fl),
                 val(L14)[:, :, i3, i4]]
    for s in range(NS):
        i3, i4 = divmod(s, N4)
        rows.append(r_row[:, :, i3, i4])

    cols = list(ps(d2)) + list(ps(q_)) + list(ps(q2sq)) + list(ps(d2w))
    for x in range(nx):
        dX, rX, cX = xs_d[x], xs_r[x], xs_c[x]
        U2X = sc(add(mul(d2, rX), neg(mul(cX, q_))), 2.0)
        U3X = add(mul(d2, add(mul(dX, w_), neg(mul(rX, rX)))),
                  neg(mul(dX, q2sq)), sc(dfm(cX, q_, rX), 2.0),
                  neg(mul(mul(cX, cX), w_)))
        U4X = add(mul(cX, cX), neg(mul(d2, dX)))
        V1X = sc(add(mul(cX, w_), neg(mul(q_, rX))), 2.0)
        V2X = sc(add(mul(dX, q_), neg(mul(cX, rX))), 2.0)
        for z in (U2X, U3X, U4X, V1X, V2X, cX):
            cols += list(ps(z))
    for i3 in range(N3):
        cols += list(ps((L23[0][:, :, i3, 0], L23[1][:, :, i3, 0])))
    swc = lambda z, i3, i4: (z[0][:, :, i3, i4], z[1][:, :, i3, i4])
    for s in range(NS):
        i3, i4 = divmod(s, N4)
        for z in (swc(L24, i3, i4), swc(d2r, i3, i4), swc(q2r, i3, i4)):
            cols += list(ps(z))
    cols.append(res2_col)
    for s in range(NS):
        i3, i4 = divmod(s, N4)
        cols.append(r_col[:, :, i3, i4])

    sq = lambda z: (z[0][:, 0], z[1][:, 0])
    vox = list(v[:, 0] if v.ndim > 1 else v
               for v in ps((w0[0][:, None], w0[1][:, None])))
    for x in range(nx):
        dX, rX = xs_d[x], xs_r[x]
        C2X = add(mul(rX, rX), neg(mul(dX, w_)))
        vox += [v[:, 0] for v in ps(C2X)]
        vox += [val(dX)[:, 0], val(rX)[:, 0]]
    for s in range(NS):
        i3, i4 = divmod(s, N4)
        vox += [ok34[:, 0, i3, i4].astype(fl), u3f[:, 0, i3, 0],
                u4f[:, 0, i3, i4], L43f[:, 0, i3, i4]]
    for s in range(NS):
        i3, i4 = divmod(s, N4)
        vox.append(r_fix[:, i3, i4])

    # ---- pack + pallas_call (column-block outer, row tiles inner) ----
    NB = 1
    while N2p // NB > 256 and NB < 16:
        NB *= 2
    N2B = _round_up(int(math.ceil(N2p / NB)), _LANE)
    N2pb = NB * N2B
    n_tiles = N1p // tile
    segs = segments

    NR = _round_up(len(rows), 8)
    row_pack = jnp.stack(rows, axis=1)
    row_pack = jnp.pad(row_pack, ((0, 0), (0, NR - len(rows)), (0, 0)))
    NC = _round_up(len(cols), 8)
    col_pack = jnp.stack(cols, axis=1)
    col_pack = jnp.pad(col_pack,
                       ((0, 0), (0, NC - len(cols)), (0, N2pb - N2)))
    NV = _round_up(len(vox), 8)
    vox_pack = jnp.stack(vox, axis=1)[:, None, :]
    vox_pack = jnp.pad(vox_pack, ((0, 0), (0, 0), (0, NV - len(vox))))

    # contiguous (B, blocks, S, d) operand layout (one linear HBM read
    # per VMEM block; cf. the packed layout ops/pallas_prep emits)
    t4d = lambda x: x.reshape(B, S, n_tiles, -1).transpose(0, 2, 1, 3)
    q1ab_t = jnp.concatenate(
        [t4d(qA1[0].reshape(B, S, n_tiles, tile)),
         t4d(qA1[1].reshape(B, S, n_tiles, tile))], axis=3)
    a1h_t = t4d(A1h.astype(jnp.float32))
    ra_t = t4d(qA1[2].astype(jnp.float32))
    padb = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, N2pb - x.shape[2])))
    c4d = lambda x: padb(x).reshape(B, S, NB, N2B).transpose(0, 2, 1, 3)
    qb2 = jnp.concatenate([c4d(qA2[0]), c4d(qA2[1])], axis=3)
    rb_c = c4d(qA2[2].astype(jnp.float32))
    ab_c = c4d(qA2[3].astype(jnp.float32))

    grid = (B, NB, n_tiles)
    tiled = lambda d: pl.BlockSpec((1, 1, S, d),
                                   lambda b, c, t: (b, t, 0, 0),
                                   memory_space=pltpu.VMEM)
    colblk = lambda d: pl.BlockSpec((1, 1, S, d),
                                    lambda b, c, t: (b, c, 0, 0),
                                    memory_space=pltpu.VMEM)
    kernel = functools.partial(_df4_kernel, n2=N2, n2b=N2B, tile=tile,
                               n3=N3, n4=N4, segs=segs)
    # the NS-unrolled support enumeration keeps ~150 live (tile, N2B)
    # temporaries: its kernel stack exceeds Mosaic's default 16 MB scoped-
    # VMEM cap (measured 20.24 MB at NS=10, N2B=256). Grant it headroom —
    # v5e cores have 128 MB of VMEM and the operand blocks are small.
    params = (dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)) if not interpret else {})
    row_res, row_flat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tiled(2 * tile),                       # int8 [Q1|Q2] tile
            tiled(tile),                           # A1h tile (f32)
            tiled(tile),                           # Ra tile (f32)
            colblk(2 * N2B),                       # int8 [Q1b|Q2b]
            colblk(N2B),                           # Rb
            colblk(N2B),                           # ab
            pl.BlockSpec((1, NR, tile), lambda b, c, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, N2B), lambda b, c, t: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NV), lambda b, c, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # 4D layout: valid for any (NB, segs) — see row_scan_df3
            pl.BlockSpec((1, 1, segs, tile), lambda b, c, t: (b, c, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, segs, tile), lambda b, c, t: (b, c, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, NB, segs, N1p), jnp.float32),
            jax.ShapeDtypeStruct((B, NB, segs, N1p), jnp.int32),
        ],
        interpret=interpret,
        **params,
    )(q1ab_t, a1h_t, ra_t, qb2, rb_c, ab_c, row_pack, col_pack, vox_pack)
    row_res = row_res.reshape(B, NB * segs, N1p)
    row_flat = row_flat.reshape(B, NB * segs, N1p)
    rowi = lax.broadcasted_iota(jnp.int32, (B, 1, N1p), 2)
    row_res = jnp.where(rowi < N1, row_res, jnp.inf)
    n_seg = NB * segs
    return (row_res.reshape(B, n_seg * N1p),
            row_flat.reshape(B, n_seg * N1p), yn * yn)


def n_segments_df4(N2, segments=1):
    """Total segment count of row_scan_df4's output (static shape math;
    pass to candidates_from_rows_df4 as segments_total)."""
    N2p = _round_up(N2, _LANE)
    NB = 1
    while N2p // NB > 256 and NB < 16:
        NB *= 2
    return NB * segments
