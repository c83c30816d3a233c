"""Compensated (double-float) exhaustive candidate scan.

Exact-selection rework of the f32 row scans: the algebraic NNLS residual
1 - w'b cancels catastrophically (true gaps ~1e-9 * ||y||^2 vs ~1e-7 f32
noise), so this module evaluates every candidate's residual through two
exact mechanisms:

1. **Exact Gram via int8 MXU** (``quantize2`` / ``df_gram``): each operand
   is decomposed as X = s1*Q1 + s2*Q2 + R with int8 Q's (exact int32 MXU
   accumulation, values < 2^24 so even the int32->f32 cast is exact) and a
   tiny f32 remainder R (|R| <= 2^-15); the Q x Q terms are EXACT and the
   A'R cross matmuls carry only a *relative* f32 error on O(1e-4)-magnitude
   values. The result is a (hi, lo) double-float Gram accurate to ~1e-10.

2. **Compensated bordered determinants**: for a support S, the LS residual
   satisfies res * det(G_S) = det([[G_S, b_S], [b_S', y'y]]). The bordered
   determinant is a polynomial in the Gram entries; it is evaluated with
   error-free products + compensated summation (ops/df32), hoisting all
   per-row (i1) / per-column (i2) factors out of the grid. The division by
   det(G_S) only adds *relative* error — harmless for ranking values near
   zero. Support-selection BOOLEANS (Cramer sign tests, reference
   mf_utils.py:548-593) stay in plain f32: a flipped sign near the boundary
   switches between supports whose residuals agree to second order.

Result: candidate residuals resolved to ~1e-10 * ||y||^2 on f32 hardware —
the scan itself reproduces float64 selection (reference mf_utils.py Numba
kernels) instead of delegating near-ties to downstream re-scoring.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from . import df32
from . import nnls as mfn

_HP = dict(preferred_element_type=jnp.float32,
           precision=lax.Precision.HIGHEST)
_S1 = jnp.float32(2.0 ** -7)
_S2 = jnp.float32(2.0 ** -15)
_TOL = jnp.float32(100 * 1.1920929e-07)  # 100 eps_f32 (cf. mf_utils:480)


def quantize2(X):
    """Two-level int8 decomposition X = s1*Q1 + s2*Q2 + R (exact).

    X: f32 array with |X| <= ~1 (normalized columns / signal).
    Returns (Q1 int8, Q2 int8, R f32, a f32) with a = s1*Q1 + s2*Q2 exact
    and R = X - a exact (|R| <= ~2^-15; entries at +-1 saturate the int8
    levels and degrade gracefully to |R| <= ~2^-8 — still exact, only the
    f32 cross-matmul error grows with ||R||).
    """
    X = X.astype(jnp.float32)
    Q1 = jnp.clip(jnp.round(X / _S1), -127, 127).astype(jnp.int8)
    A1 = Q1.astype(jnp.float32) * _S1
    R1 = X - A1
    Q2 = jnp.clip(jnp.round(R1 / _S2), -127, 127).astype(jnp.int8)
    a = A1 + Q2.astype(jnp.float32) * _S2
    R = X - a
    return Q1, Q2, R, a


def df_gram(qa, qb, contract):
    """Double-float Gram block from two quantized operands.

    qa, qb: (Q1, Q2, R, a) tuples; ``contract`` is an einsum spec
    contracting the sequence axis, e.g. "bst,bsn->btn" or "bsn,bs->bn".
    Returns (hi, lo).
    """
    Q1a, Q2a, Ra, aa = qa
    Q1b, Q2b, Rb, ab = qb
    ei = lambda x, y: jnp.einsum(contract, x, y,
                                 preferred_element_type=jnp.int32)
    ef = lambda x, y: jnp.einsum(contract, x, y, **_HP)
    t11 = ei(Q1a, Q1b)
    t12 = ei(Q1a, Q2b) + ei(Q2a, Q1b)
    t22 = ei(Q2a, Q2b)
    v_a = t11.astype(jnp.float32) * jnp.float32(2.0 ** -14)
    v_b = t12.astype(jnp.float32) * jnp.float32(2.0 ** -22)
    v_c = t22.astype(jnp.float32) * jnp.float32(2.0 ** -30)
    # exact identity: A'B = a'b + A'R_b + R_a'b  (A = a + R_a, B = b + R_b)
    c1 = ef(aa + Ra, Rb)
    c2 = ef(Ra, ab)
    return df32.df_from_sum(v_a, v_b, v_c, c1, c2)


def df_gram_tile(qa_t, qb, n2):
    """Specialized double-float Gram for one (B, S, T) x (B, S, N2p) tile.

    The four int8 x int8 products are fused into ONE MXU call on
    concatenated operands (better systolic-array utilization than four
    skinny matmuls), and the small A'R cross terms (values ~1e-4 needing
    only ~1e-6 relative accuracy) run at Precision.HIGH instead of HIGHEST.
    qa_t: quantized tile (Q1 (B,S,T), Q2, R, a); qb: quantized full block.
    Returns (hi, lo) of shape (B, T, N2p).
    """
    Q1a, Q2a, Ra, aa = qa_t
    Q1b, Q2b, Rb, ab = qb
    T = Q1a.shape[2]
    Qa = jnp.concatenate([Q1a, Q2a], axis=2)            # (B, S, 2T)
    Qb = jnp.concatenate([Q1b, Q2b], axis=2)            # (B, S, 2N2)
    P = jnp.einsum("bst,bsn->btn", Qa, Qb,
                   preferred_element_type=jnp.int32)
    t11 = P[:, :T, :n2]
    t12 = P[:, :T, n2:] + P[:, T:, :n2]
    t22 = P[:, T:, n2:]
    v_a = t11.astype(jnp.float32) * jnp.float32(2.0 ** -14)
    v_b = t12.astype(jnp.float32) * jnp.float32(2.0 ** -22)
    v_c = t22.astype(jnp.float32) * jnp.float32(2.0 ** -30)
    hp_high = dict(preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGH)
    c1 = jnp.einsum("bst,bsn->btn", aa + Ra, Rb, **hp_high)
    c2 = jnp.einsum("bst,bsn->btn", Ra, ab, **hp_high)
    return df32.df_from_sum(v_a, v_b, v_c, c1, c2)


def _df(hi, lo=None):
    if lo is None:
        lo = jnp.zeros_like(hi)
    return (hi, lo)


def _mul(x, y):
    return df32.df_mul(x, y)


def _add(*xs):
    out = xs[0]
    for x in xs[1:]:
        out = df32.df_add(out, x)
    return out


def _neg(x):
    return df32.df_neg(x)


def _scale(x, k):
    return (x[0] * k, x[1] * k)  # k a power of two (exact)


def _val(x):
    return x[0] + x[1]


def _bcast(x, expand):
    return (expand(x[0]), expand(x[1]))


def _accumulate(terms):
    """Compensated sum of df terms: two_sum cascade on the his, plain sum
    of the los (magnitudes ~ulp of the mains)."""
    hi = terms[0][0]
    lo = terms[0][1]
    for t in terms[1:]:
        hi, e = df32.two_sum(hi, t[0])
        lo = lo + (e + t[1])
    return hi + lo


@partial(jax.jit, static_argnames=("M", "tile"))
def df3_candidates(A1, A2, a3, y, M=8, tile=256):
    """Top-M candidates for [N1, N2, 1] with double-float selection.

    A1 (B, S, N1), A2 (B, S, N2), a3 (B, S, 1), y (B, S). Returns
    (cand (B, M, 2) int32 [i1, i2], res (B, M) residuals of the NORMALIZED
    problem, y_sq (B,) raw ||y||^2). Reference decision logic
    (mf_utils.py:548-593) with compensated residual values.
    """
    B, S, N1 = A1.shape
    N2 = A2.shape[2]
    A1p, _N1 = mfn._pad_cols(A1, tile)
    A1h, an1 = mfn._normalize_block(A1p)
    A2h, an2 = mfn._normalize_block(A2)
    A3h, an3 = mfn._normalize_block(a3)
    yh, yn, yn_safe = mfn._normalize_y(y)
    tile = min(tile, A1h.shape[2])
    N1p = A1h.shape[2]
    n_tiles = N1p // tile

    qA1 = quantize2(A1h)
    qA2 = quantize2(A2h)
    qA3 = quantize2(A3h)
    qy = quantize2(yh)

    vec = "bsn,bs->bn"
    diag = "bsn,bsn->bn"
    d1 = df_gram(qA1, qA1, diag)                   # (B, N1p) df
    d2 = df_gram(qA2, qA2, diag)
    d3v = df_gram(qA3, qA3, diag)                  # (B, 1)
    p_ = df_gram(qA1, qy, vec)                     # Y1 (B, N1p)
    q_ = df_gram(qA2, qy, vec)                     # Y2 (B, N2)
    r3 = df_gram(qA3, qy, vec)                     # Y3 (B, 1)
    b_ = df_gram(qA1, qA3, "bsn,bsm->bn")          # g13 (B, N1p)
    c_ = df_gram(qA2, qA3, "bsn,bsm->bn")          # g23 (B, N2)
    w_ = df_gram(qy, qy, "bs,bs->b")               # y'y (B,)
    w_ = (w_[0][:, None], w_[1][:, None])
    d3 = d3v
    r_ = r3

    # ---- voxel scalars ----
    C2v = _add(_mul(r_, r_), _neg(_mul(d3, w_)))       # r^2 - d3 w
    d3w_r2 = _neg(C2v)                                 # d3 w - r^2

    # ---- per-row (i1) df factors ----
    Rb2 = _mul(b_, b_)
    Rbp = _mul(b_, p_)
    Rp2 = _mul(p_, p_)
    # support {1}: res1 = (d1 w - p^2) / d1
    r1_num = _add(_mul(d1, w_), _neg(Rp2))
    res1_row = _val(r1_num) / _val(d1)
    # support {1,3}: bordered det / det2
    det13 = _add(_mul(d1, d3), _neg(_mul(b_, b_)))
    num13 = _accumulate([
        _mul(_mul(d1, d3), w_), _neg(_mul(_mul(d1, r_), r_)),
        _neg(_mul(Rb2, w_)), _scale(_mul(_mul(b_, p_), r_), 2.0),
        _neg(_mul(d3, Rp2))])
    res13_row = num13 / _val(det13)
    # {1,3} feasibility (2-var case logic, f32)
    w1D_13 = _val(d3) * _val(p_) - _val(b_) * _val(r_)
    w2D_13 = _val(d1) * _val(r_) - _val(b_) * _val(p_)
    res13_row, feas13 = _two_var_cases(
        res13_row, w1D_13, w2D_13, _val(p_), _val(r_),
        res1_row, (_val(w_) - _val(r_) ** 2 / _val(d3)), _val(w_))

    # ---- per-column (i2) df factors ----
    Cq2 = _mul(q_, q_)
    Cc2 = _mul(c_, c_)
    Ccq = _mul(c_, q_)
    U1 = _add(Cq2, _neg(_mul(d2, w_)))                 # q^2 - d2 w
    U2 = _scale(_add(_mul(d2, r_), _neg(Ccq)), 2.0)    # 2 (d2 r - c q)
    U3 = _add(_mul(d2, d3w_r2), _neg(_mul(d3, Cq2)),
              _scale(_mul(Ccq, r_), 2.0), _neg(_mul(Cc2, w_)))
    U4 = _add(Cc2, _neg(_mul(d2, d3)))                 # c^2 - d2 d3
    V1 = _scale(_add(_mul(c_, w_), _neg(_mul(q_, r_))), 2.0)
    V2 = _scale(_add(_mul(d3, q_), _neg(_mul(c_, r_))), 2.0)
    # {2}: res2 = (d2 w - q^2)/d2 ; {2,3} analogous to {1,3}
    r2_num = _add(_mul(d2, w_), _neg(Cq2))
    res2_col = _val(r2_num) / _val(d2)
    det23 = _add(_mul(d2, d3), _neg(Cc2))
    num23 = _accumulate([
        _mul(_mul(d2, d3), w_), _neg(_mul(_mul(d2, r_), r_)),
        _neg(_mul(Cc2, w_)), _scale(_mul(Ccq, r_), 2.0),
        _neg(_mul(d3, Cq2))])
    res23_col = num23 / _val(det23)
    w1D_23 = _val(d3) * _val(q_) - _val(c_) * _val(r_)
    w2D_23 = _val(d2) * _val(r_) - _val(c_) * _val(q_)
    res23_col, feas23 = _two_var_cases(
        res23_col, w1D_23, w2D_23, _val(q_), _val(r_),
        res2_col, (_val(w_) - _val(r_) ** 2 / _val(d3)), _val(w_))

    # {1,2} constant pieces: const = d1 (d2 w - q^2) - p^2 d2
    # per-row split: d1 * [col] + p^2 * [col]
    d2w_q2 = r2_num

    # f32 broadcast scalars for decision booleans
    rf, wf = _val(r_)[:, :, None], _val(w_)[:, :, None]

    def rowd(x):
        return (x[0][:, :, None], x[1][:, :, None])

    def cold(x):
        return (x[0][:, None, :], x[1][:, None, :])

    def body(carry, t):
        st = t * tile
        sl = lambda v: lax.dynamic_slice(v, (0, st), (B, tile))
        sld = lambda v: (sl(v[0]), sl(v[1]))
        qa1_t = tuple(lax.dynamic_slice(x, (0, 0, st), (B, S, tile))
                      for x in qA1)
        a12 = df_gram_tile(qa1_t, qA2, N2)              # (B, tile, N2) df

        # df per-row slices, broadcast (B, tile, 1)
        d1t, bt, pt = rowd(sld(d1)), rowd(sld(b_)), rowd(sld(p_))
        Rb2t, Rbpt, Rp2t = rowd(sld(Rb2)), rowd(sld(Rbp)), rowd(sld(Rp2))
        d2c, cc, qc = cold(d2), cold(c_), cold(q_)
        U1c, U2c, U3c, U4c = cold(U1), cold(U2), cold(U3), cold(U4)
        V1c, V2c = cold(V1), cold(V2)
        wv = (w_[0][:, :, None], w_[1][:, :, None])
        rv = (r_[0][:, :, None], r_[1][:, :, None])
        d3vv = (d3[0][:, :, None], d3[1][:, :, None])
        C2vv = (C2v[0][:, :, None], C2v[1][:, :, None])

        # ---- support {1,2,3}: bordered 4x4 det, compensated ----
        aa = a12
        det4 = _accumulate([
            _mul(Rb2t, U1c), _mul(Rbpt, U2c), _mul(d1t, U3c),
            _mul(Rp2t, U4c),
            _mul(aa, _add(_mul(bt, V1c), _mul(pt, V2c))),
            _mul(_mul(aa, aa), C2vv)])
        # detG3 (f32: only a RELATIVE error on the divisor)
        af = _val(aa)
        d1tf, btf, ptf = _val(d1t), _val(bt), _val(pt)
        d2cf, ccf, qcf = _val(d2c), _val(cc), _val(qc)
        d3vf = _val(d3vv)
        detG3 = (-af * af * d3vf + 2 * af * btf * ccf
                 + d1tf * (d2cf * d3vf - ccf * ccf)
                 - btf * btf * d2cf)
        ok3 = detG3 > _TOL * d1tf * d2cf * d3vf
        res123 = jnp.where(ok3, det4 / jnp.where(ok3, detG3, 1.0), jnp.inf)

        # full-support feasibility: Cramer numerator signs (f32)
        D1 = (ptf * (d2cf * _val(d3vv) - ccf * ccf)
              - qcf * (af * _val(d3vv) - ccf * btf)
              + rf * (af * ccf - d2cf * btf))
        D2 = (-ptf * (af * _val(d3vv) - ccf * btf)
              + qcf * (d1tf * _val(d3vv) - btf * btf)
              - rf * (d1tf * ccf - af * btf))
        D3 = (ptf * (af * ccf - btf * d2cf)
              - qcf * (d1tf * ccf - btf * af)
              + rf * (d1tf * d2cf - af * af))
        full = (D1 >= -_TOL) & (D2 >= -_TOL) & (D3 >= -_TOL)

        # ---- support {1,2}: bordered 3x3 det, compensated ----
        num12 = _accumulate([
            _mul(d1t, _add(_mul(d2c, wv), _neg(_mul(qc, qc)))),
            _neg(_mul(Rp2t, d2c)),
            _scale(_mul(aa, _mul(pt, qc)), 2.0),
            _neg(_mul(_mul(aa, aa), wv))])
        det12 = d1tf * d2cf - af * af
        res12 = num12 / det12
        w1D_12 = d2cf * ptf - af * qcf
        w2D_12 = d1tf * qcf - af * ptf
        res1_t = sl(res1_row)[:, :, None]
        res12, _ = _two_var_cases(res12, w1D_12, w2D_12, ptf, qcf,
                                  res1_t, res2_col[:, None, :],
                                  wf)

        # fallback chain (reference priority: 12, then 13, then 23)
        res13_t = sl(res13_row)[:, :, None]
        fb = res12
        fb = jnp.where(jnp.broadcast_to(res13_t, fb.shape) < fb,
                       jnp.broadcast_to(res13_t, fb.shape), fb)
        r23c = jnp.broadcast_to(res23_col[:, None, :], fb.shape)
        fb = jnp.where(r23c < fb, r23c, fb)

        res = jnp.where(full, _sanit(res123), fb)
        i1 = st + lax.broadcasted_iota(jnp.int32, (tile, N2), 0)
        res = jnp.where((i1 < N1)[None], res, jnp.inf)
        gflat = jnp.broadcast_to(
            (i1 * N2 + lax.broadcasted_iota(jnp.int32, (tile, N2),
                                            1)).reshape(1, -1),
            (B, tile * N2))
        vals, flats = carry
        tv, tf = mfn._tile_topm(res.reshape(B, -1), gflat, M)
        return mfn._merge_topm(vals, flats, tv, tf, M), None

    init = (jnp.full((B, M), jnp.inf, jnp.float32),
            jnp.zeros((B, M), jnp.int32))
    (vals, flats), _ = lax.scan(body, init, jnp.arange(n_tiles))
    cand = jnp.stack([flats // N2, flats % N2], axis=2).astype(jnp.int32)
    return cand, vals, yn * yn


@partial(jax.jit, static_argnames=("M", "tile"))
def df2_candidates(A1, A2, y, M=8, tile=256):
    """Top-M candidates for [N1, N2] with double-float selection.

    Same machinery as df3_candidates restricted to supports {1}, {2},
    {1,2} and the empty support (reference mf_utils.py:329-380 case
    analysis). Returns (cand (B, M, 2) int32, res (B, M), y_sq (B,))."""
    B, S, N1 = A1.shape
    N2 = A2.shape[2]
    A1p, _ = mfn._pad_cols(A1, tile)
    A1h, _an1 = mfn._normalize_block(A1p)
    A2h, _an2 = mfn._normalize_block(A2)
    yh, yn, _ys = mfn._normalize_y(y)
    tile = min(tile, A1h.shape[2])
    N1p = A1h.shape[2]
    n_tiles = N1p // tile

    qA1 = quantize2(A1h)
    qA2 = quantize2(A2h)
    qy = quantize2(yh)
    vec = "bsn,bs->bn"
    diag = "bsn,bsn->bn"
    d1 = df_gram(qA1, qA1, diag)
    d2 = df_gram(qA2, qA2, diag)
    p_ = df_gram(qA1, qy, vec)
    q_ = df_gram(qA2, qy, vec)
    w_ = df_gram(qy, qy, "bs,bs->b")
    w_ = (w_[0][:, None], w_[1][:, None])

    Rp2 = _mul(p_, p_)
    res1_row = _val(_add(_mul(d1, w_), _neg(Rp2))) / _val(d1)
    Cq2 = _mul(q_, q_)
    res2_col = _val(_add(_mul(d2, w_), _neg(Cq2))) / _val(d2)
    d2w_q2 = _add(_mul(d2, w_), _neg(Cq2))
    wf = _val(w_)[:, :, None]

    def rowd(x):
        return (x[0][:, :, None], x[1][:, :, None])

    def cold(x):
        return (x[0][:, None, :], x[1][:, None, :])

    def body(carry, t):
        st = t * tile
        sl = lambda v: lax.dynamic_slice(v, (0, st), (B, tile))
        sld = lambda v: (sl(v[0]), sl(v[1]))
        qa1_t = tuple(lax.dynamic_slice(x, (0, 0, st), (B, S, tile))
                      for x in qA1)
        aa = df_gram_tile(qa1_t, qA2, N2)
        d1t, pt = rowd(sld(d1)), rowd(sld(p_))
        Rp2t = rowd(sld(Rp2))
        d2c, qc = cold(d2), cold(q_)
        wv = (w_[0][:, :, None], w_[1][:, :, None])
        num12 = _accumulate([
            _mul(d1t, _add(_mul(d2c, wv), _neg(_mul(qc, qc)))),
            _neg(_mul(Rp2t, d2c)),
            _scale(_mul(aa, _mul(pt, qc)), 2.0),
            _neg(_mul(_mul(aa, aa), wv))])
        af = _val(aa)
        d1tf, ptf = _val(d1t), _val(pt)
        d2cf, qcf = _val(d2c), _val(qc)
        det12 = d1tf * d2cf - af * af
        res12 = num12 / det12
        w1D = d2cf * ptf - af * qcf
        w2D = d1tf * qcf - af * ptf
        res1_t = sl(res1_row)[:, :, None]
        res, _ = _two_var_cases(res12, w1D, w2D, ptf, qcf,
                                res1_t, res2_col[:, None, :], wf)
        i1 = st.astype(jnp.int32) + lax.broadcasted_iota(
            jnp.int32, (tile, N2), 0)
        res = jnp.where((i1 < N1)[None], res, jnp.inf)
        gflat = jnp.broadcast_to(
            (i1 * N2 + lax.broadcasted_iota(jnp.int32, (tile, N2),
                                            1)).reshape(1, -1),
            (B, tile * N2))
        vals, flats = carry
        tv, tf = mfn._tile_topm(res.reshape(B, -1), gflat, M)
        return mfn._merge_topm(vals, flats, tv, tf, M), None

    init = (jnp.full((B, M), jnp.inf, jnp.float32),
            jnp.zeros((B, M), jnp.int32))
    (vals, flats), _ = lax.scan(body, init, jnp.arange(n_tiles))
    cand = jnp.stack([flats // N2, flats % N2], axis=2).astype(jnp.int32)
    return cand, vals, yn * yn


def _sanit(x):
    return jnp.where(jnp.isnan(x), jnp.inf, x)


# ---------------------------------------------------------------------------
# 4-block configuration (2 fascicles + CSF + EAR), compensated
# ---------------------------------------------------------------------------
#
# Unlike the K<=3 scans (which reproduce the reference Numba kernels'
# fallback-chain semantics), the reference solves the 4-block problem with
# scipy.optimize.nnls per combination (mf_utils.py:612-657), so the device
# scan uses the clean support-enumeration identity: NNLS(res) = min over
# non-empty supports S of the unconstrained LS residual on S restricted to
# all-nonnegative solutions. Residual VALUES are compensated bordered
# determinants over double-float Gram entries; feasibility BOOLEANS (the
# unconstrained weights' signs) are plain f32.

def _dfm(*dfs):
    out = dfs[0]
    for d in dfs[1:]:
        out = _mul(out, d)
    return out


def _sub1_df(d, p, w):
    """Support {a}: res = (d*w - p^2)/d, feasible iff p >= 0."""
    num = _val(_add(_mul(d, w), _neg(_mul(p, p))))
    res = num / _val(d)
    return jnp.where(_val(p) >= 0, res, jnp.inf)


def _sub2_df(dA, dB, g, pA, pB, w):
    """Support {a, b}: bordered 3x3 det / det2, unconstrained-sign feas."""
    det2 = _val(_add(_mul(dA, dB), _neg(_mul(g, g))))
    num = _accumulate([
        _dfm(dA, dB, w), _neg(_dfm(g, g, w)),
        _scale(_dfm(g, pA, pB), 2.0),
        _neg(_dfm(dA, pB, pB)), _neg(_dfm(dB, pA, pA))])
    n1 = _val(dB) * _val(pA) - _val(g) * _val(pB)
    n2 = _val(dA) * _val(pB) - _val(g) * _val(pA)
    feas = (det2 > _TOL * _val(dA) * _val(dB)) & (n1 >= 0) & (n2 >= 0)
    return jnp.where(feas, num / jnp.where(feas, det2, 1.0), jnp.inf)


def _sub3_df(dA, dB, dC, gAB, gAC, gBC, pA, pB, pC, w):
    """Support {a, b, c}: bordered 4x4 det / det3 via the quadratic-in-gAB
    expansion (reusing the df3 coefficient structure), unconstrained-sign
    feasibility in f32."""
    # C0 + C1*gAB + C2*gAB^2 with (row=(dA,gAC,pA), col=(dB,gBC,pB),
    # voxel=(dC,pC,w)) — same polynomial as df3_candidates
    U1 = _add(_mul(pB, pB), _neg(_mul(dB, w)))
    U2 = _scale(_add(_mul(dB, pC), _neg(_mul(gBC, pB))), 2.0)
    U3 = _add(_mul(dB, _add(_mul(dC, w), _neg(_mul(pC, pC)))),
              _neg(_mul(dC, _mul(pB, pB))),
              _scale(_dfm(gBC, pB, pC), 2.0),
              _neg(_mul(_mul(gBC, gBC), w)))
    U4 = _add(_mul(gBC, gBC), _neg(_mul(dB, dC)))
    V1 = _scale(_add(_mul(gBC, w), _neg(_mul(pB, pC))), 2.0)
    V2 = _scale(_add(_mul(dC, pB), _neg(_mul(gBC, pC))), 2.0)
    C2 = _add(_mul(pC, pC), _neg(_mul(dC, w)))
    det4 = _accumulate([
        _dfm(gAC, gAC, U1), _dfm(gAC, pA, U2), _mul(dA, U3),
        _dfm(pA, pA, U4),
        _mul(gAB, _add(_mul(gAC, V1), _mul(pA, V2))),
        _mul(_mul(gAB, gAB), C2)])
    af, bf, cf = _val(gAB), _val(gAC), _val(gBC)
    dAf, dBf, dCf = _val(dA), _val(dB), _val(dC)
    pAf, pBf, pCf = _val(pA), _val(pB), _val(pC)
    det3 = (dAf * (dBf * dCf - cf * cf) - af * (af * dCf - cf * bf)
            + bf * (af * cf - dBf * bf))
    D1 = (pAf * (dBf * dCf - cf * cf) - pBf * (af * dCf - cf * bf)
          + pCf * (af * cf - dBf * bf))
    D2 = (-pAf * (af * dCf - bf * cf) + pBf * (dAf * dCf - bf * bf)
          - pCf * (dAf * cf - af * bf))
    D3 = (pAf * (af * cf - bf * dBf) - pBf * (dAf * cf - bf * af)
          + pCf * (dAf * dBf - af * af))
    feas = ((det3 > _TOL * dAf * dBf * dCf)
            & (D1 >= 0) & (D2 >= 0) & (D3 >= 0))
    return jnp.where(feas, det4 / jnp.where(feas, det3, 1.0), jnp.inf)


def _df_div(x, y):
    """Double-float division (one Newton correction)."""
    q0 = x[0] / y[0]
    # r = x - q0*y, evaluated exactly-ish
    p, e = df32.two_prod(q0, y[0])
    r_hi = (x[0] - p) - e + x[1] - q0 * y[1]
    q1 = r_hi / y[0]
    return df32.fast_two_sum(q0, q1)


@partial(jax.jit, static_argnames=("M", "tile"))
def df4_candidates(A1, A2, a3, a4, y, M=8, tile=256):
    """Top-M candidates for [N1, N2, N3, N4] (2 fascicles + CSF + EAR)
    with double-float selection.

    The small trailing blocks (N3 * N4 sweeps, typically 1 x 10) are
    eliminated per sweep by a double-float Schur reduction at the per-row /
    per-column level (vectorized over all sweeps at once); the per-point
    grid work runs as a lax.scan over sweeps whose body evaluates one
    reduced bordered 3x3 determinant ({1,2,3,4}) and one quadratic-in-g12
    bordered 4x4 ({1,2,4}); supports not containing both grid variables are
    hoisted. Candidate rank follows itertools.product order
    ((i1, i2, i3, i4) lexicographic, reference mf_utils.py:637).
    Returns (cand (B, M, 4) int32, res (B, M) normalized residuals,
    y_sq (B,) raw)."""
    B, S, N1 = A1.shape
    N2, N3, N4 = A2.shape[2], a3.shape[2], a4.shape[2]
    NS = N3 * N4
    A1p, _ = mfn._pad_cols(A1, tile)
    A1h, _ = mfn._normalize_block(A1p)
    A2h, _ = mfn._normalize_block(A2)
    A3h, _ = mfn._normalize_block(a3)
    A4h, _ = mfn._normalize_block(a4)
    yh, yn, _ys = mfn._normalize_y(y)
    tile = min(tile, A1h.shape[2])
    N1p = A1h.shape[2]
    n_tiles = N1p // tile

    qA1 = quantize2(A1h)
    qA2 = quantize2(A2h)
    qA3 = quantize2(A3h)
    qA4 = quantize2(A4h)
    qy = quantize2(yh)

    diag = "bsn,bsn->bn"
    vec = "bsn,bs->bn"
    cross = "bsn,bsm->bnm"
    d1 = df_gram(qA1, qA1, diag)                  # (B, N1p)
    d2 = df_gram(qA2, qA2, diag)
    d3 = df_gram(qA3, qA3, diag)                  # (B, N3)
    d4 = df_gram(qA4, qA4, diag)                  # (B, N4)
    p_ = df_gram(qA1, qy, vec)
    q_ = df_gram(qA2, qy, vec)
    r3 = df_gram(qA3, qy, vec)                    # (B, N3)
    r4 = df_gram(qA4, qy, vec)                    # (B, N4)
    b3 = df_gram(qA1, qA3, cross)                 # (B, N1p, N3)
    b4 = df_gram(qA1, qA4, cross)                 # (B, N1p, N4)
    c3 = df_gram(qA2, qA3, cross)                 # (B, N2, N3)
    c4 = df_gram(qA2, qA4, cross)                 # (B, N2, N4)
    g34 = df_gram(qA3, qA4, cross)                # (B, N3, N4)
    w_ = df_gram(qy, qy, "bs,bs->b")
    w_ = (w_[0][:, None], w_[1][:, None])

    # ---- Schur pieces for ALL sweeps at once, axes (B, ., N3, N4) ----
    ax = lambda x, sh: (x[0].reshape(sh), x[1].reshape(sh))
    d3e = ax(d3, (B, 1, N3, 1))
    d4e = ax(d4, (B, 1, 1, N4))
    r3e = ax(r3, (B, 1, N3, 1))
    r4e = ax(r4, (B, 1, 1, N4))
    ge = ax(g34, (B, 1, N3, N4))
    w4 = ax(w_, (B, 1, 1, 1))
    det_f = _add(_mul(d3e, d4e), _neg(_mul(ge, ge)))
    u3 = _df_div(_add(_mul(d4e, r3e), _neg(_mul(ge, r4e))), det_f)
    u4 = _df_div(_add(_mul(d3e, r4e), _neg(_mul(ge, r3e))), det_f)
    w_hat = _add(w4, _neg(_mul(r3e, u3)), _neg(_mul(r4e, u4)))
    detf_ok = _val(det_f) > _TOL * _val(d3e) * _val(d4e)   # (B,1,N3,N4)

    def schur_side(dX, pX, gX3, gX4):
        tX3 = _df_div(_add(_mul(d4e, gX3), _neg(_mul(ge, gX4))), det_f)
        tX4 = _df_div(_add(_mul(d3e, gX4), _neg(_mul(ge, gX3))), det_f)
        g_hat = _add(dX, _neg(_mul(gX3, tX3)), _neg(_mul(gX4, tX4)))
        b_hat = _add(pX, _neg(_mul(gX3, u3)), _neg(_mul(gX4, u4)))
        return tX3, tX4, g_hat, b_hat

    d1e = ax(d1, (B, N1p, 1, 1))
    p1e = ax(p_, (B, N1p, 1, 1))
    b3e = ax(b3, (B, N1p, N3, 1))
    b4e = (b4[0][:, :, None, :], b4[1][:, :, None, :])
    d2e = ax(d2, (B, N2, 1, 1))
    q2e = ax(q_, (B, N2, 1, 1))
    c3e = ax(c3, (B, N2, N3, 1))
    c4e = (c4[0][:, :, None, :], c4[1][:, :, None, :])
    t13, t14, g11h, b1h = schur_side(d1e, p1e, b3e, b4e)  # (B,N1p,N3,N4)
    t23, t24, g22h, b2h = schur_side(d2e, q2e, c3e, c4e)  # (B,N2,N3,N4)

    # hoisted supports not containing both grid variables
    r_fix = jnp.minimum(_sub1_df(d3e, r3e, w4), _sub1_df(d4e, r4e, w4))
    r_fix = jnp.minimum(r_fix, _sub2_df(d3e, d4e, ge, r3e, r4e, w4))
    r_row = jnp.minimum(_sub2_df(d1e, d3e, b3e, p1e, r3e, w4),
                        _sub2_df(d1e, d4e, b4e, p1e, r4e, w4))
    r_row = jnp.minimum(r_row, _sub3_df(
        d1e, d3e, d4e, b3e, b4e, ge, p1e, r3e, r4e, w4))
    r_col = jnp.minimum(_sub2_df(d2e, d3e, c3e, q2e, r3e, w4),
                        _sub2_df(d2e, d4e, c4e, q2e, r4e, w4))
    r_col = jnp.minimum(r_col, _sub3_df(
        d2e, d3e, d4e, c3e, c4e, ge, q2e, r3e, r4e, w4))
    res1_row = _sub1_df(d1, p_, w_)                        # (B, N1p)
    res2_col = _sub1_df(d2, q_, w_)                        # (B, N2)

    # stack per-sweep data with a leading NS axis for the in-body scan
    def sweep_first(x, inner):
        # (B, inner, N3, N4) -> (NS, B, inner)
        return jnp.moveaxis(x.reshape(B, inner, NS), 2, 0)

    def sweep_df(x, inner):
        return (sweep_first(x[0], inner), sweep_first(x[1], inner))

    xs_sweep = dict(
        t13=sweep_df(t13, N1p), t14=sweep_df(t14, N1p),
        g11h=sweep_df(g11h, N1p), b1h=sweep_df(b1h, N1p),
        t23=sweep_df(t23, N2), t24=sweep_df(t24, N2),
        g22h=sweep_df(g22h, N2), b2h=sweep_df(b2h, N2),
        u3=sweep_df(u3, 1), u4=sweep_df(u4, 1),
        w_hat=sweep_df(w_hat, 1), detf_ok=sweep_first(detf_ok, 1),
        r_row=sweep_first(r_row, N1p), r_col=sweep_first(r_col, N2),
        r_fix=sweep_first(r_fix, 1),
        d4s=sweep_df((jnp.broadcast_to(d4e[0], (B, 1, N3, N4)),
                      jnp.broadcast_to(d4e[1], (B, 1, N3, N4))), 1),
        r4s=sweep_df((jnp.broadcast_to(r4e[0], (B, 1, N3, N4)),
                      jnp.broadcast_to(r4e[1], (B, 1, N3, N4))), 1),
        b4s=sweep_df((jnp.broadcast_to(b4e[0], (B, N1p, N3, N4)),
                      jnp.broadcast_to(b4e[1], (B, N1p, N3, N4))), N1p),
        c4s=sweep_df((jnp.broadcast_to(c4e[0], (B, N2, N3, N4)),
                      jnp.broadcast_to(c4e[1], (B, N2, N3, N4))), N2),
        s_idx=jnp.arange(NS, dtype=jnp.int32),
    )

    def rowd(x, sl):
        return (sl(x[0])[:, :, None], sl(x[1])[:, :, None])

    def cold(x):
        return (x[0][:, None, :], x[1][:, None, :])

    def body(carry, t):
        st = t * tile
        sl = lambda v: lax.dynamic_slice(v, (0, st), (B, tile))
        qa1_t = tuple(lax.dynamic_slice(x, (0, 0, st), (B, S, tile))
                      for x in qA1)
        aa = df_gram_tile(qa1_t, qA2, N2)          # g12 (B, tile, N2) df

        d1t, pt = rowd(d1, sl), rowd(p_, sl)
        d2c, qc = cold(d2), cold(q_)
        wv = (w_[0][:, :, None], w_[1][:, :, None])

        # sweep-independent supports
        r12 = _sub2_point(aa, d1t, d2c, pt, qc, wv)
        base = jnp.minimum(r12, sl(res1_row)[:, :, None])
        base = jnp.minimum(base, res2_col[:, None, :])
        base = jnp.minimum(base, _val(wv))
        # {1,2,3} per i3 (N3 is tiny and static; almost always 1)
        r123_all = []
        for i3 in range(N3):
            ev3 = lambda x: (x[0][:, i3][:, None, None],
                             x[1][:, i3][:, None, None])
            b3t = rowd((b3[0][:, :, i3], b3[1][:, :, i3]), sl)
            c3c = cold((c3[0][:, :, i3], c3[1][:, :, i3]))
            r123_all.append(_sanit(_sub3_point(
                aa, d1t, d2c, ev3(d3), b3t, c3c, pt, qc, ev3(r3), wv)))
        r123_st = jnp.stack(r123_all, axis=0)      # (N3, B, tile, N2)

        best = jnp.full((B, tile, N2), jnp.inf, jnp.float32)
        best_s = jnp.zeros((B, tile, N2), jnp.int32)

        def sweep_eval(carry_s, sw):
            best, best_s = carry_s
            tsl = lambda x: (sl(x[0])[:, :, None], sl(x[1])[:, :, None])
            csl = lambda x: (x[0][:, None, :], x[1][:, None, :])
            esl = lambda x: (x[0][:, :, None], x[1][:, :, None])
            t13s, t14s = tsl(sw["t13"]), tsl(sw["t14"])
            g11s, b1s = tsl(sw["g11h"]), tsl(sw["b1h"])
            t23s, t24s = csl(sw["t23"]), csl(sw["t24"])
            g22s, b2s = csl(sw["g22h"]), csl(sw["b2h"])
            w_hs = esl(sw["w_hat"])
            # support {1,2,4}
            r124 = _sub3_point(aa, d1t, d2c, esl(sw["d4s"]),
                               tsl(sw["b4s"]), csl(sw["c4s"]),
                               pt, qc, esl(sw["r4s"]), wv)

            i3 = sw["s_idx"] // N4
            c3_sw = (jnp.take(c3[0], i3, axis=2),
                     jnp.take(c3[1], i3, axis=2))         # (B, N2)
            g12h = _add(aa, _neg(_mul(t13s, csl(c3_sw))),
                        _neg(_mul(t14s, csl(sw["c4s"]))))
            num = _accumulate([
                _dfm(g11s, g22s, w_hs), _neg(_dfm(g12h, g12h, w_hs)),
                _scale(_dfm(g12h, b1s, b2s), 2.0),
                _neg(_dfm(g11s, b2s, b2s)), _neg(_dfm(g22s, b1s, b1s))])
            g11f, g22f, g12f = _val(g11s), _val(g22s), _val(g12h)
            b1f, b2f = _val(b1s), _val(b2s)
            det2 = g11f * g22f - g12f * g12f
            n1 = b1f * g22f - b2f * g12f
            n2 = b2f * g11f - b1f * g12f
            safe = jnp.where(det2 != 0, det2, 1.0)
            w1f, w2f = n1 / safe, n2 / safe
            w3f = (_val(esl(sw["u3"])) - w1f * _val(t13s)
                   - w2f * _val(t23s))
            w4f = (_val(esl(sw["u4"])) - w1f * _val(t14s)
                   - w2f * _val(t24s))
            feas = (sw["detf_ok"][:, :, None] & (g11f > 0)
                    & (det2 > _TOL * g11f * g22f) & (n1 >= 0) & (n2 >= 0)
                    & (w3f >= 0) & (w4f >= 0))
            r1234 = jnp.where(feas, num / jnp.where(feas, det2, 1.0),
                              jnp.inf)

            res_s = jnp.minimum(base, jnp.take(r123_st, i3, axis=0))
            res_s = jnp.minimum(res_s, _sanit(r124))
            res_s = jnp.minimum(res_s, _sanit(r1234))
            res_s = jnp.minimum(res_s, sl(sw["r_row"])[:, :, None])
            res_s = jnp.minimum(res_s, sw["r_col"][:, None, :])
            res_s = jnp.minimum(res_s, sw["r_fix"][:, :, None])
            res_s = _sanit(res_s)
            upd = res_s < best
            return ((jnp.where(upd, res_s, best),
                     jnp.where(upd, sw["s_idx"], best_s)), None)

        (best, best_s), _ = lax.scan(sweep_eval, (best, best_s), xs_sweep)

        i1 = (st.astype(jnp.int32)
              + lax.broadcasted_iota(jnp.int32, (tile, N2), 0))
        i2 = lax.broadcasted_iota(jnp.int32, (tile, N2), 1)
        best = jnp.where((i1 < N1)[None], best, jnp.inf)
        flat = ((i1 * N2 + i2)[None] * NS + best_s).astype(jnp.int32)
        vals, flats = carry
        tv, tf = mfn._tile_topm(best.reshape(B, -1),
                                flat.reshape(B, -1), M)
        return mfn._merge_topm(vals, flats, tv, tf, M), None

    init = (jnp.full((B, M), jnp.inf, jnp.float32),
            jnp.zeros((B, M), jnp.int32))
    (vals, flats), _ = lax.scan(body, init, jnp.arange(n_tiles))
    s = flats % NS
    pt_ = flats // NS
    cand = jnp.stack([pt_ // N2, pt_ % N2, s // N4, s % N4],
                     axis=2).astype(jnp.int32)
    return cand, vals, yn * yn


def _sub2_point(aa, d1t, d2c, pt, qc, wv):
    """Per-point support {1,2}: compensated bordered 3x3 / det2 with
    unconstrained-sign feasibility."""
    num = _accumulate([
        _dfm(d1t, d2c, wv), _neg(_dfm(aa, aa, wv)),
        _scale(_dfm(aa, pt, qc), 2.0),
        _neg(_dfm(d1t, qc, qc)), _neg(_dfm(d2c, pt, pt))])
    af, d1f, d2f = _val(aa), _val(d1t), _val(d2c)
    pf, qf = _val(pt), _val(qc)
    det2 = d1f * d2f - af * af
    n1 = d2f * pf - af * qf
    n2 = d1f * qf - af * pf
    feas = (det2 > _TOL * d1f * d2f) & (n1 >= 0) & (n2 >= 0)
    return jnp.where(feas, num / jnp.where(feas, det2, 1.0), jnp.inf)


def _sub3_point(aa, d1t, d2c, dCe, bt, cc, pt, qc, rCe, wv):
    """Per-point support {1,2,C}: the quadratic-in-g12 compensated
    bordered 4x4 / det3 (C the fixed third column of this sweep)."""
    U1 = _add(_mul(qc, qc), _neg(_mul(d2c, wv)))
    U2 = _scale(_add(_mul(d2c, rCe), _neg(_mul(cc, qc))), 2.0)
    U3 = _add(_mul(d2c, _add(_mul(dCe, wv), _neg(_mul(rCe, rCe)))),
              _neg(_mul(dCe, _mul(qc, qc))),
              _scale(_dfm(cc, qc, rCe), 2.0),
              _neg(_mul(_mul(cc, cc), wv)))
    U4 = _add(_mul(cc, cc), _neg(_mul(d2c, dCe)))
    V1 = _scale(_add(_mul(cc, wv), _neg(_mul(qc, rCe))), 2.0)
    V2 = _scale(_add(_mul(dCe, qc), _neg(_mul(cc, rCe))), 2.0)
    C2 = _add(_mul(rCe, rCe), _neg(_mul(dCe, wv)))
    det4 = _accumulate([
        _dfm(bt, bt, U1), _dfm(bt, pt, U2), _mul(d1t, U3),
        _dfm(pt, pt, U4),
        _mul(aa, _add(_mul(bt, V1), _mul(pt, V2))),
        _mul(_mul(aa, aa), C2)])
    af, bf, cf = _val(aa), _val(bt), _val(cc)
    d1f, d2f, dCf = _val(d1t), _val(d2c), _val(dCe)
    pf, qf, rCf = _val(pt), _val(qc), _val(rCe)
    det3 = (d1f * (d2f * dCf - cf * cf) - af * (af * dCf - cf * bf)
            + bf * (af * cf - d2f * bf))
    D1 = (pf * (d2f * dCf - cf * cf) - qf * (af * dCf - cf * bf)
          + rCf * (af * cf - d2f * bf))
    D2 = (-pf * (af * dCf - bf * cf) + qf * (d1f * dCf - bf * bf)
          - rCf * (d1f * cf - af * bf))
    D3 = (pf * (af * cf - bf * d2f) - qf * (d1f * cf - bf * af)
          + rCf * (d1f * d2f - af * af))
    feas = ((det3 > _TOL * d1f * d2f * dCf)
            & (D1 >= 0) & (D2 >= 0) & (D3 >= 0))
    return jnp.where(feas, det4 / jnp.where(feas, det3, 1.0), jnp.inf)


def _two_var_cases(res_full, w1D, w2D, Y1, Y2, res1, res2, y_sq):
    """Reference 2-variable NNLS case selection with externally-supplied
    (compensated) residual VALUES (decision booleans in f32; cf.
    ops/nnls.lsqnonneg_2var). All args broadcastable."""
    case1 = (w1D > 0) & (w2D > 0)
    case2 = ~case1 & (w1D >= 0) & (w2D <= 0)
    case3 = ~case1 & ~case2 & (w1D <= 0) & (w2D >= 0)
    case4 = ~case1 & ~case2 & ~case3 & (w1D < 0) & (w2D < 0)
    take1 = (case2 & (Y1 >= 0)) | (case4 & (Y1 > 0))
    take2 = (case3 & (Y2 >= 0)) | (case4 & (Y1 <= 0) & (Y2 > 0))
    res = jnp.where(case1, _sanit(res_full),
                    jnp.where(take1, res1,
                              jnp.where(take2, res2, y_sq)))
    return res, case1
