"""Pallas TPU kernel: fused Gram + exhaustive candidate scan.

The XLA implementation (ops/nnls.py) materializes each cross-Gram tile and
every elementwise intermediate of the closed-form NNLS logic in HBM between
fused regions; at 782x782 candidates that is ~10 HBM round-trips of
~150 MB per voxel batch. This kernel keeps everything in VMEM:

    grid (voxel, atom-tile):
        G_tile = A1_tile^T @ A2           (MXU, f32 HIGHEST)
        res    = closed-form 2/3-var NNLS (VPU, branchless, in registers)
        out    = per-row (i1) minimum residual + arg-i2

Per-row minima are the natural reduction output: the top-1 / top-M selection
over ~800 rows then happens in plain XLA where it is free, and the float64
re-scorer (models/refine.py) consumes the best-M rows.

Supports the fit configurations with a size-1 third block (2 fascicles +
CSF — the flagship workload, dicsizes [N, N, 1]) and the plain 2-block case.
Atom columns and the signal are normalized internally (unit Gram diagonals),
as in ops/nnls.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import nnls as mfn

from .. import config as _config

_TILE_M = _config.DEFAULTS["solver"].tile_n1 * 2  # 256: MXU-friendly
_LANE = 128


def _round_up(x, m):
    return int(math.ceil(x / m) * m)


_SEGMENTS = _config.DEFAULTS["solver"].segments  # per-row i2 segments


def _row_min_argmin(res, n2):
    """Per-(row, segment) min + first-arg-min with padded-lane masking
    (no argmin primitive: min over an index ladder; exact ties resolve to
    the lowest column). Splitting the i2 axis into Q segments lets the
    float64 refinement see same-row runner-up candidates.
    Returns ((Tm, Q) minima, (Tm, Q) arg columns)."""
    Tm, N2p = res.shape
    seg = N2p // _SEGMENTS
    col = lax.broadcasted_iota(jnp.int32, (Tm, N2p), 1)
    res = jnp.where(col < n2, res, jnp.inf)
    mins = []
    idxs = []
    for q in range(_SEGMENTS):
        inseg = (col >= q * seg) & (col < (q + 1) * seg)
        r_q = jnp.where(inseg, res, jnp.inf)
        rmin = jnp.min(r_q, axis=1, keepdims=True)
        idx = jnp.min(jnp.where(r_q == rmin, col, N2p), axis=1)
        # fully-padded segments: rmin=+inf matches every padded lane and the
        # arg lands on a padded column; pin it to 0 so downstream gathers
        # (float64 refine, native kernel) never see an out-of-range atom id
        idx = jnp.where(jnp.isfinite(rmin[:, 0]), idx, 0)
        mins.append(rmin[:, 0])
        idxs.append(idx.astype(jnp.int32))
    return jnp.stack(mins, axis=1), jnp.stack(idxs, axis=1)


def _kernel_2(a1_ref, a2_ref, y1_ref, y2_ref, res_ref, idx_ref, *, n2, tile):
    t = pl.program_id(1)
    st = pl.multiple_of(t * tile, tile)
    A1t = a1_ref[0, :, pl.ds(st, tile)]   # (S, Tm)
    A2 = a2_ref[0]                        # (S, N2p)
    G12 = lax.dot_general(A1t, A2, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32,
                          precision=lax.Precision.HIGHEST)  # (Tm, N2p)
    Y1 = y1_ref[0, 0, pl.ds(st, tile)]    # (Tm,)
    Y2 = y2_ref[0, 0]                     # (N2p,)
    one = jnp.float32(1.0)
    _w1, _w2, res = mfn.lsqnonneg_2var(one, one, G12, one,
                                       Y1[:, None], Y2[None, :])
    rmin, idx = _row_min_argmin(res, n2)
    res_ref[0, :, pl.ds(st, tile)] = rmin.T
    idx_ref[0, :, pl.ds(st, tile)] = idx.T


def _kernel_3(a1_ref, a2_ref, y1_ref, y2_ref, a13_ref, a23_ref, y3_ref,
              res_ref, idx_ref, *, n2, tile):
    t = pl.program_id(1)
    st = pl.multiple_of(t * tile, tile)
    A1t = a1_ref[0, :, pl.ds(st, tile)]
    A2 = a2_ref[0]
    G12 = lax.dot_general(A1t, A2, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32,
                          precision=lax.Precision.HIGHEST)
    Y1 = y1_ref[0, 0, pl.ds(st, tile)]
    Y2 = y2_ref[0, 0]
    A13 = a13_ref[0, 0, pl.ds(st, tile)]
    A23 = a23_ref[0, 0]
    Y3 = y3_ref[0, 0, 0]
    one = jnp.float32(1.0)
    _w1, _w2, _w3, res = mfn.lsqnonneg_3var(
        one, one, one, one,
        G12, A13[:, None], A23[None, :],
        Y1[:, None], Y2[None, :], Y3)
    rmin, idx = _row_min_argmin(res, n2)
    res_ref[0, :, pl.ds(st, tile)] = rmin.T
    idx_ref[0, :, pl.ds(st, tile)] = idx.T


def _full_vec_spec(Np):
    return pl.BlockSpec((1, 1, Np), lambda b, t: (b, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def row_scan_2(A1, A2, y, interpret=False, tile=_TILE_M):
    """Per-row (i1) best candidate for the 2-block case via the fused kernel.

    Returns (row_res (B, N1p), row_i2 (B, N1p), y_sq (B,), yn_safe (B,),
    an1 (B, N1p), an2 (B, N2)); padded rows carry +inf.
    """
    B, S, N1 = A1.shape
    N2 = A2.shape[2]
    N1p = _round_up(N1, tile)
    N2p = _round_up(N2, _LANE)
    A1h, an1 = mfn._normalize_block(jnp.pad(A1, ((0, 0), (0, 0),
                                                 (0, N1p - N1))))
    A2h, an2 = mfn._normalize_block(A2)
    yh, yn, yn_safe = mfn._normalize_y(y)
    hp = dict(preferred_element_type=jnp.float32,
              precision=lax.Precision.HIGHEST)
    Y1 = jnp.einsum("bs,bsn->bn", yh, A1h, **hp)
    Y2 = jnp.einsum("bs,bsn->bn", yh, A2h, **hp)
    A2hp = jnp.pad(A2h, ((0, 0), (0, 0), (0, N2p - N2)))
    Y2p = jnp.pad(Y2, ((0, 0), (0, N2p - N2)))

    grid = (B, N1p // tile)
    kernel = functools.partial(_kernel_2, n2=N2, tile=tile)
    row_res, row_i2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S, N1p), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, N2p), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_vec_spec(N1p),
            _full_vec_spec(N2p),
        ],
        out_specs=[
            pl.BlockSpec((1, _SEGMENTS, N1p), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SEGMENTS, N1p), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, _SEGMENTS, N1p), jnp.float32),
            jax.ShapeDtypeStruct((B, _SEGMENTS, N1p), jnp.int32),
        ],
        interpret=interpret,
    )(A1h.astype(jnp.float32), A2hp.astype(jnp.float32),
      Y1.astype(jnp.float32)[:, None, :], Y2p.astype(jnp.float32)[:, None, :])
    row = lax.broadcasted_iota(jnp.int32, (B, 1, N1p), 2)
    row_res = jnp.where(row < N1, row_res, jnp.inf)
    row_res = row_res.reshape(B, _SEGMENTS * N1p)
    row_i2 = row_i2.reshape(B, _SEGMENTS * N1p)
    return row_res, row_i2, yn * yn, yn_safe, an1, an2


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def row_scan_3(A1, A2, a3, y, interpret=False, tile=_TILE_M):
    """Per-row best candidate for [N1, N2, 1] (2 fascicles + CSF).

    a3: (B, S, 1) third block (e.g. the CSF fingerprint).
    Returns (row_res, row_i2, y_sq, yn_safe, an1, an2, an3).
    """
    B, S, N1 = A1.shape
    N2 = A2.shape[2]
    N1p = _round_up(N1, tile)
    N2p = _round_up(N2, _LANE)
    A1h, an1 = mfn._normalize_block(jnp.pad(A1, ((0, 0), (0, 0),
                                                 (0, N1p - N1))))
    A2h, an2 = mfn._normalize_block(A2)
    A3h, an3 = mfn._normalize_block(a3)
    yh, yn, yn_safe = mfn._normalize_y(y)
    hp = dict(preferred_element_type=jnp.float32,
              precision=lax.Precision.HIGHEST)
    Y1 = jnp.einsum("bs,bsn->bn", yh, A1h, **hp)
    Y2 = jnp.einsum("bs,bsn->bn", yh, A2h, **hp)
    Y3 = jnp.einsum("bs,bsn->bn", yh, A3h, **hp)          # (B, 1)
    A13 = jnp.einsum("bsn,bsm->bn", A1h, A3h, **hp)       # (B, N1p)
    A23 = jnp.einsum("bsn,bsm->bn", A2h, A3h, **hp)       # (B, N2)
    A2hp = jnp.pad(A2h, ((0, 0), (0, 0), (0, N2p - N2)))
    Y2p = jnp.pad(Y2, ((0, 0), (0, N2p - N2)))
    A23p = jnp.pad(A23, ((0, 0), (0, N2p - N2)))

    grid = (B, N1p // tile)
    kernel = functools.partial(_kernel_3, n2=N2, tile=tile)
    row_res, row_i2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S, N1p), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, N2p), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_vec_spec(N1p),
            _full_vec_spec(N2p),
            _full_vec_spec(N1p),
            _full_vec_spec(N2p),
            pl.BlockSpec((1, 1, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _SEGMENTS, N1p), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SEGMENTS, N1p), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, _SEGMENTS, N1p), jnp.float32),
            jax.ShapeDtypeStruct((B, _SEGMENTS, N1p), jnp.int32),
        ],
        interpret=interpret,
    )(A1h.astype(jnp.float32), A2hp.astype(jnp.float32),
      Y1.astype(jnp.float32)[:, None, :], Y2p.astype(jnp.float32)[:, None, :],
      A13.astype(jnp.float32)[:, None, :],
      A23p.astype(jnp.float32)[:, None, :],
      Y3.astype(jnp.float32)[:, :, None])
    row = lax.broadcasted_iota(jnp.int32, (B, 1, N1p), 2)
    row_res = jnp.where(row < N1, row_res, jnp.inf)
    row_res = row_res.reshape(B, _SEGMENTS * N1p)
    row_i2 = row_i2.reshape(B, _SEGMENTS * N1p)
    return row_res, row_i2, yn * yn, yn_safe, an1, an2, an3


def _row_min_argcode(res, code, n2):
    """Per-(row, segment) min + the code of the first minimum.

    Like _row_min_argmin but the winning lane reports an arbitrary packed
    int32 ``code`` (here i2 * NS + sweep) instead of its column; exact ties
    resolve to the LOWEST code, i.e. reference (i2, i3, i4) product order.
    """
    Tm, N2p = res.shape
    seg = N2p // _SEGMENTS
    col = lax.broadcasted_iota(jnp.int32, (Tm, N2p), 1)
    res = jnp.where(col < n2, res, jnp.inf)
    big = jnp.int32(2 ** 30)
    mins = []
    codes = []
    for q in range(_SEGMENTS):
        inseg = (col >= q * seg) & (col < (q + 1) * seg)
        r_q = jnp.where(inseg, res, jnp.inf)
        rmin = jnp.min(r_q, axis=1, keepdims=True)
        c = jnp.min(jnp.where(r_q == rmin, code, big), axis=1)
        c = jnp.where(jnp.isfinite(rmin[:, 0]), c, 0)
        mins.append(rmin[:, 0])
        codes.append(c.astype(jnp.int32))
    return jnp.stack(mins, axis=1), jnp.stack(codes, axis=1)


def _kernel_4(a1_ref, a2_ref, y1_ref, y2_ref, g13_ref, g14_ref,
              g23_ref, g24_ref, g34_ref, y3_ref, y4_ref,
              res_ref, code_ref, *, n2, n3, n4):
    # a1/y1/g13/g14 blocks are tile-sliced by the BlockSpec index maps (the
    # full N1p copies would not fit VMEM next to A2 + the sweep temporaries)
    A1t = a1_ref[0]                                          # (S, Tm)
    A2 = a2_ref[0]
    G12 = lax.dot_general(A1t, A2, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32,
                          precision=lax.Precision.HIGHEST)   # (Tm, N2p)
    Y1 = y1_ref[0, 0][:, None]
    Y2 = y2_ref[0, 0][None, :]
    tol = jnp.float32(mfn._det_tol(jnp.float32))
    best = jnp.full(G12.shape, jnp.inf, jnp.float32)
    best_s = jnp.zeros(G12.shape, jnp.int32)
    for s in range(n3 * n4):                # unrolled: n3*n4 small, static
        i3, i4 = divmod(s, n4)
        res_s = mfn._nnls4_sweep_res(
            G12, g13_ref[0, i3][:, None], g14_ref[0, i4][:, None],
            g23_ref[0, i3][None, :], g24_ref[0, i4][None, :],
            g34_ref[0, 0, s], Y1, Y2,
            y3_ref[0, 0, i3], y4_ref[0, 0, i4], tol)
        upd = res_s < best                  # strict: first (i3, i4) wins
        best = jnp.where(upd, res_s, best)
        best_s = jnp.where(upd, s, best_s)
    col = lax.broadcasted_iota(jnp.int32, G12.shape, 1)
    code = col * (n3 * n4) + best_s
    rmin, cmin = _row_min_argcode(best, code, n2)
    res_ref[0] = rmin.T
    code_ref[0] = cmin.T


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def row_scan_4(A1, A2, a3, a4, y, interpret=False, tile=_TILE_M // 2):
    """Per-row best candidate for [N1, N2, N3, N4] with small trailing
    blocks (2 fascicles + CSF + EAR) via the fused Schur-sweep kernel.

    a3: (B, S, N3) CSF block, a4: (B, S, N4) EAR block; N3 * N4 sweeps are
    unrolled inside the kernel (ops/nnls._nnls4_sweep_res). Returns
    (row_res (B, Q*N1p), row_code (B, Q*N1p)) where code = i2 * (N3*N4) +
    (i3 * N4 + i4); padded rows carry +inf.
    """
    B, S, N1 = A1.shape
    N2, N3, N4 = A2.shape[2], a3.shape[2], a4.shape[2]
    N1p = _round_up(N1, tile)
    N2p = _round_up(N2, _LANE)
    A1h, an1 = mfn._normalize_block(jnp.pad(A1, ((0, 0), (0, 0),
                                                 (0, N1p - N1))))
    A2h, an2 = mfn._normalize_block(A2)
    A3h, _ = mfn._normalize_block(a3)
    A4h, _ = mfn._normalize_block(a4)
    yh, yn, yn_safe = mfn._normalize_y(y)
    hp = dict(preferred_element_type=jnp.float32,
              precision=lax.Precision.HIGHEST)
    Y1 = jnp.einsum("bs,bsn->bn", yh, A1h, **hp)
    Y2 = jnp.einsum("bs,bsn->bn", yh, A2h, **hp)
    Y3 = jnp.einsum("bs,bsn->bn", yh, A3h, **hp)             # (B, N3)
    Y4 = jnp.einsum("bs,bsn->bn", yh, A4h, **hp)             # (B, N4)
    G13 = jnp.einsum("bsn,bsm->bmn", A1h, A3h, **hp)         # (B, N3, N1p)
    G14 = jnp.einsum("bsn,bsm->bmn", A1h, A4h, **hp)         # (B, N4, N1p)
    G23 = jnp.einsum("bsn,bsm->bmn", A2h, A3h, **hp)         # (B, N3, N2)
    G24 = jnp.einsum("bsn,bsm->bmn", A2h, A4h, **hp)         # (B, N4, N2)
    G34 = jnp.einsum("bsn,bsm->bnm", A3h, A4h, **hp)         # (B, N3, N4)
    A2hp = jnp.pad(A2h, ((0, 0), (0, 0), (0, N2p - N2)))
    Y2p = jnp.pad(Y2, ((0, 0), (0, N2p - N2)))
    G23p = jnp.pad(G23, ((0, 0), (0, 0), (0, N2p - N2)))
    G24p = jnp.pad(G24, ((0, 0), (0, 0), (0, N2p - N2)))

    def vec(x, lanes):
        return x.astype(jnp.float32).reshape(B, -1, lanes)

    grid = (B, N1p // tile)
    kernel = functools.partial(_kernel_4, n2=N2, n3=N3, n4=N4)
    tiled = lambda r: pl.BlockSpec((1, r, tile), lambda b, t: (b, 0, t),
                                   memory_space=pltpu.VMEM)
    row_res, row_code = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tiled(S),                       # A1 tile
            pl.BlockSpec((1, S, N2p), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            tiled(1),                       # Y1 tile
            _full_vec_spec(N2p),
            tiled(N3),                      # G13 tile
            tiled(N4),                      # G14 tile
            pl.BlockSpec((1, N3, N2p), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N4, N2p), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N3 * N4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _SEGMENTS, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SEGMENTS, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, _SEGMENTS, N1p), jnp.float32),
            jax.ShapeDtypeStruct((B, _SEGMENTS, N1p), jnp.int32),
        ],
        interpret=interpret,
    )(A1h.astype(jnp.float32), A2hp.astype(jnp.float32),
      vec(Y1, N1p), vec(Y2p, N2p),
      G13.astype(jnp.float32), G14.astype(jnp.float32),
      G23p.astype(jnp.float32), G24p.astype(jnp.float32),
      vec(G34.reshape(B, N3 * N4), N3 * N4), vec(Y3, N3), vec(Y4, N4))
    row = lax.broadcasted_iota(jnp.int32, (B, 1, N1p), 2)
    row_res = jnp.where(row < N1, row_res, jnp.inf)
    return (row_res.reshape(B, _SEGMENTS * N1p),
            row_code.reshape(B, _SEGMENTS * N1p),
            yn * yn, yn_safe)


def candidates_from_rows_4(row_res, row_code, M, n3, n4):
    """Top-M (row, segment) minima of row_scan_4 -> ((B, M, 4)
    [i1, i2, i3, i4] candidates, (B, M) residuals)."""
    n1p = row_res.shape[1] // _SEGMENTS
    negv, flat = lax.top_k(-row_res, M)
    i1 = flat % n1p
    code = jnp.take_along_axis(row_code, flat, axis=1)
    ns = n3 * n4
    i2 = code // ns
    s = code % ns
    cand = jnp.stack([i1, i2, s // n4, s % n4], axis=2).astype(jnp.int32)
    return cand, -negv


@functools.partial(jax.jit, static_argnames=("csf_on", "ear_on", "M"))
def rescore_direct(D, sig_csf, sig_ear, y, cand, vals, M=16,
                   csf_on=False, ear_on=False):
    """Direct-residual re-ranking of a candidate pool (device, f32).

    The algebraic residual 1 - w'b of the row scans cancels catastrophically
    below ~1e-7 * ||y||^2 in float32, so near-optimal pools are ranked by
    noise. This stage re-evaluates each pool candidate by explicitly
    reconstructing r = y - sum_i w_i a_i and summing r^2: at a least-squares
    optimum the residual is second-order insensitive to weight error, so the
    direct evaluation resolves gaps down to ~1e-10 * ||y||^2 — enough to
    put the exact winner at rank 0 for the float64 re-scorer.

    Args:
      D (B, 2, S, N) rotated fascicle blocks; sig_csf (S,), sig_ear (S, E)
        (unused unless the flag is set); y (B, S).
      cand (B, P, C) int32 pool ([i1, i2] or [i1, i2, i3, i4]);
      vals (B, P) scan residuals (only their ORDER is used for tie-breaks).
    Returns (cand (B, M, C) re-ranked, res (B, M) direct residuals,
    w (B, M, C) f32 weights).
    """
    B, P, C = cand.shape
    S = y.shape[1]
    cols = [jnp.take_along_axis(D[:, 0], cand[:, None, :, 0], axis=2),
            jnp.take_along_axis(D[:, 1], cand[:, None, :, 1], axis=2)]
    if csf_on:
        cols.append(jnp.broadcast_to(sig_csf[None, :, None], (B, S, P)))
    if ear_on:
        cols.append(jnp.take_along_axis(
            jnp.broadcast_to(sig_ear[None], (B,) + sig_ear.shape),
            cand[:, None, :, C - 1], axis=2))
    from . import polish as polish_mod
    w, res = polish_mod._nnls_direct(cols, y)
    w = jnp.stack(w, axis=2)                                 # (B, P, C)
    # re-rank by (direct residual, original pool rank): the pool arrives in
    # (scan value, reference candidate rank) order, so equal-residual ties
    # keep reference ordering
    order = jnp.lexsort((jnp.arange(P)[None, :].astype(jnp.int32)
                         * jnp.ones((B, 1), jnp.int32), res), axis=-1)
    order = order[:, :M]
    cand_out = jnp.take_along_axis(cand, order[:, :, None], axis=1)
    res_out = jnp.take_along_axis(res, order, axis=1)
    w_out = jnp.take_along_axis(w, order[:, :, None], axis=1)
    return cand_out, res_out, w_out


def candidates_from_rows(row_res, row_i2, M, segments=_SEGMENTS):
    """Top-M (row, segment) minima -> ((B, M, 2) [i1, i2] candidates,
    (B, M) residual values) (XLA, cheap). Input is the flattened
    (B, Q*N1p) per-row-per-segment minima from row_scan_{2,3} or the
    fused df scan (which may use a different segment count)."""
    n1p = row_res.shape[1] // segments
    negv, flat = lax.top_k(-row_res, M)
    i1 = flat % n1p
    i2 = jnp.take_along_axis(row_i2, flat, axis=1)
    return jnp.stack([i1, i2], axis=2).astype(jnp.int32), -negv
