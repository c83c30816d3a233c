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


def candidates_from_rows(row_res, row_i2, M):
    """Top-M (row, segment) minima -> ((B, M, 2) [i1, i2] candidates,
    (B, M) residual values) (XLA, cheap). Input is the flattened
    (B, Q*N1p) per-row-per-segment minima from row_scan_{2,3}."""
    n1p = row_res.shape[1] // _SEGMENTS
    negv, flat = lax.top_k(-row_res, M)
    i1 = flat % n1p
    i2 = jnp.take_along_axis(row_i2, flat, axis=1)
    return jnp.stack([i1, i2], axis=2).astype(jnp.int32), -negv
