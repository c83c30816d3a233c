"""Fused Pallas prep kernel for the interval row pass (ops/f32scan).

The two-pass row scan's operand preparation — column l2 normalization,
three-level int8 quantization (ops/dfscan.quantize3), the per-tile kernel
operand packs, and the exact hoist Grams (diagonal <x, x> plus <x, rhs_j>
for the signal / fixed-compartment columns) — was an XLA chain of ~15
separate passes over the 0.9 GB rotated blocks (normalize, 5 quantize
materializations, per-Gram einsum re-reads, bf16 casts, pack transposes):
measured 79 of rowmin_3's 113 ms per 512-voxel chunk, vs 34 ms for the
actual scan kernel. This kernel streams each voxel's (S, Np) block through
VMEM ONCE and emits everything:

  * q123 packs   (B, nt, S, 3T) int8  — [Q1 | Q2 | Q3] per row tile
  * xbf          (B, nt, S, T) bf16   — normalized columns (corrections)
  * rbf          (B, nt, S, T) bf16   — ~2^-24 quantization residuals
  * abf          (B, nt, S, T) bf16   — quantized part a = x - r
  * gram         (B, 16, Np) f32      — row 0: exact-rounded <x, x>;
                                        row 1+j: exact-rounded <x, rhs_j>

Gram exactness matches ops/f32scan._gram3_hi (and the scan kernel's
in-VMEM _gram_hi): int8 level products grouped by scale (int32 sums
< 2^25, so f32 casts are ~2^-55-absolute exact), combined error-free
(df32.df_from_sum) with bf16 corrections on the residuals (~0.5 eps_f32
absolute) — inside the row pass's 8 eps error radius. Normalization here
may differ from ops/nnls._normalize_block by reduction order (~1 ulp of
the column norm); the row-pass bounds only need internal consistency, and
the gathered df re-scan re-normalizes raw columns independently.

The rhs columns (normalized signal + fixed-compartment columns, at most
12) arrive pre-quantized from XLA (they are (B, S)-sized — cheap) in
128-lane-aligned level blocks so every in-kernel slice is Mosaic-legal.
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

_LANE = 128
_S1 = 2.0 ** -7
_S2 = 2.0 ** -15
_S3 = 2.0 ** -23


def _quant3(Xh):
    """Three-level int8 decomposition of normalized columns (values as
    f32 round results; exact — mirrors dfscan.quantize3)."""
    Q1 = jnp.clip(jnp.round(Xh * (1.0 / _S1)), -127, 127)
    A1 = Q1 * _S1
    R1 = Xh - A1
    Q2 = jnp.clip(jnp.round(R1 * (1.0 / _S2)), -127, 127)
    A2 = A1 + Q2 * _S2
    R2 = Xh - A2
    Q3 = jnp.clip(jnp.round(R2 * (1.0 / _S3)), -127, 127)
    a = A2 + Q3 * _S3
    R = Xh - a
    return Q1, Q2, Q3, R, a


def _prep_kernel(x_ref, rhsq_ref, rhsr_ref, rhsa_ref,
                 q123_ref, *plane_refs, n_tiles, tile, planes):
    gram_ref = plane_refs[-1]
    plane_refs = plane_refs[:-1]
    X = x_ref[0]                                          # (S, Np) f32
    nrm = jnp.sqrt(jnp.sum(X * X, axis=0, keepdims=True))
    ok = nrm > 0
    Xh = X * jnp.where(ok, 1.0 / jnp.where(ok, nrm, 1.0), 0.0)
    Q1, Q2, Q3, R, a = _quant3(Xh)

    i8, bf, f32 = jnp.int8, jnp.bfloat16, jnp.float32
    Xbf = Xh.astype(bf)
    Rbf = R.astype(bf)
    abf = a.astype(bf)
    emitted = {"x": Xbf, "r": Rbf, "a": abf}
    for t in range(n_tiles):
        sl = slice(t * tile, (t + 1) * tile)
        q123_ref[0, t] = jnp.concatenate(
            [Q1[:, sl].astype(i8), Q2[:, sl].astype(i8),
             Q3[:, sl].astype(i8)], axis=1)
        for ref, p in zip(plane_refs, planes):
            ref[0, t] = emitted[p][:, sl]

    # ---- exact-rounded diagonal <x, x> ----
    red = lambda u, v: jnp.sum(u * v, axis=0)             # exact: < 2^24
    s11 = red(Q1, Q1)
    s12 = red(Q1, Q2)
    s13 = red(Q1, Q3)
    s22 = red(Q2, Q2)
    s23 = red(Q2, Q3)
    s33 = red(Q3, Q3)
    # corrections: x^2 = a^2 + (2a + r) r, |r| <= ~2^-24
    cdiag = jnp.sum((2.0 * a + R) * R, axis=0)
    d = df32.df_from_sum(
        s11 * f32(2.0 ** -14), (2.0 * s12) * f32(2.0 ** -22),
        (s22 + 2.0 * s13) * f32(2.0 ** -30), cdiag,
        (2.0 * s23) * f32(2.0 ** -38), s33 * f32(2.0 ** -46))[0]

    # ---- exact-rounded <x, rhs_j> via ONE int8 MXU dot ----
    # rhs levels live in 128-lane blocks [lvl1 | lvl2 | lvl3]; contracting
    # (S, 3L)' (S, 3Np) keeps every slice 128/Np aligned (transposed
    # output: gram vectors are ROWS).
    q123_all = jnp.concatenate([Q1.astype(i8), Q2.astype(i8),
                                Q3.astype(i8)], axis=1)   # (S, 3Np)
    P = lax.dot_general(rhsq_ref[0], q123_all, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)  # (3L, 3Np)
    L = _LANE
    Np = n_tiles * tile
    blk = lambda i, j: P[i * L:(i + 1) * L, j * Np:(j + 1) * Np].astype(f32)
    v14 = blk(0, 0)
    v22 = blk(0, 1) + blk(1, 0)
    v30 = blk(0, 2) + blk(1, 1) + blk(2, 0)
    v38 = blk(1, 2) + blk(2, 1)
    v46 = blk(2, 2)
    hp = dict(preferred_element_type=f32,
              precision=lax.Precision.DEFAULT)
    # corrections: <x, r_rhs> + <r_x, a_rhs> (bf16 operands on ~2^-24
    # magnitudes — same error model as the scan kernel's _gram_hi)
    c1 = lax.dot_general(rhsr_ref[0], Xbf, (((0,), (0,)), ((), ())), **hp)
    c2 = lax.dot_general(rhsa_ref[0], Rbf, (((0,), (0,)), ((), ())), **hp)
    g = df32.df_from_sum(v14 * f32(2.0 ** -14), v22 * f32(2.0 ** -22),
                         v30 * f32(2.0 ** -30), c1, c2,
                         v38 * f32(2.0 ** -38),
                         v46 * f32(2.0 ** -46))[0]        # (L, Np)
    gram_ref[0] = jnp.concatenate([d[None, :], g[:15]], axis=0)


def pack_rhs(cols):
    """Quantize + lane-align the rhs columns for prep_block (XLA, cheap).

    cols: list of already-normalized (B, S) arrays (signal first, then
    fixed-compartment columns), at most 15. Returns
    (rhs_q (B, S, 3*128) int8, rhs_r (B, S, 128) bf16,
    rhs_a (B, S, 128) bf16, q3s) where q3s are the quantize3 tuples (for
    the small XLA-side Grams among the rhs columns themselves).
    """
    assert len(cols) <= 15
    B, S = cols[0].shape
    q3s = [dfscan.quantize3(c.astype(jnp.float32)) for c in cols]
    pad = _LANE - len(cols)
    z = jnp.zeros((B, S, pad))
    stackp = lambda xs: jnp.concatenate(
        [jnp.stack(xs, axis=2), z], axis=2)
    rhs_q = jnp.concatenate(
        [stackp([q[lvl] for q in q3s]) for lvl in range(3)],
        axis=2).astype(jnp.int8)                          # (B, S, 384)
    rhs_r = stackp([q[3] for q in q3s]).astype(jnp.bfloat16)
    rhs_a = stackp([q[4] for q in q3s]).astype(jnp.bfloat16)
    return rhs_q, rhs_r, rhs_a, q3s


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "planes"))
def prep_block(A, rhs_q, rhs_r, rhs_a, tile, interpret=False, planes="xra"):
    """Normalize + quantize + pack + hoist-Grams for one rotated block.

    A (B, S, Np) f32 raw columns with Np % tile == 0 (pad with zero
    columns); rhs_* from pack_rhs. Returns
    (q123 (B, nt, S, 3*tile) int8, xbf/rbf/abf (B, nt, S, tile) bf16,
    gram (B, 16, Np) f32 — row 0 <x,x> (zero columns give 0), row 1+j
    <x, rhs_j>). ``planes`` selects which bf16 planes are written (subset
    of "xra", order fixed); skipped planes return None — the row-pass
    kernels read only two planes per side (x+r for the row block, r+a
    for the column block), so gating the unused plane saves one
    (B, S, Np) bf16 HBM write per block.
    """
    B, S, Np = A.shape
    assert Np % tile == 0
    planes = "".join(p for p in "xra" if p in planes)
    n_tiles = Np // tile
    kernel = functools.partial(_prep_kernel, n_tiles=n_tiles, tile=tile,
                               planes=planes)
    in_specs = [
        pl.BlockSpec((1, S, Np), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, 3 * _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    plane_spec = pl.BlockSpec((1, n_tiles, S, tile), lambda b: (b, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    plane_shape = jax.ShapeDtypeStruct((B, n_tiles, S, tile), jnp.bfloat16)
    out_specs = [
        pl.BlockSpec((1, n_tiles, S, 3 * tile), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        *([plane_spec] * len(planes)),
        pl.BlockSpec((1, 16, Np), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, n_tiles, S, 3 * tile), jnp.int8),
        *([plane_shape] * len(planes)),
        jax.ShapeDtypeStruct((B, 16, Np), jnp.float32),
    ]
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    outs = pl.pallas_call(
        kernel, grid=(B,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret, **params,
    )(A.astype(jnp.float32), rhs_q, rhs_r, rhs_a)
    q123, gram = outs[0], outs[-1]
    by_plane = dict(zip(planes, outs[1:-1]))
    return (q123, by_plane.get("x"), by_plane.get("r"), by_plane.get("a"),
            gram)


def pad_block(A, tile):
    """Pad the atom axis of (B, S, N) to a multiple of ``tile`` with zero
    columns (they quantize to zeros and carry zero Grams)."""
    N = A.shape[2]
    Np = int(math.ceil(N / tile) * tile)
    if Np > N:
        A = jnp.pad(A, ((0, 0), (0, 0), (0, Np - N)))
    return A, Np
