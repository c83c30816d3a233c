"""Double-float candidate scan tests (ops/dfscan, ops/df32).

The compensated scan must (a) agree with a float64 scipy oracle on ordinary
problems, and (b) resolve residual gaps far below the plain-f32 noise floor
(~1e-7 * ||y||^2) — the property that makes default-mode atom selection
match the reference's float64 Numba kernels (mf_utils.py:284-607).
"""

import itertools

import numpy as np
import pytest
import scipy.optimize

import jax.numpy as jnp

from microstructure_fingerprinting_tpu.ops import dfscan
from microstructure_fingerprinting_tpu.ops import df32


def _oracle3(A1, A2, a3, y):
    """f64 exhaustive argmin over (i1, i2) for blocks [N1, N2, 1]."""
    best = (None, np.sum(y.astype(np.float64) ** 2))
    for i, j in itertools.product(range(A1.shape[1]), range(A2.shape[1])):
        A = np.stack([A1[:, i], A2[:, j], a3[:, 0]],
                     axis=1).astype(np.float64)
        w, rn = scipy.optimize.nnls(A, y.astype(np.float64))
        if rn * rn < best[1]:
            best = ((i, j), rn * rn)
    return best


def test_df32_error_free_transforms(rng):
    a = np.float32(rng.randn(64) * 100)
    b = np.float32(rng.randn(64))
    s, e = df32.two_sum(jnp.asarray(a), jnp.asarray(b))
    s64 = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(s64, a.astype(np.float64) + b.astype(np.float64))
    p, e = df32.two_prod(jnp.asarray(a), jnp.asarray(b))
    p64 = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    assert np.array_equal(p64, a.astype(np.float64) * b.astype(np.float64))


def test_quantize2_exact_decomposition(rng):
    # |X| <= ~0.99: int8 levels unclipped (entries at +-1 degrade R
    # gracefully to ~2^-8 but stay exact; normalized columns sit far below)
    X = np.float32((rng.rand(40, 30) * 2 - 1) * 0.99)
    Q1, Q2, R, a = dfscan.quantize2(jnp.asarray(X))
    rec = (np.asarray(Q1, np.float64) * 2.0 ** -7
           + np.asarray(Q2, np.float64) * 2.0 ** -15
           + np.asarray(R, np.float64))
    assert np.array_equal(rec.astype(np.float32), X)
    # the identity a + R == X must hold exactly in f32
    assert np.array_equal(np.asarray(a) + np.asarray(R), X)
    # |R1| can reach s1/2 = 128*s2, clipping Q2 at 127 -> |R| <= ~2^-15
    assert np.max(np.abs(np.asarray(R))) <= 2.0 ** -15 + 2.0 ** -27


def test_df_gram_accuracy(rng):
    B, S, N = 2, 60, 32
    A = np.float32(rng.randn(B, S, N) / np.sqrt(S))
    Bm = np.float32(rng.randn(B, S, N) / np.sqrt(S))
    qa = dfscan.quantize2(jnp.asarray(A))
    qb = dfscan.quantize2(jnp.asarray(Bm))
    hi, lo = dfscan.df_gram(qa, qb, "bst,bsn->btn")
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    want = np.einsum("bst,bsn->btn", A.astype(np.float64),
                     Bm.astype(np.float64))
    assert np.max(np.abs(got - want)) < 1e-10
    hi2, lo2 = dfscan.df_gram_tile(qa, qb, N)
    got2 = np.asarray(hi2, np.float64) + np.asarray(lo2, np.float64)
    assert np.max(np.abs(got2 - want)) < 1e-9


@pytest.mark.parametrize("csf", [True, False])
def test_dfscan_matches_oracle(rng, csf):
    B, S, N1, N2 = 3, 40, 22, 18
    A1 = np.float32(rng.randn(B, S, N1))
    A2 = np.float32(rng.randn(B, S, N2))
    a3 = np.float32(np.abs(rng.randn(B, S, 1)) + 0.05)
    y = np.float32(rng.randn(B, S))
    if csf:
        cand, vals, ysq = dfscan.df3_candidates(
            jnp.asarray(A1), jnp.asarray(A2), jnp.asarray(a3),
            jnp.asarray(y), M=4)
    else:
        cand, vals, ysq = dfscan.df2_candidates(
            jnp.asarray(A1), jnp.asarray(A2), jnp.asarray(y), M=4)
    cand = np.asarray(cand)
    for b in range(B):
        if csf:
            (ij, obj) = _oracle3(A1[b], A2[b], a3[b], y[b])
        else:
            best = (None, np.sum(y[b].astype(np.float64) ** 2))
            for i, j in itertools.product(range(N1), range(N2)):
                A = np.stack([A1[b, :, i], A2[b, :, j]],
                             axis=1).astype(np.float64)
                w, rn = scipy.optimize.nnls(A, y[b].astype(np.float64))
                if rn * rn < best[1]:
                    best = ((i, j), rn * rn)
            ij, obj = best
        if ij is None:
            continue
        assert tuple(cand[b, 0]) == ij, \
            "voxel %d: %s vs oracle %s" % (b, tuple(cand[b, 0]), ij)


def test_pallas_df3_kernel_matches_xla(rng):
    """Fused Pallas df3 kernel (interpret mode) == XLA df3 scan, including
    the column-blocked large-N2 path."""
    from microstructure_fingerprinting_tpu.ops import pallas_dfscan as pdf
    from microstructure_fingerprinting_tpu.ops import pallas_nnls as pk
    for (B, S, N1, N2) in ((3, 40, 70, 60), (2, 24, 140, 600)):
        A1 = np.float32(rng.randn(B, S, N1))
        A2 = np.float32(rng.randn(B, S, N2))
        a3 = np.float32(np.abs(rng.randn(B, S, 1)) + 0.05)
        y = np.float32(rng.randn(B, S))
        rr, ri, ysq = pdf.row_scan_df3(jnp.asarray(A1), jnp.asarray(A2),
                                       jnp.asarray(a3), jnp.asarray(y),
                                       interpret=True)
        cand, vals = pk.candidates_from_rows(rr, ri, 4,
                                             segments=pdf.n_segments(N2))
        cand0, vals0, _ = dfscan.df3_candidates(
            jnp.asarray(A1), jnp.asarray(A2), jnp.asarray(a3),
            jnp.asarray(y), M=4)
        assert np.all(np.asarray(cand)[:, 0] == np.asarray(cand0)[:, 0])
        np.testing.assert_allclose(np.asarray(vals)[:, 0],
                                   np.asarray(vals0)[:, 0],
                                   rtol=1e-5, atol=1e-7)


def test_dfscan_resolves_sub_f32_gaps(rng):
    """Two atom pairs whose residuals differ by ~1e-9 * ||y||^2 — far below
    the plain f32 scan's ~1e-7 resolution — must be ranked correctly."""
    S = 64
    base = rng.randn(S)
    base /= np.linalg.norm(base)
    orth = rng.randn(S)
    orth -= base * (base @ orth)
    orth /= np.linalg.norm(orth)
    # winner leaves residual sqrt(1e-10); decoy leaves sqrt(3e-10)
    win = base + 1e-5 * orth
    dec = base + np.sqrt(3.0) * 1e-5 * orth
    filler = rng.randn(S, 6) * 0.3 + base[:, None]
    A1 = np.stack([dec] + [win] + list(filler.T), axis=1).astype(np.float32)
    A2 = (rng.randn(S, 5) * 0.2 + 0.7 * base[:, None]).astype(np.float32)
    a3 = np.abs(rng.randn(S, 1)).astype(np.float32) + 0.1
    y = (base * 100).astype(np.float32)
    cand, vals, ysq = dfscan.df3_candidates(
        jnp.asarray(A1[None]), jnp.asarray(A2[None]),
        jnp.asarray(a3[None]), jnp.asarray(y[None]), M=4)
    cand = np.asarray(cand)
    # the winner/decoy residual gap is ~1e-10 * ||y||^2 (1e-10 vs 3e-10):
    # far below the ~1e-7 plain-f32 floor. The compensated scan must pick
    # the winner atom; its selected combination must be optimal to the
    # scan's design resolution (~1e-10 relative).
    assert cand[0, 0, 0] == 1, "decoy atom chosen over the true winner"
    ij, obj = _oracle3(A1, A2, a3, y)
    i, j = cand[0, 0]
    A = np.stack([A1[:, i], A2[:, j], a3[:, 0]], axis=1).astype(np.float64)
    _w, rn = scipy.optimize.nnls(A, y.astype(np.float64))
    ysq64 = float(y.astype(np.float64) @ y.astype(np.float64))
    assert rn * rn <= obj + 2e-10 * ysq64
