"""Solver tests.

Mirrors the reference integration suite
(/root/reference/tests/integration/test_exhaustive_fingerprinting.py):
hand-computed boundary cases for the 1- and 2-variable kernels, exact
recovery on noiseless synthetic voxels, solver optimality under noise — plus
new coverage the reference lacks: a scipy.optimize.nnls oracle for the 3- and
4-sub-dictionary device scans and batched-vs-single equivalence.
"""

import itertools

import numpy as np
import pytest
import scipy.optimize

from microstructure_fingerprinting_tpu.ops import nnls as mfn


def _oracle(A, y, dicsizes):
    """Brute-force oracle: scipy.optimize.nnls over every atom combination."""
    st = np.concatenate([[0], np.cumsum(dicsizes)[:-1]]).astype(int)
    best = (None, None, np.sum(y ** 2))
    for idx in itertools.product(*[range(n) for n in dicsizes]):
        cols = st + np.array(idx)
        w, rn = scipy.optimize.nnls(A[:, cols], y)
        obj = rn * rn
        if obj < best[2]:
            best = (w, np.array(idx), obj)
    return best


def test_boundary_cases_1d():
    sqrt2 = np.sqrt(2.0)
    A = np.array([[0.0], [1.0], [0.0]])
    Y = np.array([[1, 0, sqrt2 / 2, 0, sqrt2 / 2],
                  [0, 0, -sqrt2 / 2, 2, sqrt2 / 2],
                  [0, 1, 0, 0, 0]])
    diclengths = np.array([1])
    w_exp = [0, 0, 0, 2, sqrt2 / 2]
    obj_exp = [1, 1, 1, 0, 0.5]
    for i in range(Y.shape[1]):
        (w, ind_sub, ind_tot, obj, y_rec) = mfn.solve_exhaustive_posweights(
            A, Y[:, i], diclengths)
        assert np.isclose(w[0], w_exp[i]), "w mismatch col %d" % i
        assert np.isclose(obj, obj_exp[i]), "obj mismatch col %d" % i
        assert y_rec.shape == (3,)


def test_boundary_cases_2d():
    sqrt2 = np.sqrt(2.0)
    sqrt3 = np.sqrt(3.0)
    A = np.array([[0.5, sqrt3 * 0.5], [sqrt3 * 0.5, 0.5]])
    Y = np.array([[-sqrt3 / 2, 0.5, -1, -sqrt3 / 2, 0.5001,
                   0.5, sqrt3 / 2, sqrt2 / 2, -sqrt2 / 2.0],
                  [0.5, -sqrt3 / 2, 0, 0.5001, -sqrt3 / 2,
                   sqrt3 / 2, 0.5, sqrt2 / 2, -sqrt2 / 2.0]])
    diclengths = np.array([1, 1])
    w_exp = np.array([[0, 0], [0, 0], [0, 0], [8.66025404e-05, 0],
                      [0, 8.66025404e-05], [1, 0], [0, 1],
                      [0.51763809, 0.51763809], [0, 0]]).transpose()
    obj_exp = np.array([1, 1, 1, 1.0001000025, 1.0001000025, 0, 0, 0, 1])
    w_st = np.zeros((2, Y.shape[1]))
    obj_st = np.zeros(Y.shape[1])
    for i in range(Y.shape[1]):
        (w_st[:, i], ind_sub, ind_tot, obj_st[i],
         y_rec) = mfn.solve_exhaustive_posweights(A, Y[:, i], diclengths)
    assert np.allclose(w_st, w_exp), "weights mismatch in 2-var cases"
    assert np.allclose(obj_st, obj_exp), "objective mismatch in 2-var cases"


def test_synthetic_data(rng):
    """Noiseless exact recovery + noisy optimality (reference :94-153)."""
    Nfasc, iso_on = 2, 1
    Natoms, N_mris, Nvox = 300, 200, 5

    A = rng.randn(N_mris * (Nfasc * Natoms + iso_on))
    A = A.reshape((N_mris, Nfasc * Natoms + iso_on), order="F")

    ID_gt = np.zeros((Nfasc + iso_on, Nvox), dtype=int)
    ID_gt[0, :] = rng.randint(0, Natoms, (Nvox))
    ID_gt[1, :] = rng.randint(0, Natoms, (Nvox)) + Natoms
    ID_gt[Nfasc, :] = Nfasc * Natoms
    w_gt = rng.rand(Nfasc + iso_on, Nvox)
    Y = np.zeros((N_mris, Nvox))
    for i in range(Nvox):
        Y[:, i] = np.dot(A[:, ID_gt[:, i]], w_gt[:, i])
    noise = 0.1 * (2.0 * rng.rand(N_mris, Nvox) - 1.0)
    Ynoisy = Y + noise
    noise_sq_nrm = np.sum(noise ** 2, axis=0)

    diclengths = np.array([Natoms, Natoms, 1])
    min_obj = np.zeros(Nvox)
    ID_totdic_est = np.zeros((Nfasc + iso_on, Nvox))
    for i in range(Nvox):
        (w, ID_subdic, ID_totdic_est[:, i], min_obj[i],
         y_rec) = mfn.solve_exhaustive_posweights(A, Ynoisy[:, i], diclengths)
    assert np.all(ID_gt == ID_totdic_est), "noisy data: wrong atoms recovered"
    assert np.all(min_obj < noise_sq_nrm), \
        "exhaustive solution should beat the ground-truth residual"

    # strictly noiseless: weights recovered too
    (w, ID_subdic, ID_totdic, obj, y_rec) = mfn.solve_exhaustive_posweights(
        A, Y[:, 0], diclengths)
    assert np.all(ID_totdic == ID_gt[:, 0])
    assert np.allclose(w, w_gt[:, 0])
    # algebraic residual (y'y - 2w'Y + w'Gw) leaves O(eps * ||y||^2)
    assert obj < 1e-9 * np.sum(Y[:, 0] ** 2)


@pytest.mark.parametrize("dicsizes", [[7], [5, 6], [5, 6, 3], [4, 5, 2, 3],
                                      [3, 4, 2, 2, 2]])
def test_oracle_parity(rng, dicsizes):
    """Device scans agree with a scipy.optimize.nnls brute-force oracle."""
    dicsizes = np.array(dicsizes)
    n_col = int(np.sum(dicsizes))
    for trial in range(8):
        A = rng.randn(20, n_col)
        y = rng.randn(20)
        (w, ind_sub, ind_tot, obj, y_rec) = mfn.solve_exhaustive_posweights(
            A, y, dicsizes)
        w_o, idx_o, obj_o = _oracle(A, y, dicsizes)
        assert np.isclose(obj, obj_o, rtol=1e-9, atol=1e-12), \
            "objective differs from oracle (trial %d)" % trial
        if w_o is not None and not np.isclose(obj_o, np.sum(y ** 2)):
            assert np.all(ind_sub == idx_o), \
                "selected atoms differ from oracle (trial %d)" % trial
            assert np.allclose(w, w_o, rtol=1e-7, atol=1e-10)


def test_batched_matches_single(rng):
    """Batched device solve == per-voxel solve (new coverage: the reference
    never tests its parallel path)."""
    B, S, N1, N2, N3 = 6, 30, 40, 35, 4
    A1 = rng.randn(B, S, N1)
    A2 = rng.randn(B, S, N2)
    A3 = rng.randn(B, S, N3)
    y = rng.randn(B, S)
    w, ind, obj = mfn.exhaustive_3_batched(A1, A2, A3, y)
    w, ind, obj = np.asarray(w), np.asarray(ind), np.asarray(obj)
    for b in range(B):
        A = np.concatenate([A1[b], A2[b], A3[b]], axis=1)
        (w_s, ind_s, _tot, obj_s, _rec) = mfn.solve_exhaustive_posweights(
            A, y[b], np.array([N1, N2, N3]))
        assert np.allclose(w[b], w_s)
        assert np.all(ind[b] == ind_s)
        assert np.isclose(obj[b], obj_s)


def test_nnls_underdetermined(rng):
    """Active-set NNLS matches scipy on wide systems."""
    for _ in range(10):
        X = rng.randn(10, 25)
        y = rng.randn(10)
        x, PP, w = mfn.nnls_underdetermined(X, y)
        assert np.all(x >= 0)
        x_sp, rn = scipy.optimize.nnls(X, y)
        obj = np.sum((X @ x - y) ** 2)
        assert obj <= rn * rn * (1 + 1e-8) + 1e-12


def test_4block_candidates_contain_oracle(rng):
    """The top-M pool of the 4-block scan (2 fasc + CSF + EAR shape) must
    contain the oracle-optimal (i1, i2) pair so the f64 re-scorer can pick
    it; the top-1 must equal the oracle after decode."""
    import jax.numpy as jnp
    sizes = [30, 25, 1, 6]
    N1, N2, N3, N4 = sizes
    for trial in range(5):
        A = rng.randn(20, sum(sizes))
        y = rng.randn(20)
        st = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(int)
        blocks = [jnp.asarray(A[None, :, st[k]:st[k] + sizes[k]])
                  for k in range(4)]
        flats, vals = mfn.exhaustive_4_candidates(*blocks,
                                                  jnp.asarray(y[None]), M=8)
        flats = np.asarray(flats[0])
        i4 = flats % N4
        i3 = (flats // N4) % N3
        i2 = (flats // (N4 * N3)) % N2
        i1 = flats // (N4 * N3 * N2)
        w_o, idx_o, obj_o = _oracle(A, y, np.array(sizes))
        if w_o is None:
            continue
        pairs = set(zip(i1.tolist(), i2.tolist()))
        assert (idx_o[0], idx_o[1]) in pairs, \
            "oracle (i1,i2) missing from candidate pool (trial %d)" % trial
        assert (i1[0], i2[0], i3[0], i4[0]) == tuple(idx_o), \
            "top-1 candidate differs from oracle (trial %d)" % trial


def test_4block_refine_pipeline_matches_oracle(rng):
    """Candidates + float64 EAR re-enumeration == oracle on the full
    4-block problem (the path MFModel.fit uses for CSF+EAR voxels)."""
    from microstructure_fingerprinting_tpu.models import refine as refine_mod
    import jax.numpy as jnp
    sizes = [12, 10, 1, 5]
    N = 18
    st = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(int)
    B = 6
    A = rng.randn(N, sum(sizes))
    Y = rng.randn(B, N)
    blocks = [jnp.asarray(np.broadcast_to(
        A[None, :, st[k]:st[k] + sizes[k]], (B, N, sizes[k])))
        for k in range(4)]
    cand = np.asarray(mfn.exhaustive_candidates_blocks(
        tuple(blocks), jnp.asarray(Y), M=8))
    cols = np.empty((2, B, 8, N))
    for k in range(2):
        cols[k] = A[:, st[k] + cand[:, :, k]].transpose(1, 2, 0)
    sig_csf = A[:, st[2]]
    sig_ear = A[:, st[3]:]
    cols_full = np.concatenate([cols, np.broadcast_to(
        sig_csf[None, None, None, :], (1, B, 8, N))], axis=0)
    w, e_idx, res = refine_mod._solve_support_ear(cols_full, Y, sig_ear)
    best = np.argmin(res, axis=1)
    for b in range(B):
        w_o, idx_o, obj_o = _oracle(A, Y[b], np.array(sizes))
        if w_o is None:
            continue
        m = best[b]
        got = (cand[b, m, 0], cand[b, m, 1], cand[b, m, 2], e_idx[b, m])
        assert got == tuple(idx_o), "voxel %d: %s vs oracle %s" \
            % (b, got, tuple(idx_o))
        assert np.isclose(res[b, m], obj_o, rtol=1e-9, atol=1e-12)
        assert np.allclose(w[b, m], w_o, rtol=1e-7, atol=1e-10)


def test_nnls_underdetermined_cap_warning(rng):
    """Hitting the iteration cap must warn, not silently return."""
    import warnings as _warnings
    X = rng.randn(10, 25)
    y = rng.randn(10)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        x, PP, w = mfn.nnls_underdetermined(X, y, max_outer=1)
    assert any(issubclass(r.category, RuntimeWarning) for r in rec), \
        "cap-hit should emit a RuntimeWarning"
    assert np.all(x >= 0)  # still a feasible iterate


def test_general_path_matches_oracle(rng):
    """The K>4 vectorized support-enumeration path (used by the public
    dispatcher for 5+ sub-dictionaries) against the scipy oracle, including
    a chunk boundary smaller than the combination count."""
    dicsizes = np.array([3, 3, 2, 2, 2])
    n_col = int(np.sum(dicsizes))
    for trial in range(4):
        A = rng.randn(15, n_col)
        y = rng.randn(15)
        out = mfn._solve_exhaustive_posweights_general(A, y, dicsizes,
                                                       chunk=17)
        w, ind_sub, ind_tot, obj, y_rec = out
        w_o, idx_o, obj_o = _oracle(A, y, dicsizes)
        assert np.isclose(obj, obj_o, rtol=1e-9, atol=1e-12)
        if w_o is not None:
            assert np.all(ind_sub == idx_o)
            assert np.allclose(w, w_o, rtol=1e-7, atol=1e-10)
        assert np.allclose(y_rec, A[:, ind_tot] @ w)


def test_tie_breaking_first_index():
    """Duplicate best atoms: the first index must win (reference uses a
    strict '<' improvement test, mf_utils.py:382)."""
    a = np.array([1.0, 2.0, 0.5])
    A1 = np.stack([a, a, a], axis=1)       # three identical columns
    A2 = np.array([[0.1], [0.3], [-0.2]])
    y = 2.0 * a + 0.0 * A2[:, 0]
    (w, ind_sub, ind_tot, obj, y_rec) = mfn.solve_exhaustive_posweights(
        np.concatenate([A1, A2], axis=1), y, np.array([3, 1]))
    assert ind_sub[0] == 0, "tie should resolve to the first atom"
