"""Unit tests for the DW-MRI op layers: DT converters, 3-D math, scheme
import/validation (mirrors the reference's boundary-case style)."""

import numpy as np
import pytest

from microstructure_fingerprinting_tpu.ops import dti, math3d
from microstructure_fingerprinting_tpu.utils import scheme as schm


def _random_spd(rng, n):
    A = rng.randn(n, 3, 3)
    return np.einsum("nij,nkj->nik", A, A) + 3 * np.eye(3)


@pytest.mark.parametrize("order", ["row", "column", "diagonal"])
def test_dt_vec_roundtrip(rng, order):
    DT = _random_spd(rng, 7)
    vec = dti.DT_array_to_vec(DT, order=order)
    back = dti.DT_vec_to_2Darray(vec, order=order)
    assert np.allclose(back, DT)


def test_dt_vec_to_peaks(rng):
    # stick tensors along known directions
    dirs = rng.randn(5, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    DT = (2e-3 * dirs[:, :, None] * dirs[:, None, :]
          + 1e-4 * np.eye(3)[None])
    peaks = dti.DT_vec_to_peaks(dti.DT_array_to_vec(DT, "row"), "row")
    dots = np.abs(np.sum(peaks * dirs, axis=1))
    assert np.all(dots > 1 - 1e-10)
    # zero tensors map to zero peaks (not arbitrary eigh unit vectors)
    vec = np.zeros((3, 6))
    assert np.allclose(dti.DT_vec_to_peaks(vec, "row"), 0)


def test_peaks_to_dt_vec_inverse(rng):
    dirs = rng.randn(4, 2, 3)
    dirs /= np.linalg.norm(dirs, axis=2, keepdims=True)
    out = dti.peaks_to_DT_vec(dirs.copy(), "column",
                              lam_par=2e-3, lam_perp=1e-4)
    assert len(out) == 2
    for k in range(2):
        peaks = dti.DT_vec_to_peaks(out[k], "column")
        dots = np.abs(np.sum(peaks * dirs[:, k], axis=1))
        assert np.all(dots > 1 - 1e-10)
    with pytest.raises(ValueError, match="greater than or"):
        dti.peaks_to_DT_vec(dirs, "column", lam_par=1e-4, lam_perp=2e-3)


def test_get_perp_vector(rng):
    v = rng.randn(3, 10)
    u = math3d.get_perp_vector(v)
    assert np.allclose(np.sum(u * v, axis=0), 0, atol=1e-12)
    assert np.allclose(np.sum(u ** 2, axis=0), 1)


def test_rotation_helpers(rng):
    ax = rng.randn(3)
    ax /= np.linalg.norm(ax)
    th = 0.7
    R = math3d.vrrotvec2mat(ax, th)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1)
    v = rng.randn(3)
    assert np.allclose(R @ v, math3d.rotate_vector(v, ax, th))
    with pytest.raises(ValueError, match="unit norm"):
        math3d.vrrotvec2mat(2 * ax, th)


def test_rotate_scheme_mat_invariant(rng):
    """|g_rot . dir1| == |g . dir2| (the defining invariant,
    reference mf_utils.py:1158-1159)."""
    sch = np.zeros((20, 7))
    g = rng.randn(20, 3)
    sch[:, :3] = g / np.linalg.norm(g, axis=1, keepdims=True)
    sch[:, 3] = 0.05
    sch[:, 4:7] = [0.03, 0.01, 0.05]
    d1 = np.array([0.0, 0, 1.0])
    d2 = rng.randn(3)
    d2 /= np.linalg.norm(d2)
    eff = math3d.rotate_scheme_mat(sch, d1, d2)
    assert np.allclose(np.abs(eff[:, :3] @ d1), np.abs(sch[:, :3] @ d2),
                       atol=1e-12)


def test_import_scheme_validation(tmp_path):
    good = np.zeros((3, 7))
    good[:, 2] = 1.0
    good[:, 3] = 0.05
    good[:, 4:7] = [0.03, 0.01, 0.05]
    out = schm.import_PGSE_scheme(good)
    assert out.shape == (3, 7)
    # header-skipping text loader
    p = str(tmp_path / "s.scheme")
    with open(p, "w") as f:
        f.write("VERSION: 1\n")
        np.savetxt(f, good)
    assert np.allclose(schm.import_PGSE_scheme(p), good)

    bad = good.copy()
    bad[0, :3] = [0.5, 0, 0]   # non-unit gradient
    with pytest.raises(ValueError, match="unit norm"):
        schm.import_PGSE_scheme(bad)
    bad = good.copy()
    bad[0, 5] = 0.04           # delta > Delta
    with pytest.raises(ValueError, match="greater than Delta"):
        schm.import_PGSE_scheme(bad)
    bad = good.copy()
    bad[0, 6] = 0.01           # TE < Delta + delta
    with pytest.raises(ValueError, match="TE"):
        schm.import_PGSE_scheme(bad)
    with pytest.raises(RuntimeError, match="7"):
        schm.import_PGSE_scheme(np.zeros((3, 6)))


def test_project_xy_plane():
    sch = np.zeros((2, 7))
    sch[0, :3] = [0.6, 0.0, 0.8]
    sch[0, 3] = 0.1
    sch[1, 4:7] = 0.0  # b0 row stays zero
    sch[:, 4:7] = [0.03, 0.01, 0.05]
    xy = schm.project_PGSE_scheme_xy_plane(sch)
    assert np.allclose(xy[0, :3], [1.0, 0.0, 0.0])
    assert np.isclose(xy[0, 3], 0.06)
    assert np.allclose(xy[1, :4], 0)


def test_b_value_formula():
    sch = np.zeros((1, 7))
    sch[:, 2] = 1.0
    sch[:, 3] = 0.04
    sch[:, 4:7] = [0.0431, 0.0106, 0.057]
    gam = schm.get_gyromagnetic_ratio("H")
    want = (gam * 0.04 * 0.0106) ** 2 * (0.0431 - 0.0106 / 3)
    assert np.isclose(schm.b_values(sch)[0], want)
    with pytest.raises(ValueError):
        schm.get_gyromagnetic_ratio("Xe")
