"""MCF analytic simulator + Monte-Carlo phase synthesis tests.

The reference ships precomputed eigenbasis payloads (MCF_data/*.mat); we
generate them analytically, so the primary test is parity of the generated
spectra/coupling matrices against the reference data (when mounted), plus
physics invariants and the DDE long-mixing factorization.
"""

import os

import numpy as np
import pytest

from conftest import fixture_path, has_fixture

from microstructure_fingerprinting_tpu.models import mcf
from microstructure_fingerprinting_tpu.ops import mc as mfmc
from microstructure_fingerprinting_tpu.utils import io as mfio

_REF_MCF = "/root/reference/microstructure_fingerprinting/MCF_data"
_HAS_REF = os.path.isdir(_REF_MCF)


@pytest.mark.skipif(not _HAS_REF, reason="reference MCF data unavailable")
@pytest.mark.parametrize("domain,tag", [("cylinder", "c"), ("sphere", "s"),
                                        ("planes", "p")])
def test_generated_basis_matches_reference(domain, tag):
    lam, B = mcf.mcf_basis(domain, 60)
    Lr = mfio.loadmat(os.path.join(_REF_MCF, "MCF_L%sl.mat" % tag))["L"][:60]
    Br = mfio.loadmat(os.path.join(_REF_MCF,
                                   "MCF_B%sl.mat" % tag))["B"][:60, :60]
    assert np.max(np.abs(lam - Lr) / np.maximum(Lr, 1.0)) < 1e-8
    # eigenfunction sign conventions may differ; |B| is convention-free
    assert np.max(np.abs(np.abs(B) - np.abs(Br))) < 5e-6


def test_mcf_pgse_physics():
    """Cylinder PGSE attenuation: E(G=0)=1, monotone decreasing in G,
    free-diffusion limit along the axis."""
    G = np.array([0.0, 0.05, 0.1, 0.2, 0.3])
    Delta = np.full(5, 0.02)
    delta = np.full(5, 0.005)
    E = mcf.MCF_PGSE("cylinder", 5e-6, 2e-9, G=G, Delta=Delta, delta=delta)
    assert np.isclose(E[0], 1.0)
    assert np.all(np.diff(E) < 0)
    assert np.all((E > 0) & (E <= 1))

    # gradient along the cylinder axis: pure free diffusion exp(-b D)
    sch = np.zeros((3, 7))
    sch[:, 2] = 1.0  # g = e_z = envdir
    sch[:, 3] = [0.0, 0.05, 0.1]
    sch[:, 4:7] = [0.02, 0.005, 0.03]
    E_par = mcf.MCF_PGSE("cylinder", 5e-6, 2e-9, scheme=sch)
    from microstructure_fingerprinting_tpu.utils.scheme import b_values
    b = b_values(sch)
    assert np.allclose(E_par, np.exp(-b * 2e-9), rtol=1e-6)


def test_mcf_pgse_restricted_vs_small_pore():
    """Smaller pores restrict more -> higher perpendicular signal."""
    sch = np.zeros((1, 7))
    sch[:, 0] = 1.0  # x gradient, perpendicular to the cylinder
    sch[:, 3] = 0.1
    sch[:, 4:7] = [0.02, 0.005, 0.03]
    E_small = mcf.MCF_PGSE("cylinder", 1e-6, 2e-9, scheme=sch)
    E_big = mcf.MCF_PGSE("cylinder", 8e-6, 2e-9, scheme=sch)
    assert E_small[0] > E_big[0]


def test_mcf_truncation_guard():
    with pytest.raises(ValueError, match="too small"):
        mcf.MCF_PGSE("cylinder", 1e-4, 1e-10,
                     G=np.array([0.5]), Delta=np.array([0.05]),
                     delta=np.array([0.02]))


def test_mcf_unimplemented_domains():
    for dom in ("sphere", "planes"):
        with pytest.raises(NotImplementedError):
            mcf.MCF_PGSE(dom, 5e-6, 2e-9, G=np.array([0.05]),
                         Delta=np.array([0.02]), delta=np.array([0.005]))


def test_mcf_dde_long_mixing_factorizes():
    """As tau_mix -> inf, only the ground mode survives the mixing interval:
    E_DDE -> E_block1 * E_block2."""
    L, diff = 5e-6, 2e-9
    dde = np.zeros((1, 14))
    dde[:, :3] = [1, 0, 0]
    dde[:, 3] = 0.08
    dde[:, 4:6] = [0.02, 0.005]
    dde[:, 6] = 5.0           # very long mixing time
    dde[:, 7:10] = [0, 1, 0]
    dde[:, 10] = 0.06
    dde[:, 11:13] = [0.015, 0.004]
    dde[:, 13] = 6.0
    E_dde = mcf.MCF_DDE("cylinder", L, diff, dde)

    E1 = mcf.MCF_PGSE("cylinder", L, diff, G=np.array([0.08]),
                      Delta=np.array([0.02]), delta=np.array([0.005]))
    E2 = mcf.MCF_PGSE("cylinder", L, diff, G=np.array([0.06]),
                      Delta=np.array([0.015]), delta=np.array([0.004]))
    assert np.isclose(E_dde[0], E1[0] * E2[0], rtol=1e-5)


def test_import_dde_scheme_validation():
    bad = np.zeros((1, 14))
    bad[:, :3] = [1, 0, 0]
    bad[:, 4:6] = [0.004, 0.005]  # Delta < delta in first block
    bad[:, 7:10] = [0, 1, 0]
    bad[:, 11:13] = [0.02, 0.005]
    bad[:, 13] = 1.0
    with pytest.raises(ValueError, match="first encoding module"):
        mcf.import_DDE_scheme(bad)


# ---------------------------------------------------------------------------
# Monte-Carlo phase synthesis
# ---------------------------------------------------------------------------

def test_monte_carlo_average_free_diffusion(rng):
    """Phases of free 1-D diffusion: S = exp(-b D) analytically.

    For PGSE, the accumulated phase of a freely diffusing spin is Gaussian
    with variance 2 b (at unit gradient scaling and D scaling), so
    mean cos(phi) = exp(-b) -- checked against the kernel on synthetic
    Gaussian phases.
    """
    n_ref, n_spin = 3, 200000
    sigma = np.array([0.3, 0.7, 1.2])  # phase std per reference sequence
    phases = rng.randn(n_ref, n_spin, 2)
    phases[:, :, 0] *= sigma[:, None]
    phases[:, :, 1] = 0.0
    sim_phases = phases.reshape(n_ref * n_spin, 2)
    delta_mapping = np.array([0, 1, 2, 1], dtype=np.int64)
    gscaling = np.ones((4, 2))
    gscaling[3, 0] = 0.5  # scaled-down gradient
    S = mfmc.monte_carlo_average(sim_phases, delta_mapping, gscaling,
                                 1.0, n_spin)
    want = np.exp(-np.array([sigma[0] ** 2, sigma[1] ** 2, sigma[2] ** 2,
                             (0.5 * sigma[1]) ** 2]) / 2)
    assert np.max(np.abs(S - want)) < 5e-3


def test_get_pgse_from_phases_roundtrip(tmp_path, rng):
    """File parsing: endianness/precision encoded in the extension, sibling
    _phase_{x,y} files, (Delta, delta) row mapping, gradient scaling."""
    n_ref, n_spin, dim = 2, 5000, 2
    sch_sim = np.zeros((n_ref, 7))
    sch_sim[:, 0] = 0.8
    sch_sim[:, 1] = 0.6
    sch_sim[:, 3] = [0.1, 0.2]
    sch_sim[:, 4:7] = [[0.02, 0.005, 0.03], [0.03, 0.008, 0.04]]
    # new protocol: same (Delta, delta) rows, half gradient on row 1
    sch_new = sch_sim.copy()
    sch_new[1, 3] = 0.1

    phases = rng.randn(n_ref * n_spin, dim) * 0.8
    for i, name in enumerate(["x", "y"]):
        phases[:, i].astype(">f8").tofile(
            str(tmp_path / ("sim_phase_%s.bdouble" % name)))
    S = mfmc.get_PGSE_from_phases(
        str(tmp_path / "sim_phase_x.bdouble"), sch_sim, sch_new, dim=dim)
    # direct evaluation: gscaling row 0 = 1, row 1 = 0.5 (both components)
    want0 = np.mean(np.cos(phases[:n_spin].sum(axis=1)))
    want1 = np.mean(np.cos(0.5 * phases[n_spin:].sum(axis=1)))
    assert np.isfinite(S).all()
    assert np.isclose(S[0], want0, atol=1e-10)
    assert np.isclose(S[1], want1, atol=1e-10)
