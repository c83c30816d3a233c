"""API-surface parity: every public symbol of the reference package must be
reachable under the same name (reference __init__.py:19-21 and the
mf_utils registry, reference mf_utils.py:73-102)."""

import matplotlib

matplotlib.use("Agg")  # headless CI (mirrors reference test setup)

import numpy as np
import pytest


def test_package_exports():
    import microstructure_fingerprinting_tpu as mf
    assert callable(mf.MFModel)
    assert callable(mf.cleanup_2fascicles)
    assert hasattr(mf, "mcf") and hasattr(mf, "mf_utils")
    assert callable(mf.mcf.MCF_PGSE)
    assert callable(mf.mcf.MCF_DDE)
    assert callable(mf.mcf.import_DDE_scheme)


def test_mf_utils_registry_names():
    """Every name in the reference's registry lists exists here."""
    from microstructure_fingerprinting_tpu import mf_utils as mfu
    solvers = ['solve_exhaustive_posweights', 'solve_exhaustive_posweights_4up',
               'nnls_underdetermined']
    maths = ['get_perp_vector', 'rotate_vector', 'vrrotvec2mat']
    dwmri = ['DT_array_to_vec', 'DT_vec_to_2Darray', 'DT_vec_to_peaks',
             'peaks_to_DT_vec', 'get_gyromagnetic_ratio', 'rotate_scheme_mat',
             'rotate_atom', 'rotate_atom_2Dprotocol',
             'interp_PGSE_from_multishell', 'init_PGSE_multishell_interp',
             'project_PGSE_scheme_xy_plane', 'import_PGSE_scheme',
             'get_PGSE_scheme_from_bval_bvec_dense', 'gen_SoS_MRI']
    vis = ['plot_multi_shell_signal', 'plot_signal_2Dprotocol']
    mc = ['monte_carlo_average', 'get_PGSE_from_phases']
    io = ['loadmat', 'from_ipython']
    for name in solvers + maths + dwmri + vis + mc + io:
        assert callable(getattr(mfu, name)), "missing mf_utils.%s" % name


def test_tripwire():
    from microstructure_fingerprinting_tpu import (TripWire, TripWireError,
                                                   is_tripwire)
    guard = TripWire("module xyz is unavailable")
    assert is_tripwire(guard)
    assert not is_tripwire(object())
    with pytest.raises(TripWireError, match="xyz"):
        guard.anything
    with pytest.raises(TripWireError):
        guard()


def test_viz_smoke(rng):
    """Plotting runs headless on a small multi-shell protocol."""
    import matplotlib.pyplot as plt
    from microstructure_fingerprinting_tpu import viz, testing
    sch = testing.make_dense_scheme(n_shells=2, dirs_per_shell=12, n_b0=2)
    sig, _, _ = testing.make_dictionary(sch, num_atom=3)
    figs = viz.plot_multi_shell_signal(sig, sch, np.array([0.0, 0, 1.0]))
    assert len(figs) >= 1
    plt.close("all")

    # 2D protocol plot: two opposite-polarity lines in the xy plane
    rows = []
    d = np.array([np.sqrt(0.5), np.sqrt(0.5), 0.0])
    for Del, dl in [(0.02, 0.005), (0.03, 0.005)]:
        for s in (1, -1):
            for G in (0.05, 0.1, 0.15):
                rows.append([s * d[0], s * d[1], 0, G, Del, dl, 0.04])
        rows.append([0, 0, 0, 0, Del, dl, 0.04])
    sch2 = np.array(rows)
    sig2 = np.exp(-np.arange(len(rows)) / len(rows))[:, None]
    figs = viz.plot_signal_2Dprotocol(sig2, sch2)
    assert len(figs) >= 1
    plt.close("all")


def test_gen_sos_mri(rng):
    from microstructure_fingerprinting_tpu.ops.noise import (gen_SoS_MRI,
                                                             gen_sos_mri_jax)
    S0 = np.full((20000,), 10.0)
    # noiseless shortcut
    assert np.allclose(gen_SoS_MRI(S0, 0.0, N=4), 2.0 * S0)
    # Rician mean > S0 for N=1 (noise floor)
    out = gen_SoS_MRI(S0, 1.0, N=1)
    assert out.shape == S0.shape
    assert np.mean(out) > 10.0
    assert np.std(out) < 2.0
    # mismatched sigma shape
    with pytest.raises(ValueError):
        gen_SoS_MRI(S0, np.ones((3, 3)))
    # jax variant statistics agree
    import jax
    out_j = np.asarray(gen_sos_mri_jax(jax.random.PRNGKey(0), S0, 1.0, N=1))
    assert abs(np.mean(out_j) - np.mean(out)) < 0.05
