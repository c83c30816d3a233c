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


def test_reference_named_solver_entrypoints(rng):
    """The per-K solver names the reference exports individually resolve and
    agree with the dispatcher."""
    from microstructure_fingerprinting_tpu import mf_utils as mfu
    A = rng.randn(20, 12)
    y = rng.randn(20)
    w, i_s, i_t, obj, rec = mfu.solve_exhaustive_posweights(
        A, y, np.array([12]))
    w1, is1, it1, obj1, rec1 = mfu.solve_exhaustive_posweights_1(A, y)
    assert np.isclose(w1, w[0]) and is1 == i_s[0] and np.isclose(obj1, obj)
    w, i_s, i_t, obj, rec = mfu.solve_exhaustive_posweights(
        A, y, np.array([5, 7]))
    w2, is2, it2, obj2, rec2 = mfu.solve_exhaustive_posweights_2(
        A, y, np.array([5, 7]))
    assert np.allclose(w2, w) and np.all(is2 == i_s)
    w, i_s, i_t, obj, rec = mfu.solve_exhaustive_posweights(
        A, y, np.array([5, 4, 3]))
    w3, is3, it3, obj3, rec3 = mfu.solve_exhaustive_posweights_3(
        A, y, np.array([5, 4, 3]))
    assert np.allclose(w3, w) and np.all(is3 == i_s)
    wv, rn = mfu.lsqnonneg_2var_opt(2.0, 1.0, 0.1, 1.0, 0.5, 0.3)
    assert wv.shape == (2,) and rn <= 2.0


def test_config_defaults():
    from microstructure_fingerprinting_tpu import config
    assert config.DEFAULTS["fit"].max_fasc == 2
    assert config.DEFAULTS["cleanup"].ratio == 2.5
    assert config.DEFAULTS["mcf"].max_modes == 60
    import dataclasses
    import pytest as _pytest
    with _pytest.raises(dataclasses.FrozenInstanceError):
        config.DEFAULTS["fit"].max_fasc = 3


def test_nan_voxels_skipped(rng):
    """NaN-contaminated voxels are excluded instead of poisoning the batch."""
    from microstructure_fingerprinting_tpu import testing as mft
    from microstructure_fingerprinting_tpu.models.mf import MFModel
    sch = mft.make_dense_scheme(n_shells=3, dirs_per_shell=16, n_b0=4)
    sig, dpar, _ = mft.make_dictionary(sch, num_atom=24)
    dic = {"dictionary": sig, "sch_mat": sch,
           "orientation": np.array([0., 0., 1.]), "num_atom": 24,
           "num_ear": 0, "fasc_propnames": ["dpar"], "dpar": dpar,
           "T2_csf": 2.0, "DIFF_csf": 3e-9, "T2_ear": 2.0,
           "DIFF_ear": np.array([1e-9])}
    model = MFModel(dic)
    shape = (3, 1, 1)
    data = np.abs(rng.rand(*shape, sch.shape[0])) + 0.5
    data[1, 0, 0, 5] = np.nan
    d = rng.randn(3); d /= np.linalg.norm(d)
    peaks = np.tile(d, shape + (1,))
    fit = model.fit(data, np.ones(shape), 1, peaks=peaks,
                    pgse_scheme=sch, verbose=0, batch_size=4)
    assert fit.M0[1, 0, 0] == 0          # skipped
    assert np.isfinite(fit.M0).all()     # neighbours unaffected
    assert fit.M0[0, 0, 0] > 0 and fit.M0[2, 0, 0] > 0


def test_cli_cleanup(tmp_path, rng):
    """CLI cleanup subcommand end-to-end with NIfTI files."""
    from microstructure_fingerprinting_tpu import cli
    from microstructure_fingerprinting_tpu.utils import nifti
    shape = (4, 2, 1)
    aff = np.eye(4)
    mu1 = np.zeros(shape + (3,)); mu1[..., 0] = 1.0
    mu2 = np.zeros(shape + (3,)); mu2[..., 2] = 1.0
    f1 = np.full(shape, 0.5)
    f2 = np.full(shape, 0.4)
    paths = {}
    for name, arr in (("mu1", mu1), ("mu2", mu2), ("f1", f1), ("f2", f2),
                      ("mask", np.ones(shape))):
        p = str(tmp_path / (name + ".nii.gz"))
        nifti.save(nifti.Nifti1Image(arr, aff), p)
        paths[name] = p
    rc = cli.main(["cleanup", "--peakmode", "peaks",
                   "--mu1", paths["mu1"], "--mu2", paths["mu2"],
                   "--frac1", paths["f1"], "--frac2", paths["f2"],
                   "--mask", paths["mask"],
                   "--out", str(tmp_path / "clean.nii.gz")])
    assert rc == 0
    pk = nifti.load(str(tmp_path / "clean_peaks.nii.gz")).get_fdata()
    nf = nifti.load(str(tmp_path / "clean_numfasc.nii.gz")).get_fdata()
    assert pk.shape == shape + (6,)
    assert np.all(nf == 2)
