"""Device-mesh parallelism tests (8 virtual CPU devices, see conftest)."""

import numpy as np
import pytest

import jax

from microstructure_fingerprinting_tpu.parallel import mesh as pmesh
from microstructure_fingerprinting_tpu.ops import nnls as mfn

needs_8 = pytest.mark.skipif(len(jax.devices()) != 8,
                             reason="needs the 8-device virtual mesh")


@needs_8
def test_build_mesh_shapes():
    m = pmesh.build_mesh(n_atoms=1)
    assert dict(m.shape) == {"data": 8, "atoms": 1}
    m = pmesh.build_mesh(n_data=2, n_atoms=4)
    assert dict(m.shape) == {"data": 2, "atoms": 4}
    with pytest.raises(AssertionError):
        pmesh.build_mesh(n_data=3, n_atoms=3)


@needs_8
def test_sharded_scan_matches_single_device(rng):
    """Atom-axis tensor-parallel candidate scan (all-gather + offset-
    corrected argmin) == single-device scan, across mesh shapes."""
    B, S, N1, N2 = 8, 30, 24, 32  # B divisible by every data-axis size
    A1 = rng.randn(B, S, N1)
    A2 = rng.randn(B, S, N2)
    y = rng.randn(B, S)
    w0, ind0, obj0 = mfn.exhaustive_2_batched(A1, A2, y)
    for (nd, na) in ((2, 4), (4, 2), (8, 1)):
        m = pmesh.build_mesh(n_data=nd, n_atoms=na)
        w, ind, obj = pmesh.sharded_exhaustive_2(m, A1, A2, y)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w0),
                                   rtol=1e-12, err_msg=str((nd, na)))
        assert np.all(np.asarray(ind) == np.asarray(ind0)), (nd, na)
        np.testing.assert_allclose(np.asarray(obj), np.asarray(obj0),
                                   rtol=1e-12)


@needs_8
def test_shard_batch_and_replicate(rng):
    m = pmesh.build_mesh(n_atoms=1)
    x = rng.randn(16, 5)
    xs = pmesh.shard_batch(m, x)
    assert np.allclose(np.asarray(xs), x)
    assert len(xs.sharding.device_set) == 8
    r = pmesh.replicate(m, x)
    assert np.allclose(np.asarray(r), x)
    assert r.sharding.is_fully_replicated
