"""Mesh construction and sharded execution of the fingerprinting fit.

The reference parallelizes over voxels with a multiprocessing.Pool
(mf.py:978-1009), pickling per-voxel dicts across process pipes. The
TPU-native equivalent: voxels are a batch axis sharded across the device
mesh with ``jax.sharding`` / ``shard_map``; the dictionary tables are
replicated in HBM (read-only, identical for all voxels); the only collective
is the implicit output gather — voxels are embarrassingly parallel.

Two parallel axes are exposed:
  * ``data``  — voxel batch (pure DP; no cross-device communication)
  * ``atoms`` — the second sub-dictionary's atom axis in the candidate scan
    (model parallelism). Each device scans its atom shard and the global
    first-minimum is reconstructed with an all-gather + offset-corrected
    argmin, preserving the reference's tie-breaking.
"""


import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops import nnls


def build_mesh(n_data=None, n_atoms=1, devices=None):
    """Create a (data, atoms) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_data is None:
        n_data = n_dev // n_atoms
    assert n_data * n_atoms == n_dev, (
        "mesh shape %dx%d does not match %d devices"
        % (n_data, n_atoms, n_dev))
    dev_grid = np.asarray(devices).reshape(n_data, n_atoms)
    return Mesh(dev_grid, ("data", "atoms"))


def shard_batch(mesh, x):
    """Shard axis 0 of ``x`` over the 'data' mesh axis."""
    spec = P("data") if x.ndim == 1 else P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh, x):
    """Replicate ``x`` across the mesh (read-only dictionary tables)."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def sharded_exhaustive_2(mesh, A1, A2, y):
    """2-sub-dictionary exhaustive NNLS, voxel-DP x atom-TP on the mesh.

    A1 (B, S, N1) sharded over 'data'; A2 (B, S, N2) sharded over
    ('data', None, 'atoms'); y (B, S) over 'data'. Each device scans the
    N1 x (N2/n_atoms) candidate sub-grid; the global winner per voxel is
    recovered with an all-gather over 'atoms' and an offset-corrected
    first-minimum, which preserves the reference candidate ordering
    (row-major over the full N1 x N2 grid).
    """
    N2 = A2.shape[2]
    n_at = mesh.shape["atoms"]
    assert N2 % n_at == 0, "atom axis must divide evenly across devices"
    n2_loc = N2 // n_at

    def local_scan(A1_l, A2_l, y_l):
        # A2_l: (b, S, N2/n_at) local atom shard
        w, ind, obj = nnls.exhaustive_2_batched(A1_l, A2_l, y_l)
        shard = jax.lax.axis_index("atoms")
        # flat rank in the GLOBAL candidate grid (i1 * N2 + global i2)
        gflat = ind[:, 0] * N2 + shard * n2_loc + ind[:, 1]
        # gather every shard's champion, pick the global first minimum
        objs = jax.lax.all_gather(obj, "atoms", axis=1)       # (b, n_at)
        flats = jax.lax.all_gather(gflat, "atoms", axis=1)    # (b, n_at)
        ws = jax.lax.all_gather(w, "atoms", axis=1)           # (b, n_at, 2)
        # order by (obj, flat): smallest obj, earliest candidate on ties
        order = jnp.argsort(flats, axis=1)
        objs_o = jnp.take_along_axis(objs, order, axis=1)
        best = jnp.argmin(objs_o, axis=1)  # first (lowest flat) min
        pick = jnp.take_along_axis(order, best[:, None], axis=1)
        obj_g = jnp.take_along_axis(objs, pick, axis=1)[:, 0]
        flat_g = jnp.take_along_axis(flats, pick, axis=1)[:, 0]
        w_g = jnp.take_along_axis(ws, pick[:, :, None], axis=1)[:, 0, :]
        ind_g = jnp.stack([flat_g // N2, flat_g % N2], axis=1)
        return w_g, ind_g.astype(jnp.int32), obj_g

    fn = shard_map(local_scan, mesh=mesh,
                   in_specs=(P("data", None, None), P("data", None, "atoms"),
                             P("data", None)),
                   out_specs=(P("data", None), P("data", None), P("data")),
                   check_vma=False)
    return fn(A1, A2, y)
