"""Worker for the 2-process jax.distributed CPU test (test_multihost.py).

Each process owns 2 virtual CPU devices; together they form one 4-device
'data' mesh spanning both processes — the localhost model of a multi-host
volume fit (DCN across hosts). The voxel batch is split across processes,
promoted to a global sharded array, pushed through the jitted fused fit
step, and gathered back to every host; process 0 writes the result.

Usage: python _multihost_worker.py <pid> <nproc> <port> <out.npz>
"""

import os
import sys

pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
os.environ["JAX_ENABLE_X64"] = "true"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from microstructure_fingerprinting_tpu.parallel import mesh as pmesh  # noqa
from microstructure_fingerprinting_tpu.models.fit import fit_step  # noqa
from microstructure_fingerprinting_tpu import testing as mft  # noqa


def main():
    pmesh.init_distributed("localhost:%s" % port, nproc, pid)
    assert jax.process_count() == nproc
    devs = jax.devices()
    assert len(devs) == 2 * nproc, devs

    # deterministic workload, identically constructed on every process
    wl = mft.make_fit_workload(num_atom=16, n_vox=8, n_shells=3,
                               dirs_per_shell=8, n_b0=4)
    ms, plan = wl["msinterp"], wl["plan"]
    xs, ys, cnt = ms.device_tables()
    dt = xs.dtype
    mesh = pmesh.build_mesh(n_data=len(devs), n_atoms=1, devices=devs)

    n_vox = wl["peaks"].shape[0]
    per_proc = n_vox // nproc
    sl = slice(pid * per_proc, (pid + 1) * per_proc)
    peaks_l = jnp.asarray(wl["peaks"][sl], dtype=dt)
    y_l = jnp.asarray(wl["y"][sl], dtype=dt)
    peaks_g = pmesh.host_local_to_global(mesh, P("data", None, None),
                                         peaks_l)
    y_g = pmesh.host_local_to_global(mesh, P("data", None), y_l)

    out = fit_step(xs, ys, cnt,
                   jnp.asarray(plan.gdir, dtype=dt),
                   jnp.asarray(plan.shell_lo), jnp.asarray(plan.shell_hi),
                   jnp.asarray(plan.wG, dtype=dt),
                   peaks_g, y_g,
                   jnp.asarray(wl["sig_csf"], dtype=dt),
                   jnp.zeros((y_g.shape[1], 1), dtype=dt),
                   K=2, csf_on=True, ear_on=False)
    w = pmesh.gather_to_host(out["w"])
    ind = pmesh.gather_to_host(out["ind"])
    mse = pmesh.gather_to_host(out["mse"])
    if pid == 0:
        np.savez(out_path, w=w, ind=ind, mse=mse)
    # all processes must reach shutdown together
    jax.distributed.shutdown()
    print("worker %d done" % pid)


if __name__ == "__main__":
    main()
