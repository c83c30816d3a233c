"""Microstructure Fingerprinting, TPU-native (JAX / XLA / Pallas / pjit).

A from-scratch TPU-first framework with the capabilities of
rensonnetg/microstructure_fingerprinting: estimation of white-matter
microstructure from DW-MRI by exhaustive combinatorial NNLS against a
dictionary of Monte-Carlo-simulated fingerprints.

Public surface (mirrors the reference package __init__.py:19-21):

    import microstructure_fingerprinting_tpu as mf
    model = mf.MFModel(dictionary)
    fit = model.fit(data, mask, numfasc, peaks=..., pgse_scheme=...)
    fit.write_nifti('out.nii.gz')
    mf.cleanup_2fascicles(...)
    mf.mf_utils  # flat compatibility namespace with the reference's utilities
    mf.mcf       # analytic matrix-formalism simulators
"""

import os as _os

import jax as _jax


def enable_compile_cache():
    """Persistent XLA compilation cache (cold-start amortization).

    A whole-brain fit compiles one program per voxel configuration
    (~30-200 s each on remote-attached accelerators); caching the compiled
    executables on disk makes every later process start warm. Called lazily
    on the first MFModel construction — accelerator backends only (XLA:CPU
    AOT reloads are machine-feature sensitive). Opt out with
    MF_TPU_NO_COMPILE_CACHE=1 or by pre-setting jax_compilation_cache_dir.
    """
    if _os.environ.get("MF_TPU_NO_COMPILE_CACHE"):
        return
    try:
        if _jax.default_backend() == "cpu":
            return
        if _jax.config.jax_compilation_cache_dir:
            return  # user already configured one
        path = _os.path.join(
            _os.path.expanduser("~"), ".cache",
            "microstructure_fingerprinting_tpu", "xla_cache")
        _os.makedirs(path, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, including fast-compiling programs
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization, never a requirement
        pass


from . import ops, utils  # noqa: F401,E402
from .models.mf import MFModel, MFModelFit, cleanup_2fascicles  # noqa: F401
from . import mf_utils  # noqa: F401
from .models import mcf  # noqa: F401
from . import parallel, viz, testing  # noqa: F401
from .tripwire import TripWire, TripWireError, is_tripwire  # noqa: F401

__version__ = "0.1.0"
