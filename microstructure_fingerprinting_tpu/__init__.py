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

from . import ops, utils  # noqa: F401

__version__ = "0.1.0"

# Heavier layers are imported lazily-but-eagerly here; guarded so partial
# builds (docs, minimal environments) can still import the core ops.
try:
    from .models.mf import MFModel, MFModelFit, cleanup_2fascicles  # noqa: F401
    from . import mf_utils  # noqa: F401
    from .models import mcf  # noqa: F401
    from . import parallel  # noqa: F401
except ImportError:  # pragma: no cover - only during staged builds
    pass
