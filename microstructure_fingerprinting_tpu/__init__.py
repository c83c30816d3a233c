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
from .models.mf import MFModel, MFModelFit, cleanup_2fascicles  # noqa: F401
from . import mf_utils  # noqa: F401
from .models import mcf  # noqa: F401
from . import parallel, viz, testing  # noqa: F401
from .tripwire import TripWire, TripWireError, is_tripwire  # noqa: F401

__version__ = "0.1.0"
