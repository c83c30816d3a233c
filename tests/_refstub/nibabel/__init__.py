"""Minimal :mod:`nibabel` stand-in used ONLY by the reference-parity tests.

The upstream reference (/root/reference/microstructure_fingerprinting/mf.py:30-33)
imports nibabel behind a TripWire and only uses four entry points:
``nib.load(path).get_fdata()`` / ``.affine``, ``nib.Nifti1Image(arr, affine)``
and ``nib.save(img, fname)`` (reference mf.py:1225-1227).

This shim backs those with this framework's own dependency-free NIfTI-1 codec
(microstructure_fingerprinting_tpu/utils/nifti.py), so the reference can run
end-to-end in pure Python for differential testing.
"""

from microstructure_fingerprinting_tpu.utils.nifti import (  # noqa: F401
    Nifti1Image,
    NiftiImage,
    load,
    save,
)
