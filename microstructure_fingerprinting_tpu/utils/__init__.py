"""Host-side utilities: file I/O, scheme handling, optional-dep guards."""

from . import io, nifti, scheme, profiling  # noqa: F401
