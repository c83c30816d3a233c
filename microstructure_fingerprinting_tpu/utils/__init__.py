"""Host-side utilities: file I/O, scheme handling, optional-dep guards."""

from . import io, nifti, scheme  # noqa: F401
