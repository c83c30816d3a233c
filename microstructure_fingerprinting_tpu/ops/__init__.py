"""Device-side compute ops: solvers, interpolation, simulation, geometry."""

from . import math3d, dti, noise, nnls  # noqa: F401
