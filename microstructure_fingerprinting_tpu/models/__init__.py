"""User-facing model layer: fingerprinting (mf) and MCF analytic simulators."""
