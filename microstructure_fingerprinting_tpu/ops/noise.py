"""MRI noise simulation (sum-of-squares multi-coil / non-central chi).

Parity target: ``gen_SoS_MRI`` (reference mf_utils.py:2303-2354).

Two entry points:
  - ``gen_SoS_MRI``: NumPy RNG, drop-in behavioral equivalent of the
    reference (global ``np.random`` state, same noiseless shortcut).
  - ``gen_sos_mri_jax``: functional jax.random variant for on-device,
    reproducible synthesis inside jitted pipelines.
"""

import numpy as np
import jax
import jax.numpy as jnp


def _check_sigma(S0, sigma_g):
    if (np.ndim(sigma_g) > 0
            and np.asarray(sigma_g).size > 1
            and np.shape(S0) != np.shape(sigma_g)):
        raise ValueError('sigma_g should either be a scalar or have '
                         'the shape (%s) of S0 for 1-to-1 '
                         'correspondance. Detected (%s) instead.'
                         % (", ".join("%d" % s for s in np.shape(S0)),
                            ", ".join("%d" % s for s in np.shape(sigma_g))))


def gen_SoS_MRI(S0, sigma_g, N=1):
    """Sum-of-squares multi-coil signal: sqrt(sum_i |S0 + eps1 + i eps2|^2).

    ``eps1, eps2 ~ N(0, sigma_g^2)`` independent per coil/channel. The output
    follows a non-central chi distribution (Rician for N=1). ``sigma_g`` can
    be a scalar or an array matching ``S0``; all-zero ``sigma_g`` returns the
    noiseless ``sqrt(N) * S0``.
    """
    if np.all(sigma_g == 0):
        return np.sqrt(N) * S0

    _check_sigma(S0, sigma_g)

    Y = np.zeros(S0.shape, dtype=np.float64)
    for _ in range(N):
        noise_in_phase = sigma_g * np.random.randn(*S0.shape)
        noise_in_quadrature = sigma_g * np.random.randn(*S0.shape)
        Y = Y + (S0 + noise_in_phase) ** 2 + noise_in_quadrature ** 2
    # reshape guards against broadcasting surprises when sigma_g is (1, 1)
    return np.reshape(np.sqrt(Y), S0.shape)


def gen_sos_mri_jax(key, S0, sigma_g, N=1):
    """Functional jax variant of :func:`gen_SoS_MRI` (jit/vmap friendly)."""
    S0 = jnp.asarray(S0)
    sigma_g = jnp.asarray(sigma_g)
    noise = jax.random.normal(key, (2, N) + S0.shape, dtype=S0.dtype)
    in_phase = S0[jnp.newaxis] + sigma_g * noise[0]
    in_quad = sigma_g * noise[1]
    Y = jnp.sum(in_phase ** 2 + in_quad ** 2, axis=0)
    noiseless = jnp.sqrt(float(N)) * S0
    return jnp.where(jnp.all(sigma_g == 0), noiseless, jnp.sqrt(Y))
