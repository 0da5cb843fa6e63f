"""Low-discrepancy and pseudo-random samplers (Halton, box-muller gaussian).

Parity: reference `curobo/_src/util/sampling/` (Halton/Roberts/random
sequencers + `SampleBuffer`). Sequences are generated as pure jnp so they
can be baked as constants or generated on-device inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = np.array(
    [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67,
     71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137, 139,
     149, 151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223,
     227, 229, 233, 239, 241, 251, 257, 263, 269, 271, 277, 281, 283, 293],
    dtype=np.int64,
)


def halton_sequence(n: int, dim: int, skip: int = 20) -> np.ndarray:
    """(n, dim) Halton points in (0, 1). Host-side numpy, deterministic."""
    if dim > len(_PRIMES):
        raise ValueError(f"halton dim {dim} > {len(_PRIMES)} supported")
    out = np.zeros((n, dim), dtype=np.float64)
    idx = np.arange(skip, skip + n, dtype=np.int64)
    for d in range(dim):
        b = _PRIMES[d]
        i = idx.copy()
        f = np.ones(n)
        r = np.zeros(n)
        while np.any(i > 0):
            f = f / b
            r = r + f * (i % b)
            i = i // b
        out[:, d] = r
    return out


def halton_gaussian(n: int, dim: int, skip: int = 20) -> np.ndarray:
    """(n, dim) standard-normal quasi-random samples (inverse-CDF of Halton)."""
    u = np.clip(halton_sequence(n, dim, skip), 1e-6, 1 - 1e-6)
    from scipy.special import erfinv

    return np.sqrt(2.0) * erfinv(2.0 * u - 1.0)


def gaussian_halton_bank(
    n: int, dim: int, skip: int = 20, dtype=jnp.float32
) -> jnp.ndarray:
    """Device constant of quasi-random normals, reused across iterations
    (the reference's `SampleBuffer` pattern, `sample_buffer.py:22`)."""
    return jnp.asarray(halton_gaussian(n, dim, skip), dtype=dtype)


def random_gaussian(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


def roberts_sequence(n: int, dim: int, skip: int = 0) -> np.ndarray:
    """(n, dim) Roberts R_d quasi-random points in (0, 1).

    Parity: reference Roberts sequencer
    (`curobo/_src/util/sampling/sequencer_roberts.py`). The additive
    recurrence x_i = frac(i * alpha) with alpha_j = 1/phi_d^(j+1), phi_d the
    unique positive root of x^(d+1) = x + 1 — better-distributed than
    Halton in high dimensions.
    """
    # fixed-point iteration for the generalized golden ratio phi_d
    phi = 2.0
    for _ in range(64):
        phi = (1.0 + phi) ** (1.0 / (dim + 1.0))
    alpha = (1.0 / phi) ** (np.arange(1, dim + 1, dtype=np.float64))
    i = np.arange(skip + 1, skip + n + 1, dtype=np.float64)[:, None]
    return np.mod(0.5 + i * alpha[None, :], 1.0)


def roberts_gaussian(n: int, dim: int, skip: int = 0) -> np.ndarray:
    """(n, dim) standard-normal quasi-random samples (inverse-CDF Roberts)."""
    u = np.clip(roberts_sequence(n, dim, skip), 1e-6, 1 - 1e-6)
    from scipy.special import erfinv

    return np.sqrt(2.0) * erfinv(2.0 * u - 1.0)
