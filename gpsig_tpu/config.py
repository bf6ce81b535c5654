"""Global numerics policy for gpsig-tpu.

The reference (tgcsaba/GPSig) inherits GPflow's `settings` object for its
float type (float64) and jitter level (used e.g. at
`gpsig/kernels.py:431,463` and `gpsig/low_rank_calculations.py:52-56`).

On TPU the fast path is float32 (MXU-native, with float32 accumulation);
float64 is supported by XLA:TPU but slow, and is used here only as a
validation mode.  The library is dtype-polymorphic: computations follow the
dtype of the inputs/parameters, and this module only carries the *policy*
knobs (default dtype for parameter initialization, jitter level).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class NumericsConfig:
    #: default dtype for newly initialized parameters; None = follow JAX's
    #: x64 mode (float64 when enabled, else float32)
    default_float: jnp.dtype | None = None
    #: jitter added to diagonals before Cholesky / normalization
    #: (GPflow's `settings.jitter` analogue)
    jitter: float = 1e-6


_CONFIG = NumericsConfig()


def config() -> NumericsConfig:
    return _CONFIG


def default_float() -> jnp.dtype:
    if _CONFIG.default_float is not None:
        return _CONFIG.default_float
    import jax

    return jnp.dtype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)


def jitter() -> float:
    return _CONFIG.jitter


def set_default_float(dtype) -> None:
    _CONFIG.default_float = jnp.dtype(dtype)


def set_jitter(value: float) -> None:
    _CONFIG.jitter = float(value)


def enable_nan_debugging(enable: bool = True) -> None:
    """Opt-in NaN tripwire (SURVEY.md §5 'sanitizers'): every jitted
    computation re-runs eagerly and raises at the first NaN-producing op."""
    import jax

    jax.config.update("jax_debug_nans", bool(enable))
