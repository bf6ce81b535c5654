"""Checkpoint / resume for training state pytrees.

The reference keeps in-memory parameter snapshots inside a pickled
``history`` dict (`gpsig/training.py:74-78,117-129`; restore via
``m.assign``).  Here checkpoints are explicit on-disk pytree files
(params + optimizer state + RNG key + iteration), so runs survive process
death and restarts are deterministic (SURVEY.md §5).

Uses flax's msgpack serialization (no framework state, works for any
pytree of arrays).  ``save`` is atomic (write + rename).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save(path: str, state: dict) -> None:
    """Serialize a pytree of arrays to ``path`` atomically."""
    state = jax.tree.map(np.asarray, state)
    data = serialization.to_bytes(state)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def restore(path: str, like: dict, *, fill_missing: bool = False) -> dict:
    """Load a pytree saved by :func:`save`; ``like`` supplies the structure
    (and dtypes) to restore into.

    ``fill_missing=True`` tolerates files written by an older build whose
    *top-level* state schema lacked keys ``like`` has (e.g. checkpoints
    without the best-on-val / early-stop fields): those entries keep the
    template's value instead of raising.  Only the top level fills —
    structure mismatches *within* a key (e.g. a param tree from an
    incompatible model build) still raise rather than silently defaulting."""
    with open(path, "rb") as f:
        data = f.read()
    like_np = jax.tree.map(np.asarray, like)
    if fill_missing:
        raw = serialization.msgpack_restore(data)
        tmpl = serialization.to_state_dict(like_np)
        merged = {k: raw.get(k, v) for k, v in tmpl.items()}
        restored = serialization.from_state_dict(like_np, merged)
    else:
        restored = serialization.from_bytes(like_np, data)
    # cast on host first: requesting x64 dtypes from jnp under the f32
    # regime warns; numpy cast + plain asarray downcasts quietly instead
    return jax.tree.map(
        lambda r, l: jnp.asarray(np.asarray(r, dtype=np.asarray(l).dtype)),
        restored, like,
    )


def exists(path: str) -> bool:
    return os.path.exists(path)
