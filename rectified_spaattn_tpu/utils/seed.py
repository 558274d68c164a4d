"""Determinism helpers (reference: utils/seed.py:8-24).

JAX is deterministic by construction given a PRNGKey; this seeds the
host-side RNGs too so curve sampling / prompt shuffling / NumPy test
fixtures reproduce.
"""

from __future__ import annotations

import random

import numpy as np
import jax


def set_seed(seed: int) -> jax.Array:
    """Seed python + numpy and return a jax PRNGKey for device sampling."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
