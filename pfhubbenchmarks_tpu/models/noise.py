"""Langevin noise for phase-field states (dolfin/pfbase.py:341-356 parity).

The reference's ``LangevinNoise`` draws uniform(-1/2, 1/2) per dof scaled by
an amplitude, via numpy's global RNG (unseeded; their seed line is commented
out). Here: explicit, splittable ``jax.random`` keys — reproducible and
shardable, per the JAX idiom.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def langevin_noise(key, w, amplitude: float, fields=None):
    """Add uniform(-amp/2, amp/2) noise to selected fields of a state pytree.

    ``fields``: indices of the field axis to perturb (default: all).
    Returns (new_state, new_key).
    """
    key, *subkeys = jax.random.split(key, len(w) + 1)
    out = []
    for leaf, sk in zip(w, subkeys):
        noise = amplitude * (jax.random.uniform(sk, leaf.shape, leaf.dtype) - 0.5)
        if fields is not None:
            mask = jnp.zeros((leaf.shape[0],) + (1,) * (leaf.ndim - 1), leaf.dtype)
            mask = mask.at[jnp.asarray(fields)].set(1.0)
            noise = noise * mask
        out.append(leaf + noise)
    return tuple(out), key
