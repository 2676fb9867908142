"""Pytree linear algebra for matrix-free Krylov methods.

Solution states are pytrees (vertex grid + center grid per field), so Krylov
vectors stay pytrees: no ravel/concat, which would destroy the 2D sharding
layout under SPMD. Dots reduce per leaf and sum — under ``jax.sharding``
these lower to on-device partial reductions + an all-reduce over ICI,
replacing PETSc's internal MPI dot products (SURVEY.md section 2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, tree_util as jtu


def vdot(a, b):
    leaves = jtu.tree_leaves(jtu.tree_map(lambda x, y: jnp.vdot(x, y), a, b))
    return sum(leaves[1:], leaves[0])


def norm(a):
    return jnp.sqrt(vdot(a, a))


def add(a, b):
    return jtu.tree_map(jnp.add, a, b)


def sub(a, b):
    return jtu.tree_map(jnp.subtract, a, b)


def scale(s, a):
    return jtu.tree_map(lambda x: s * x, a)


def axpy(s, x, y):
    """y + s * x."""
    return jtu.tree_map(lambda xl, yl: yl + s * xl, x, y)


def zeros_like(a):
    return jtu.tree_map(jnp.zeros_like, a)


def neg(a):
    return jtu.tree_map(jnp.negative, a)


# ---- stacked Krylov basis: each leaf gains a leading slot axis ----

def basis_zeros(proto, m: int):
    return jtu.tree_map(lambda l: jnp.zeros((m,) + l.shape, l.dtype), proto)


def basis_set(V, k, v):
    return jtu.tree_map(
        lambda Vl, vl: lax.dynamic_update_index_in_dim(Vl, vl, k, 0), V, v
    )


def basis_get(V, k):
    return jtu.tree_map(
        lambda Vl: lax.dynamic_index_in_dim(Vl, k, 0, keepdims=False), V
    )


def basis_dots(V, w):
    """[m] vector of <V_i, w> for all slots at once (one fused pass)."""
    parts = jtu.tree_leaves(
        jtu.tree_map(
            lambda Vl, wl: jnp.tensordot(
                Vl.reshape(Vl.shape[0], -1), wl.reshape(-1), axes=1
            ),
            V,
            w,
        )
    )
    return sum(parts[1:], parts[0])


def basis_comb(V, y):
    """sum_i y_i V_i."""
    return jtu.tree_map(
        lambda Vl: jnp.tensordot(y, Vl.reshape(Vl.shape[0], -1), axes=1).reshape(
            Vl.shape[1:]
        ),
        V,
    )


def safe_inv(x, eps=0.0):
    return jnp.where(x > eps, 1.0 / jnp.where(x > eps, x, 1.0), 0.0)
