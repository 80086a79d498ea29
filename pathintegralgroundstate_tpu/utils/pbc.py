"""Minimum-image periodic boundary conditions.

Vectorized equivalents of the reference's scalar routines
(pbc_mod.f90:11-25 `BoundaryConditions`, pbc_mod.f90:29-52 `MinimumImage`).
The reference applies a *single* image shift (it assumes rcut <= L/2 and
displacements bounded by 1.5 L); we reproduce exactly that semantics so
per-configuration action values match the reference bit-for-bit in float64.
"""

from __future__ import annotations

import jax.numpy as jnp


def wrap(x, Lbox):
    """Wrap coordinates into [-L/2, L/2] (single image; pbc_mod.f90:11-25).

    x: [..., D]; Lbox: length-D sequence or array.
    """
    L = jnp.asarray(Lbox, dtype=x.dtype)
    half = 0.5 * L
    x = jnp.where(x > half, x - L, x)
    x = jnp.where(x < -half, x + L, x)
    return x


def minimum_image(xij, Lbox):
    """Minimum-image displacement and squared distance (pbc_mod.f90:29-52).

    xij: [..., D] raw displacement; returns (xij_mi [..., D], rij2 [...]).
    """
    xij = wrap(xij, Lbox)
    return xij, jnp.sum(xij * xij, axis=-1)


def displacement(xa, xb, Lbox=None):
    """Displacement xa - xb with optional minimum image; returns (xij, rij2)."""
    xij = xa - xb
    if Lbox is None:
        return xij, jnp.sum(xij * xij, axis=-1)
    return minimum_image(xij, Lbox)
