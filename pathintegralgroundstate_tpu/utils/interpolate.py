"""Linear table interpolation with the reference's exact stencils.

Vectorized equivalent of interpolate.f90:1-45.  The reference's convention:
a table F indexed 0..N+1 where F[i] holds the function at r = (i-1)*dx for
i = 1..N (vpi_mod.f90:98-101) with ghost cells F[0] = F[2], F[N+1] = F[N]
(vpi_mod.f90:108-109).  For a query x the reference picks ix = int(x/dx)+1
and blends F[ix-1], F[ix] — i.e. it interpolates on the interval one grid
step *below* x (a deliberate reproduction: parity mode must match the
reference's tables bit-for-bit; the closed-form path is the accurate one).

opt=0: value; opt=1: first derivative; opt=2: second derivative — all via the
reference's neighbouring-interval finite-difference stencils
(interpolate.f90:23-37).
"""

from __future__ import annotations

import jax.numpy as jnp


def interpolate(opt: int, dx: float, F, x):
    """Table lookup matching interpolate.f90.

    F: [N+2] table with ghost cells at 0 and N+1.  x: any-shape query.
    Indices are clamped to stay in range (the reference can read one cell
    out of bounds for x < dx with opt>=1; we clamp instead of faulting —
    see SURVEY.md 'edge-case fidelity').
    """
    n = F.shape[0] - 2  # Nmax
    ix = (x / dx).astype(jnp.int32) + 1
    ix = jnp.clip(ix, 2, n)  # keep ix-2 .. ix+1 in [0, N+1]
    aux1 = x - (ix - 1) * dx
    aux2 = dx - aux1

    def at(i):
        return F[i]

    if opt == 0:
        return (aux1 * at(ix) + aux2 * at(ix - 1)) / dx
    if opt == 1:
        fb = (aux1 * at(ix - 1) + aux2 * at(ix - 2)) / dx
        fa = (aux1 * at(ix + 1) + aux2 * at(ix)) / dx
        return 0.5 * (fa - fb) / dx
    if opt == 2:
        fb = (aux1 * at(ix - 1) + aux2 * at(ix - 2)) / dx
        fc = (aux1 * at(ix) + aux2 * at(ix - 1)) / dx
        fa = (aux1 * at(ix + 1) + aux2 * at(ix)) / dx
        return (fa - 2.0 * fc + fb) / (dx * dx)
    raise ValueError(f"opt must be 0, 1 or 2, got {opt}")


def build_table(fn, rmax: float, n: int, dtype=jnp.float64):
    """Tabulate fn on the reference grid (vpi_mod.f90:84-112 JastrowTable).

    Returns (table[n+2], dx) with table[i] = fn((i-1)*dx) for i=1..n and
    ghost cells table[0] = table[2], table[n+1] = table[n].
    """
    dx = rmax / (n - 1)
    r = (jnp.arange(1, n + 1, dtype=dtype) - 1.0) * dx
    vals = fn(r).astype(dtype)
    table = jnp.concatenate([vals[1:2], vals, vals[-1:]])
    return table, dx
