"""The 4th-order Chin/Simpson short-time action.

Re-expresses the reference's scalar `GreenFunction(opt, ib, dt, Pot, F2)`
(global_mod.f90:19-72) as per-bead weight *vectors* over the whole worldline,
so Simpson-weighted action sums become masked dot products:

    S_pot = sum_ib  wv[ib] * V[ib] + wf[ib] * F2[ib]

opt=0 (action weights, global_mod.f90:31-46):
    ends  (ib = 0, 2*Nb):        dt*V/3
    even interior:               2*dt*V/3
    odd interior:                4*dt/3 * (V + dt^2*F2/6)

opt=1 (thermodynamic-estimator weights, global_mod.f90:50-65):
    same Simpson pattern with coefficient 1 instead of dt and
    V + dt^2*F2/2 on odd beads.

Also provides the *total differentiable action* S(paths; params) used for
autodiff-based smart MC and variational optimization (a capability absent in
the reference, whose derivatives are finite-difference table lookups).
"""

from __future__ import annotations

import jax.numpy as jnp


def chin_weights(M: int, dt: float, dtype=jnp.float32):
    """Action weights (opt=0). Returns (wv[M], wf[M])."""
    ib = jnp.arange(M)
    interior = (ib > 0) & (ib < M - 1)
    odd = interior & (ib % 2 == 1)
    even_int = interior & (ib % 2 == 0)
    wv = jnp.where(odd, 4.0 * dt / 3.0, jnp.where(even_int, 2.0 * dt / 3.0, dt / 3.0))
    wf = jnp.where(odd, 4.0 * dt / 3.0 * dt * dt / 6.0, 0.0)
    return wv.astype(dtype), wf.astype(dtype)


def chin_weights_thermo(M: int, dt: float, dtype=jnp.float32):
    """Thermodynamic-estimator weights (opt=1). Returns (wv[M], wf[M])."""
    ib = jnp.arange(M)
    interior = (ib > 0) & (ib < M - 1)
    odd = interior & (ib % 2 == 1)
    even_int = interior & (ib % 2 == 0)
    wv = jnp.where(odd, 4.0 / 3.0, jnp.where(even_int, 2.0 / 3.0, 1.0 / 3.0))
    wf = jnp.where(odd, 4.0 / 3.0 * dt * dt / 2.0, 0.0)
    return wv.astype(dtype), wf.astype(dtype)


def green_function(opt: int, ib, M: int, dt: float, Pot, F2):
    """Drop-in scalar/elementwise equivalent of GreenFunction (global_mod.f90:19-72).

    ib may be an integer array (bead indices); Pot/F2 broadcast against it.
    """
    ib = jnp.asarray(ib)
    interior = (ib > 0) & (ib < M - 1)
    odd = interior & (ib % 2 == 1)
    even_int = interior & (ib % 2 == 0)
    if opt == 0:
        Vc = Pot + dt * dt * F2 / 6.0
        return jnp.where(
            odd, 4.0 * dt * Vc / 3.0,
            jnp.where(even_int, 2.0 * dt * Pot / 3.0, dt * Pot / 3.0))
    elif opt == 1:
        dVc = Pot + dt * dt * F2 / 2.0
        return jnp.where(
            odd, 4.0 * dVc / 3.0,
            jnp.where(even_int, 2.0 * Pot / 3.0, Pot / 3.0))
    raise ValueError(f"opt must be 0 or 1, got {opt}")
