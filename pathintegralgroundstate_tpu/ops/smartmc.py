"""Smart Monte Carlo: gradient-drifted whole-path proposals (MALA).

This is the payoff of the differentiable action (ops/total_action.py) — a
capability the reference cannot express at all (its only derivatives are
finite-difference table lookups, interpolate.f90:23-37):

    x' = x - (eps/2) * dS/dx + sqrt(eps) * xi,      xi ~ N(0, 1)

accepted with the Metropolis-adjusted-Langevin ratio

    A = exp(-S(x') + S(x)) * q(x | x') / q(x' | x),
    log q(a | b) = -|a - b + (eps/2) dS/dx(b)|^2 / (2 eps).

One MALA step displaces EVERY bead of EVERY particle at once along the
action gradient — complementary to the local staging/bisection kernels,
which decorrelate bead windows but move the collective (center-of-mass and
long-wavelength) modes slowly.  Under PBC the proposal density is evaluated
on the unwrapped increments (positions are re-wrapped afterwards; the
action is wrap-invariant, so the ratio is exact for eps * |grad| and path
spreads well below the box — always the case at usable step sizes).

Enabled by cfg.smart_mc = eps > 0; applied to diagonal walkers only (the
worm sector's broken link is not described by total_action).  Invariance of
the exact Gaussian HO path measure under this kernel is tested in
tests/test_invariance.py::test_mala_invariance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..system import System, Tables
from .moves import _wrap_pos
from .total_action import total_action


def mala_move(system: System, tables: Tables, key, paths, active, eps,
              fodd=None):
    """One MALA update of the whole ensemble: paths[W, M, N, D] -> (paths',
    accepted[W]).  active masks walkers (diagonal sector).

    fodd (optional): all-bead force-field cache; a whole-path move
    invalidates every row, so accepted walkers get a fresh field
    (total_action already uses the exact full F^2, so MALA is consistent
    with the exact_f2 sampling semantics)."""
    W = paths.shape[0]
    dtype = paths.dtype
    eps = jnp.asarray(eps, dtype)
    k_xi, k_acc = jax.random.split(key)

    s_and_g = jax.vmap(jax.value_and_grad(
        lambda p: total_action(system, tables, p)))
    S, G = s_and_g(paths)
    xi = jax.random.normal(k_xi, paths.shape, dtype)
    step = -0.5 * eps * G + jnp.sqrt(eps) * xi
    prop = _wrap_pos(system, paths + step)
    Sp, Gp = s_and_g(prop)

    def sq(x):
        return jnp.sum(x * x, axis=(1, 2, 3))

    log_q_fwd = -sq(step + 0.5 * eps * G) / (2.0 * eps)    # = -|xi|^2/2
    log_q_rev = -sq(-step + 0.5 * eps * Gp) / (2.0 * eps)
    logA = -(Sp - S) + log_q_rev - log_q_fwd

    u = jax.random.uniform(k_acc, (W,), dtype)
    acc = (jnp.log(u) < logA) & active
    paths = jnp.where(acc[:, None, None, None], prop, paths)
    if fodd is not None:
        from .pairwise import force_field

        # a whole-path move invalidates every cache row of an accepted
        # walker; skip the field pass entirely on steps where no walker
        # accepted (late-chain MALA acceptance can be low).  The cache
        # lives at ODD beads only (paths[:, 1::2]) — the only rows whose
        # F^2 carries Chin weight.
        def refresh(f):
            f_new = force_field(system, tables, paths[:, 1::2])
            return jnp.where(acc[:, None, None, None], f_new, f)

        fodd = jax.lax.cond(jnp.any(acc), refresh, lambda f: f, fodd)
        return paths, fodd, acc
    return paths, acc
