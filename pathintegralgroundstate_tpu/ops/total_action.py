"""The total PIGS action as a differentiable function of the worldline.

The reference never materializes the action — it only ever evaluates local
differences inside Metropolis moves (UpdateAction, vpi_mod.f90:2491-2530).
Here the full action is a first-class differentiable scalar

    S(paths; Rm, dt) = -log Psi_T(R_0) - log Psi_T(R_{2Nb})
                       + sum_ib [ wv(ib) V(R_ib) + wf(ib) F2(R_ib) ]
                       + sum_links |r_{ib+1} - r_ib|^2 / (2 dt)

(Chin opt=0 weights, global_mod.f90:31-46; F2 is the *full* squared force
sum — the consistent 4th-order action), enabling `jax.grad` with respect to
bead coordinates (smart MC / hybrid proposals) and variational parameters —
a capability the reference lacks entirely (its derivatives are
finite-difference table lookups, interpolate.f90:23-37).

NOTE on sampler parity: the Metropolis kernels (ops/pairwise.delta_action)
reproduce the reference's bookkeeping, whose Delta-F^2 tracks only the
displaced particle's force (vpi_mod.f90:2825-2836) — a deliberate
reference-exact choice documented in SURVEY.md §7 'hard parts'.  The
potential, wavefunction, and kinetic pieces here are exactly consistent
with the sampled increments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import jastrow as jas
from ..system import System, Tables
from ..utils.pbc import minimum_image
from .action import chin_weights
from .pairwise import pair_pot


def log_trial_wf(system: System, tables: Tables, R):
    """log Psi_T of one time slice R[N, D] (Jastrow pair sum + trap)."""
    cfg, geo = system.cfg, system.geo
    xij = R[:, None, :] - R[None, :, :]
    if system.pbc:
        xij, rij2 = minimum_image(xij, geo.Lbox)
    else:
        rij2 = jnp.sum(xij * xij, axis=-1)
    N = R.shape[0]
    notself = ~jnp.eye(N, dtype=bool)
    m = notself & (rij2 <= geo.rcut2) if system.pbc else notself
    r = jnp.sqrt(jnp.where(notself, rij2, 1.0))
    u = jnp.where(m, system.u(r), 0.0)
    lw = 0.5 * jnp.sum(u)
    if cfg.trap:
        lw = lw + jnp.sum(jas.trap_psi(cfg.a_ho, R))
    return lw


def kinetic_action(system: System, paths_w):
    """Spring action sum_links |dr|^2/(2 dt) over one walker's worldline."""
    dt = system.cfg.dt
    dx = paths_w[1:] - paths_w[:-1]
    if system.pbc:
        dx, rij2 = minimum_image(dx, system.geo.Lbox)
    else:
        rij2 = jnp.sum(dx * dx, axis=-1)
    return jnp.sum(rij2) / (2.0 * dt)


def total_action(system: System, tables: Tables, paths_w):
    """Full 4th-order action of one walker's (closed/diagonal) worldline
    paths_w[M, N, D].  Differentiable w.r.t. paths_w."""
    M = system.M
    dt = system.cfg.dt
    wv, wf = chin_weights(M, dt, paths_w.dtype)
    pot, f2 = jax.vmap(lambda x: pair_pot(system, tables, x, True))(paths_w)
    s = jnp.sum(wv * pot) + jnp.sum(wf * f2)
    s = s - log_trial_wf(system, tables, paths_w[0])
    s = s - log_trial_wf(system, tables, paths_w[-1])
    s = s + kinetic_action(system, paths_w)
    return s


def interaction_action(system: System, tables: Tables, paths_w):
    """Interaction-only part (no springs) — the piece whose local differences
    the Metropolis kernels evaluate (staging proposals cancel the springs)."""
    M = system.M
    dt = system.cfg.dt
    wv, wf = chin_weights(M, dt, paths_w.dtype)
    pot, f2 = jax.vmap(lambda x: pair_pot(system, tables, x, True))(paths_w)
    s = jnp.sum(wv * pot) + jnp.sum(wf * f2)
    s = s - log_trial_wf(system, tables, paths_w[0])
    s = s - log_trial_wf(system, tables, paths_w[-1])
    return s


def grad_action(system: System, tables: Tables, paths_w):
    """d S / d paths — drift field for smart-MC proposals (autodiff)."""
    return jax.grad(lambda p: total_action(system, tables, p))(paths_w)
