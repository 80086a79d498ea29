"""Trial wave functions: McMillan two-body Jastrow and harmonic-trap one-body.

Vectorized equivalents of the reference's scalar functions:
  LogPsi(opt, Rm, r)     system_mod.f90:38-66   (opt 0/1/2 = u, u', u'')
  TrapPsi(opt, a, x)     system_mod.f90:213-234
  TrapPot(opt, a, x)     system_mod.f90:238-252

Note the reference sign conventions: LogPsi(1) returns +2.5 (Rm/r)^5 / r,
i.e. du/dr of u(r) = -1/2 (Rm/r)^5; TrapPsi(1) returns -(x/a^2) = d/dx of
-x^2/(2a^2).  All functions are elementwise and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


# --- McMillan Jastrow u(r) = -1/2 (Rm/r)^5 --------------------------------

def mcmillan_u(Rm, r):
    """log-Jastrow u(r) (system_mod.f90:44-46, opt=0)."""
    return -0.5 * (Rm / r) ** 5


def mcmillan_du(Rm, r):
    """u'(r) (system_mod.f90:48-50, opt=1)."""
    return 2.5 * (Rm / r) ** 5 / r


def mcmillan_d2u(Rm, r):
    """u''(r) (system_mod.f90:52-54, opt=2)."""
    return -15.0 * (Rm / r) ** 5 / r ** 2


# --- 2-D dipolar Jastrow u(r) = -2 sqrt(r0/r) ------------------------------
#
# The zero-energy two-body scattering solution of V = Cdd/r^3 in 2-D is
# psi(r) ~ exp(-2 sqrt(r0/r)) at short range (r0 = m Cdd / hbar^2; the
# standard dipolar-gas trial, e.g. Astrakharchik et al., PRL 98, 060405
# (2007)).  With r0 = Rm = Cdd (configuration units hbar^2/m = 1) the
# |grad u|^2 = Rm/r^3 term of the local energy cancels the potential's
# Cdd/r^3 divergence exactly — the McMillan He-4 form leaves the mixed
# estimator unbounded for this potential.  No reference analogue
# (system_mod.f90 keeps only a dipolar Force fragment in comments,
# system_mod.f90:195-206).

def dipolar_u(r0, r):
    return -2.0 * jnp.sqrt(r0 / r)


def dipolar_du(r0, r):
    return jnp.sqrt(r0 / r) / r


def dipolar_d2u(r0, r):
    return -1.5 * jnp.sqrt(r0 / r) / r ** 2


# --- Harmonic trap one-body terms -----------------------------------------

def trap_psi(a_ho, x):
    """One-body log trial WF, summed over dims: -1/2 (x/a)^2 (opt=0)."""
    a = jnp.asarray(a_ho, dtype=x.dtype)
    return -0.5 * jnp.sum((x / a) ** 2, axis=-1)


def trap_psi_grad(a_ho, x):
    """d/dx_k of trap_psi: -(x/a^2) (opt=1)."""
    a = jnp.asarray(a_ho, dtype=x.dtype)
    return -(x / a ** 2)


def trap_psi_lap(a_ho, x):
    """Sum_k d2/dx_k^2 of trap_psi: -1/a^2 per dim (opt=2)."""
    a = jnp.asarray(a_ho, dtype=x.dtype)
    return jnp.sum(-1.0 / a ** 2 * jnp.ones_like(x), axis=-1)


def trap_pot(a_ho, x):
    """Trap potential summed over dims: 1/2 x^2 / a^4 (opt=0)."""
    a = jnp.asarray(a_ho, dtype=x.dtype)
    return jnp.sum(0.5 * x ** 2 / a ** 4, axis=-1)


def trap_pot_grad(a_ho, x):
    """d/dx_k of trap_pot: x/a^4 (opt=1)."""
    a = jnp.asarray(a_ho, dtype=x.dtype)
    return x / a ** 4
