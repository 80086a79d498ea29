"""Reference-trajectory replay harness (RefRNG redemption, VERDICT r3 #5).

Drives the reference's TranslateChain + Staging control flow with the
BIT-EXACT reference RNG stream, evaluating every per-bead Delta-S through
the ENGINE's action kernel — so the resulting trajectory pins BOTH the
draw order and the engine's action arithmetic against reference semantics:

  * RNG: utils/refrng.RefRNG — MT19937 with the reference's 69069 seeding
    (random_mod.f90:5-115), grnd() double conversion, and the polar
    Box-Muller `rangauss` whose rejection loop consumes a variable number
    of uniforms (random_mod.f90:195-219); the Metropolis uniform is drawn
    ONLY when exp(-dS) < 1, exactly as vpi_mod.f90:356-364.
  * Draw order: init placement (vpi_mod.f90:232-237, ip-major then k),
    TranslateChain's dim displacement draws (vpi_mod.f90:327-329),
    Staging's window draw ii = int((2Nb-Lstag+1)*grnd())
    (vpi_mod.f90:498) and per-(j, k) rangauss calls in the sequential
    staging recursion (vpi_mod.f90:509-549, xprev reading the
    already-updated previous bead).
  * Arithmetic: each displaced bead's Delta-S comes from
    ops.pairwise.delta_action — the engine's UpdateAction equivalent —
    with reference-parity settings (tabulated V/logPsi on the reference
    grid, partial moved-particle dF2), accumulated in the reference's
    bead order.

The driven sweep is: per step, TranslateChain for ip = 0..Np-1, then
Staging for ip = 0..Np-1 (the vpi.f90:412-439 diagonal shape at
CMFreq = Nstag = 1).  tests/test_refrng.py pins the resulting trajectory
as a golden file; to regenerate the golden from the actual Fortran binary
(gfortran was unavailable here), instrument vpi.f90's diagonal branch to
this exact sweep and dump Path after each step with the same seed/config.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..system import make_system, make_tables
from ..ops.pairwise import delta_action
from .refrng import RefRNG


def replay_trajectory(seed: int = 1982, nsteps: int = 3, Np: int = 2,
                      Nb: int = 2, dim: int = 3, Lstag: int = 2,
                      density: float = 0.3, dt: float = 5e-3,
                      Rm: float = 1.2, Nmax: int = 2000):
    """Return paths[M, Np, dim] after `nsteps` replayed reference sweeps."""
    cfg = SimConfig(dim=dim, Np=Np, density=density, Nb=Nb, dt=dt, Rm=Rm,
                    Lstag=Lstag, wf_table=True, v_table=True, Nmax=Nmax,
                    dtype="float64", potential="aziz2", n_walkers=1)
    system = make_system(cfg)
    tables = make_tables(system)
    geo = system.geo
    Lbox = np.asarray(geo.Lbox)
    half = 0.5 * Lbox
    M = 2 * Nb + 1
    rng = RefRNG(seed)

    # engine-side per-bead Delta-S (UpdateAction equivalent)
    @jax.jit
    def _ds(Rrow, xn, xo, ip, ib):
        return delta_action(system, tables, Rrow[None, None],
                            xn[None, None], xo[None, None],
                            ip, jnp.asarray(ib)[None, None])[0, 0]

    def ds(Rrow, xn, xo, ip, ib):
        return float(_ds(jnp.asarray(Rrow), jnp.asarray(xn),
                         jnp.asarray(xo), jnp.int32(ip), jnp.int32(ib)))

    def bc(x, k):
        """BoundaryConditions (pbc_mod.f90:11-25): single-image ifs."""
        if x > half[k]:
            x -= Lbox[k]
        if x < -half[k]:
            x += Lbox[k]
        return x

    def metro(s):
        a = math.exp(-s)
        if a >= 1.0:
            return True
        return a >= rng.grnd()

    # init: fresh uniform box placement (vpi_mod.f90:232-237), replicated
    # to every bead (242-248)
    R = np.empty((Np, dim))
    for ip in range(Np):
        for k in range(dim):
            R[ip, k] = Lbox[k] * (rng.grnd() - 0.5)
    path = np.tile(R[None], (M, 1, 1))           # [M, Np, dim]

    def translate_chain(ip, delta):
        """vpi_mod.f90:313-379."""
        dx = np.array([delta * (2.0 * rng.grnd() - 1.0) for _ in range(dim)])
        newchain = np.empty((M, dim))
        s = 0.0
        for ib in range(M):
            xold = path[ib, ip].copy()
            xnew = xold + dx
            for k in range(dim):
                xnew[k] = bc(xnew[k], k)
            newchain[ib] = xnew
            s += ds(path[ib], xnew, xold, ip, ib)
        if metro(s):
            path[:, ip] = newchain

    def staging(ip, L):
        """vpi_mod.f90:480-578 (note the ANY-alignment window draw and the
        sequential recursion through the already-updated previous bead)."""
        ii = int((2 * Nb - L + 1) * rng.grnd())
        old = path[ii: ii + L + 1, ip].copy()
        s = 0.0
        for j in range(1, L):
            xold = path[ii + j, ip].copy()
            xnew = np.empty(dim)
            for k in range(dim):
                g1, _ = rng.rangauss(1.0, 0.0)
                xprev = path[ii + j - 1, ip, k] - xold[k]
                xprev = bc(xprev, k)
                xprev = xold[k] + xprev
                xnext = xold[k] - path[ii + L, ip, k]
                xnext = bc(xnext, k)
                xnext = xold[k] - xnext
                sigma = math.sqrt((L - j) / (L - j + 1.0) * dt)
                xmid = (xnext + xprev * (L - j)) / (L - j + 1.0)
                xnew[k] = bc(xmid + sigma * g1, k)
                path[ii + j, ip, k] = xnew[k]
            s += ds(path[ii + j], xnew, xold, ip, ii + j)
        if metro(s):
            pass
        else:
            path[ii: ii + L + 1, ip] = old

    for _ in range(nsteps):
        for ip in range(Np):
            translate_chain(ip, geo.delta_cm)
        for ip in range(Np):
            staging(ip, Lstag)
    return path
