"""Variational-parameter gradients: (Rm, a_ho) as explicit differentiable
arguments (SURVEY.md §7 north star; VERDICT r4 task 5).

The reference bakes the McMillan parameter Rm and the trap lengths a_ho
into module globals (system_mod.f90:38-66) and has no derivatives at all;
the engine's own `System` closes over them statically so jit sees them as
compile-time constants.  This module re-expresses the trial wavefunction,
the local energy, and the full 4th-order action as functions of EXPLICIT
(Rm, a_ho) arguments, so

    jax.grad(total_action_params, argnums=...)    d S / d Rm, d S / d a_ho
    jax.grad(vmc_energy, ...)                     d E_V[psi_Rm] / d Rm

are exact derivatives — enabling gradient-based trial-WF optimization
(tools/optimize_rm.py) on top of the same closed forms the sampler uses.

All functions use the closed-form potential and Jastrow (the AD path; the
reference's tables are finite-difference lookups, interpolate.f90:23-37,
and stay out of the derivative chain by design).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import jastrow as jas
from ..system import System
from ..utils.pbc import minimum_image
from .action import chin_weights


# ---------------------------------------------------------------------------
# Parameterized trial wavefunction (System.u with Rm traced, system.py:60-117)
# ---------------------------------------------------------------------------

def u_params(system: System, r, Rm):
    """Two-body log-Jastrow u(r; Rm) — System.u with Rm an explicit traced
    argument (same family selection and C1 truncation rules)."""
    cfg = system.cfg
    if cfg.jastrow == "none":
        return jnp.zeros_like(r)
    rc = system.geo.rcut
    if cfg.jastrow == "dipolar2d":
        u = jas.dipolar_u(Rm, r)
        if system.pbc:
            u = u - jas.dipolar_u(Rm, rc) - jas.dipolar_du(Rm, rc) * (r - rc)
        return u
    u = jas.mcmillan_u(Rm, r)
    if cfg.jastrow == "mcmillan_c1" and system.pbc:
        u = u - jas.mcmillan_u(Rm, rc) - jas.mcmillan_du(Rm, rc) * (r - rc)
    return u


def du_params(system: System, r, Rm):
    cfg = system.cfg
    if cfg.jastrow == "none":
        return jnp.zeros_like(r)
    if cfg.jastrow == "dipolar2d":
        du = jas.dipolar_du(Rm, r)
        if system.pbc:
            du = du - jas.dipolar_du(Rm, system.geo.rcut)
        return du
    du = jas.mcmillan_du(Rm, r)
    if cfg.jastrow == "mcmillan_c1" and system.pbc:
        du = du - jas.mcmillan_du(Rm, system.geo.rcut)
    return du


def d2u_params(system: System, r, Rm):
    cfg = system.cfg
    if cfg.jastrow == "none":
        return jnp.zeros_like(r)
    if cfg.jastrow == "dipolar2d":
        return jas.dipolar_d2u(Rm, r)
    return jas.mcmillan_d2u(Rm, r)


def _pair_geometry(system: System, R):
    xij = R[:, None, :] - R[None, :, :]
    if system.pbc:
        xij, rij2 = minimum_image(xij, system.geo.Lbox)
    else:
        rij2 = jnp.sum(xij * xij, axis=-1)
    N = R.shape[0]
    notself = ~jnp.eye(N, dtype=bool)
    m = notself & (rij2 <= system.geo.rcut2) if system.pbc else notself
    r = jnp.sqrt(jnp.where(notself, rij2, 1.0))
    return m, r, xij


def log_trial_wf_params(system: System, R, Rm, a_ho=None):
    """log Psi_T(R; Rm, a_ho) of one slice R[N, D] (ops/total_action.
    log_trial_wf with the parameters traced)."""
    m, r, _ = _pair_geometry(system, R)
    lw = 0.5 * jnp.sum(jnp.where(m, u_params(system, r, Rm), 0.0))
    if system.cfg.trap:
        a = jnp.asarray(a_ho if a_ho is not None else system.cfg.a_ho,
                        R.dtype)
        lw = lw + jnp.sum(-0.5 * jnp.sum((R / a) ** 2, axis=-1))
    return lw


def local_energy_params(system: System, R, Rm, a_ho=None):
    """Mixed/variational estimator E_L(R; Rm, a_ho) at one slice — the
    closed-form ops/estimators.local_energy with the parameters traced
    (sample_mod.f90:154-319 semantics).  Returns (E, Kin, Pot).

    a_ho parameterizes the TRIAL WF only; the trap POTENTIAL (the
    Hamiltonian) always uses the static cfg.a_ho.  (The reference ties
    the two to one namelist value, system_mod.f90:213-252 — that is the
    exact-ansatz special case a_ho == cfg.a_ho; decoupling them is what
    makes a_ho a genuine variational parameter, with the ideal-gas
    optimum exactly at a_ho = cfg.a_ho.)"""
    cfg = system.cfg
    d = cfg.dim
    m, r, xij = _pair_geometry(system, R)

    dudr = jnp.where(m, du_params(system, r, Rm), 0.0)
    d2u = jnp.where(m, d2u_params(system, r, Rm), 0.0)
    lap = 0.5 * jnp.sum((d - 1.0) * dudr / r + d2u)
    v = jnp.where(m, system.potential.v(r), 0.0)
    pot = 0.5 * jnp.sum(v)

    F = jnp.sum((dudr / r)[..., None] * xij, axis=1)  # [N, D]
    if cfg.trap:
        a = jnp.asarray(a_ho if a_ho is not None else cfg.a_ho, R.dtype)
        a_pot = jnp.asarray(cfg.a_ho, R.dtype)  # the Hamiltonian's trap
        F = F + (-(R / a ** 2))
        pot = pot + jnp.sum(0.5 * jnp.sum(R ** 2 / a_pot ** 4, axis=-1))
        lap = lap + 0.5 * jnp.sum(jnp.sum(-1.0 / a ** 2
                                          * jnp.ones_like(R), axis=-1))
    kin = -0.5 * (2.0 * lap + jnp.sum(F * F))
    return kin + pot, kin, pot


def total_action_params(system: System, paths_w, Rm, a_ho=None):
    """Full 4th-order action S(paths; Rm, a_ho) of one walker's worldline
    (ops/total_action.total_action with the variational parameters as
    explicit differentiable arguments).  The trial WF enters only at the
    end slices.  a_ho parameterizes the TRIAL WF only (the trap
    POTENTIAL terms of the action are the Hamiltonian's, cfg.a_ho —
    see local_energy_params)."""
    M = system.M
    dt = system.cfg.dt
    wv, wf = chin_weights(M, dt, paths_w.dtype)
    # pair part of V and F^2 (Rm-independent); the trap one-body action
    # terms use the STATIC Hamiltonian cfg.a_ho
    if system.cfg.trap:
        a_pot = jnp.asarray(system.cfg.a_ho, paths_w.dtype)
        m_all, r_all, _ = jax.vmap(lambda x: _pair_geometry(system, x))(
            paths_w)
        pot = 0.5 * jnp.sum(
            jnp.where(m_all, system.potential.v(r_all), 0.0), axis=(-1, -2))
        pot = pot + jnp.sum(
            0.5 * jnp.sum(paths_w ** 2 / a_pot ** 4, axis=-1), axis=-1)
        # the Chin F^2 is the POTENTIAL force (pair + trap gradient)
        f2 = jax.vmap(lambda x: _trap_f2(system, x, a_pot))(paths_w)
    else:
        pot, f2 = jax.vmap(
            lambda x: _pair_pot_f2_closed(system, x))(paths_w)
    s = jnp.sum(wv * pot) + jnp.sum(wf * f2)
    s = s - log_trial_wf_params(system, paths_w[0], Rm, a_ho)
    s = s - log_trial_wf_params(system, paths_w[-1], Rm, a_ho)
    dx = paths_w[1:] - paths_w[:-1]
    if system.pbc:
        dx, rij2 = minimum_image(dx, system.geo.Lbox)
    else:
        rij2 = jnp.sum(dx * dx, axis=-1)
    s = s + jnp.sum(rij2) / (2.0 * dt)
    return s


def _pair_pot_f2_closed(system: System, R):
    """Closed-form (Pot, total |F|^2) of one PBC slice (pair_pot without the
    table/pallas branches, kept on the AD path)."""
    m, r, xij = _pair_geometry(system, R)
    mf = m & (r > 0.0)
    v = jnp.where(m, system.potential.v(r), 0.0)
    pot = 0.5 * jnp.sum(v)
    fr = jnp.where(mf, system.potential.dvdr(r) / r, 0.0)
    F = jnp.sum(fr[..., None] * xij, axis=-2)
    return pot, jnp.sum(F * F)


def _trap_f2(system: System, R, a):
    m, r, xij = _pair_geometry(system, R)
    mf = m & (r > 0.0)
    fr = jnp.where(mf, system.potential.dvdr(r) / r, 0.0)
    F = jnp.sum(fr[..., None] * xij, axis=-2) + R / a ** 4
    return jnp.sum(F * F)


# ---------------------------------------------------------------------------
# Variational (VMC) energy of psi_Rm over a sampled batch, differentiable
# ---------------------------------------------------------------------------

def vmc_energy(system: System, Rs, Rm, Rm_ref=None, a_ho=None):
    """Reweighted variational energy over a batch of slices Rs[W, N, D]
    sampled from |psi_{Rm_ref}|^2:

        E(Rm) = sum_i w_i E_L(R_i; Rm) / sum_i w_i,
        w_i   = |psi_Rm(R_i) / psi_{Rm_ref}(R_i)|^2

    Differentiable in Rm (and a_ho).  At Rm == Rm_ref this reproduces the
    standard VMC gradient estimator
    dE/dRm = 2 <dlogpsi (E_L - E)> + <dE_L/dRm>."""
    Rm_ref = Rm if Rm_ref is None else Rm_ref
    lw = jax.vmap(lambda R: log_trial_wf_params(system, R, Rm, a_ho))(Rs)
    lw0 = jax.vmap(lambda R: log_trial_wf_params(system, R, Rm_ref, a_ho))(
        Rs)
    logw = 2.0 * (lw - jax.lax.stop_gradient(lw0))
    logw = logw - jax.lax.stop_gradient(jnp.max(logw))
    w = jnp.exp(logw)
    eL = jax.vmap(lambda R: local_energy_params(system, R, Rm, a_ho)[0])(Rs)
    return jnp.sum(w * eL) / jnp.sum(w)


def vmc_sweep(system: System, key, Rs, Rm, delta, nsweeps: int = 1,
              a_ho=None):
    """Metropolis sampling of |psi_Rm|^2 over the slice ensemble Rs[W, N, D]
    (single-particle translations, all particles per sweep).  Returns
    (Rs', acceptance fraction)."""
    from ..utils.pbc import wrap
    W, N, D = Rs.shape
    lw_fn = jax.vmap(lambda R: log_trial_wf_params(system, R, Rm, a_ho))

    def one(ip, carry):
        Rs, acc, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        dx = delta * (2.0 * jax.random.uniform(k1, (W, D), Rs.dtype) - 1.0)
        xnew = Rs[:, ip] + dx
        if system.pbc:
            xnew = wrap(xnew, system.geo.Lbox)
        Rn = Rs.at[:, ip].set(xnew)
        dlw = lw_fn(Rn) - lw_fn(Rs)
        a = jax.random.uniform(k2, (W,), Rs.dtype) < jnp.exp(2.0 * dlw)
        Rs = jnp.where(a[:, None, None], Rn, Rs)
        return Rs, acc + jnp.sum(a).astype(jnp.int32), key

    def sweep(_, carry):
        return jax.lax.fori_loop(0, N, one, carry)

    Rs, acc, _ = jax.lax.fori_loop(
        0, nsweeps, sweep, (Rs, jnp.zeros((), jnp.int32), key))
    return Rs, acc / (W * N * nsweeps)
