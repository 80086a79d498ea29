"""Action-layer correctness: batched pair-delta kernels vs brute-force
reference semantics, autodiff gradients vs finite differences
(SURVEY.md §4 'Autodiff' north-star requirement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.ops.pairwise import (
    delta_action, delta_pot, delta_wf, pair_pot)
from pathintegralgroundstate_tpu.ops.total_action import (
    grad_action, interaction_action, total_action)
from pathintegralgroundstate_tpu.system import make_system, make_tables


def _setup(trap=False, v_table=False, wf_table=False, Np=8, dim=3):
    cfg = SimConfig(dim=dim, Np=Np, density=0.365, trap=trap,
                    a_ho=(1.0,) * dim if trap else (),
                    Nb=4, dt=5e-3, Rm=1.2, dtype="float64",
                    v_table=v_table, wf_table=wf_table, Nmax=2000,
                    potential="aziz2", n_walkers=2)
    system = make_system(cfg)
    tables = make_tables(system)
    key = jax.random.key(7)
    L = system.geo.Lbox[0] if not trap else 2.0
    R = L * (jax.random.uniform(key, (cfg.M, Np, dim), jnp.float64) - 0.5)
    return cfg, system, tables, R


def _brute_pot_f2_one_particle(system, tables, R, x, ip):
    """Reference UpdatePot semantics for ONE bead: potential sum over
    partners of particle ip at position x, and |F_ip|^2 with F_ip the moved
    particle's own pair-force vector (vpi_mod.f90:2697-2836).
    Pure-numpy transcription of the scalar Fortran loops."""
    from pathintegralgroundstate_tpu.models import jastrow as jas
    cfg, geo = system.cfg, system.geo
    R = np.asarray(R)
    x = np.asarray(x)
    xij = x[None, :] - R  # [N, D]
    if not cfg.trap:
        L = np.asarray(geo.Lbox)
        xij = np.where(xij > L / 2, xij - L, xij)
        xij = np.where(xij < -L / 2, xij + L, xij)
    rij2 = (xij ** 2).sum(-1)
    keep = np.arange(R.shape[0]) != ip
    if not cfg.trap:
        keep &= rij2 <= geo.rcut2
    r = np.sqrt(np.where(keep, rij2, 1.0))
    v = np.asarray(system.potential.v(jnp.asarray(r)))
    dv = np.asarray(system.potential.dvdr(jnp.asarray(r)))
    pot = float(np.sum(np.where(keep, v, 0.0)))
    F = np.sum(np.where(keep, dv / r, 0.0)[:, None] * xij, axis=0)
    if cfg.trap:
        pot += float(jas.trap_pot(cfg.a_ho, jnp.asarray(x)))
        F += np.asarray(jas.trap_pot_grad(cfg.a_ho, jnp.asarray(x)))
    return pot, F


@pytest.mark.parametrize("trap", [False, True])
def test_delta_pot_vs_brute(trap):
    cfg, system, tables, paths = _setup(trap=trap)
    ip = 3
    ib = jnp.array([0, 1, 2, 5])
    R = paths[ib]                       # [B, N, D]
    xold = R[:, ip, :]
    key = jax.random.key(1)
    xnew = xold + 0.05 * jax.random.normal(key, xold.shape, jnp.float64)
    dpot, df2 = delta_pot(system, tables, R, xnew, xold, ip, with_force=True)
    for b in range(len(ib)):
        pn, Fn = _brute_pot_f2_one_particle(system, tables, R[b], xnew[b], ip)
        po, Fo = _brute_pot_f2_one_particle(system, tables, R[b], xold[b], ip)
        np.testing.assert_allclose(float(dpot[b]), pn - po, rtol=1e-6)
        np.testing.assert_allclose(float(df2[b]),
                                   (Fn ** 2).sum() - (Fo ** 2).sum(), rtol=1e-6)


def test_delta_wf_matches_logpsi_difference():
    cfg, system, tables, paths = _setup()
    from pathintegralgroundstate_tpu.ops.total_action import log_trial_wf
    ip = 2
    R = paths[0]
    xold = R[ip]
    xnew = xold + jnp.array([0.03, -0.02, 0.04])
    dwf = delta_wf(system, tables, R[None], xnew[None], xold[None], ip)[0]
    lw_old = log_trial_wf(system, tables, R)
    lw_new = log_trial_wf(system, tables, R.at[ip].set(xnew))
    np.testing.assert_allclose(float(dwf), float(lw_new - lw_old), rtol=1e-9)


def test_delta_action_consistent_with_interaction_action_V_and_WF():
    """For a single-bead displacement, delta_action's V and WF parts must
    equal the difference of the global interaction action (the F2 part uses
    the reference's single-particle bookkeeping and is tested separately)."""
    cfg, system, tables, paths = _setup()
    cfg0 = cfg
    ip, ib = 4, 2  # even bead => no F2 weight, no WF term
    xold = paths[ib, ip]
    xnew = xold + jnp.array([0.02, 0.01, -0.03])
    dS = delta_action(system, tables, paths[ib][None], xnew[None], xold[None],
                      ip, jnp.array([ib]))[0]
    S_old = interaction_action(system, tables, paths)
    S_new = interaction_action(system, tables,
                               paths.at[ib, ip].set(xnew))
    np.testing.assert_allclose(float(dS), float(S_new - S_old), rtol=1e-8)

    # end bead => WF term enters, still even parity (ib=0)
    ip, ib = 1, 0
    xold = paths[ib, ip]
    xnew = xold + jnp.array([-0.02, 0.02, 0.01])
    dS = delta_action(system, tables, paths[ib][None], xnew[None], xold[None],
                      ip, jnp.array([ib]))[0]
    S_old = interaction_action(system, tables, paths)
    S_new = interaction_action(system, tables, paths.at[ib, ip].set(xnew))
    np.testing.assert_allclose(float(dS), float(S_new - S_old), rtol=1e-8)


def test_pair_pot_full_force():
    """pair_pot's F2 equals the brute-force total |F|^2
    (PotentialEnergy, sample_mod.f90:137-147)."""
    cfg, system, tables, paths = _setup()
    R = paths[1]
    pot, f2 = pair_pot(system, tables, R, with_force=True)
    N = cfg.Np
    Fb = np.zeros((N, cfg.dim))
    pot_b = 0.0
    for i in range(N):
        p_i, F_i = _brute_pot_f2_one_particle(system, tables, R, R[i], i)
        Fb[i] = F_i
        pot_b += p_i
    np.testing.assert_allclose(float(pot), 0.5 * pot_b, rtol=1e-8)
    np.testing.assert_allclose(float(f2), (Fb ** 2).sum(), rtol=1e-7)


def test_action_gradient_vs_finite_difference():
    cfg, system, tables, paths = _setup(Np=4)
    g = grad_action(system, tables, paths)
    f = lambda p: float(total_action(system, tables, p))
    rng = np.random.default_rng(3)
    h = 1e-6
    for _ in range(6):
        ib = rng.integers(0, cfg.M)
        ip = rng.integers(0, cfg.Np)
        k = rng.integers(0, cfg.dim)
        e = jnp.zeros_like(paths).at[ib, ip, k].set(h)
        fd = (f(paths + e) - f(paths - e)) / (2 * h)
        np.testing.assert_allclose(float(g[ib, ip, k]), fd, rtol=2e-4, atol=1e-7)


def test_tables_match_closed_form():
    """Parity mode: table-interpolated action deltas approach closed form."""
    _, system_c, tables_c, paths = _setup(Np=6)
    cfg_t, system_t, tables_t, _ = _setup(Np=6, v_table=True, wf_table=True)
    ip = 2
    ib = jnp.array([0, 3])
    R = paths[ib]
    xold = R[:, ip, :]
    xnew = xold + 0.04
    dS_c = delta_action(system_c, tables_c, R, xnew, xold, ip, ib)
    dS_t = delta_action(system_t, tables_t, R, xnew, xold, ip, ib)
    np.testing.assert_allclose(np.asarray(dS_t), np.asarray(dS_c),
                               rtol=2e-2, atol=5e-4)


def test_delta_action_sum_equals_dense():
    """The optimized parity-split window sum must equal the dense form."""
    from pathintegralgroundstate_tpu.ops.pairwise import delta_action_sum
    cfg, system, tables, paths = _setup(Np=6)
    ip = 2
    key = jax.random.key(9)
    for ii, B, rev in [(0, 5, False), (3, 4, False), (0, cfg.M, False),
                       (2, 6, True), (0, 1, False)]:
        ib = jnp.arange(ii, ii + B)
        if rev:
            ib = ib[::-1]
        R = paths[ib]
        xold = R[:, ip, :]
        key, k = jax.random.split(key)
        xnew = xold + 0.03 * jax.random.normal(k, xold.shape, jnp.float64)
        dense = jnp.sum(delta_action(system, tables, R, xnew, xold, ip, ib))
        fast = delta_action_sum(system, tables, R, xnew, xold, ip, ib)
        np.testing.assert_allclose(float(fast), float(dense), rtol=1e-10)
