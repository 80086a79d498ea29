"""Variational-parameter gradients (SURVEY.md §7 north star; VERDICT r4
task 5): (Rm, a_ho) as explicit differentiable arguments of the trial WF,
the local energy, and the full 4th-order action."""

import jax
import jax.numpy as jnp
import numpy as np

from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.ops import estimators as est
from pathintegralgroundstate_tpu.ops import variational as var
from pathintegralgroundstate_tpu.state import init_state
from pathintegralgroundstate_tpu.system import make_system, make_tables


def _he4(Np=8, Nb=4, jastrow="mcmillan_c1"):
    cfg = SimConfig(dim=3, Np=Np, density=0.365, dt=5e-3, Nb=Nb,
                    sampling="sta", Lstag=4, Nstag=1, n_walkers=4,
                    dtype="float64", potential="aziz2", jastrow=jastrow,
                    seed=3)
    system = make_system(cfg)
    return system, make_tables(system), init_state(system)


def test_local_energy_params_matches_estimator():
    """At Rm == cfg.Rm the parameterized local energy must equal the
    sampler's estimator exactly (same closed forms)."""
    system, tables, st = _he4()
    R = st.paths[0, 0]
    e0 = est.local_energy(system, tables, R)
    e1 = var.local_energy_params(system, R, jnp.asarray(system.cfg.Rm))
    for a, b in zip(e0, e1):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-12)


def test_grad_action_wrt_rm_matches_fd():
    """d S / d Rm by autodiff vs central finite differences."""
    system, tables, st = _he4()
    pw = st.paths[0]
    Rm0 = 1.2
    f = lambda rm: var.total_action_params(system, pw, rm)
    g = float(jax.grad(f)(jnp.asarray(Rm0)))
    h = 1e-5
    fd = (float(f(jnp.asarray(Rm0 + h))) - float(f(jnp.asarray(Rm0 - h)))) \
        / (2 * h)
    assert abs(g - fd) < 1e-5 * max(abs(fd), 1.0), (g, fd)
    assert abs(g) > 1e-3  # Rm actually enters (end-slice trial WF)


def test_grad_action_wrt_aho_matches_fd():
    """Trap geometry: d S / d a_ho by autodiff vs finite differences."""
    cfg = SimConfig(dim=2, Np=3, trap=True, a_ho=(1.0, 1.0), dt=0.05, Nb=3,
                    sampling="sta", Lstag=2, Nstag=1, n_walkers=2,
                    dtype="float64", potential="none", jastrow="none",
                    seed=5)
    system = make_system(cfg)
    st = init_state(system)
    pw = st.paths[0]
    f = lambda a: var.total_action_params(system, pw, jnp.asarray(1.2),
                                          a_ho=a)
    a0 = jnp.asarray([1.0, 1.0])
    g = np.asarray(jax.grad(f)(a0))
    h = 1e-5
    for k in range(2):
        ap = a0.at[k].add(h)
        am = a0.at[k].add(-h)
        fd = (float(f(ap)) - float(f(am))) / (2 * h)
        assert abs(g[k] - fd) < 1e-5 * max(abs(fd), 1.0), (k, g[k], fd)
    assert np.abs(g).max() > 1e-3


def test_grad_vmc_energy_matches_fd():
    """d E_V / d Rm of the reweighted VMC energy vs finite differences."""
    system, tables, st = _he4(Np=6)
    # equilibrate the slice batch under |psi|^2 first (the fresh uniform
    # placement has hard-core overlaps with E_L ~ 1e11 where FD loses all
    # of its significant digits)
    Rs, _ = var.vmc_sweep(system, jax.random.key(1), st.paths[:, 0],
                          jnp.asarray(1.2), 0.3, nsweeps=40)
    Rm0 = jnp.asarray(1.2)
    f = lambda rm: var.vmc_energy(system, Rs, rm, Rm_ref=Rm0)
    g = float(jax.grad(f)(Rm0))
    h = 1e-5
    fd = (float(f(Rm0 + h)) - float(f(Rm0 - h))) / (2 * h)
    assert abs(g - fd) < 1e-4 * max(abs(fd), abs(g), 1.0), (g, fd)


def test_vmc_optimization_moves_toward_optimum():
    """A few gradient steps from a deliberately bad Rm must move toward the
    literature optimum (~1.2 sigma) and lower the variational energy."""
    system, tables, st = _he4(Np=8)
    key = jax.random.key(0)
    Rs = st.paths[:, 0]
    # equilibrate the slice ensemble under |psi_1.0|^2
    Rm = 1.00
    Rs, acc = var.vmc_sweep(system, key, Rs, jnp.asarray(Rm), 0.3,
                            nsweeps=40)
    assert 0.1 < float(acc) < 0.99
    E0 = float(var.vmc_energy(system, Rs, jnp.asarray(Rm)))
    gfn = jax.jit(jax.grad(lambda rm, Rs: var.vmc_energy(system, Rs, rm)))
    for it in range(6):
        g = float(gfn(jnp.asarray(Rm), Rs))
        Rm = float(np.clip(Rm - 0.05 * np.sign(g), 0.8, 1.6))
        key, k2 = jax.random.split(key)
        Rs, _ = var.vmc_sweep(system, k2, Rs, jnp.asarray(Rm), 0.3,
                              nsweeps=10)
    E1 = float(var.vmc_energy(system, Rs, jnp.asarray(Rm)))
    assert Rm > 1.05, Rm  # moved toward the optimum from below
    assert E1 < E0 + 0.5  # energy did not blow up (stochastic, loose)


def test_aho_optimization_exact_optimum():
    """a_ho as a GENUINE variational parameter (WF-only; the trap
    Hamiltonian stays at cfg.a_ho): for the ideal trapped gas the exact
    variational energy is E(a)/N = (d/4)(1/a^2 + a^2/a_t^4), minimized at
    a = a_t with E/N = d/2.  Gradient descent from a bad a must converge
    onto the trap length, and the analytic curve must match."""
    cfg = SimConfig(dim=2, Np=4, trap=True, a_ho=(1.0, 1.0), dt=0.05, Nb=2,
                    sampling="sta", Lstag=2, Nstag=1, n_walkers=256,
                    potential="none", jastrow="none", dtype="float64",
                    seed=13)
    system = make_system(cfg)
    key = jax.random.key(2)
    Rs = 0.7 * jax.random.normal(key, (256, cfg.Np, 2), jnp.float64)

    def E_of(a):
        # sample |psi_a|^2 fresh, then the estimator is exact-on-average
        k = jax.random.key(5)
        R2, _ = var.vmc_sweep(system, k, Rs, jnp.asarray(1.2), 0.7,
                              nsweeps=120, a_ho=jnp.asarray([a, a]))
        return float(var.vmc_energy(system, R2, jnp.asarray(1.2),
                                    a_ho=jnp.asarray([a, a]))) / cfg.Np

    # analytic check at two points: E(a)/N = (d/4)(1/a^2 + a^2)
    for a in (1.0, 1.4):
        exact = 0.5 * (1.0 / a ** 2 + a ** 2)
        assert abs(E_of(a) - exact) < 0.07, (a, E_of(a), exact)

    # gradient descent on a from 1.4 -> ~1.0
    import jax.numpy as _jnp
    gfn = jax.jit(jax.grad(lambda a, Rs: var.vmc_energy(
        system, Rs, _jnp.asarray(1.2), a_ho=_jnp.stack([a, a]))))
    a = 1.4
    k = jax.random.key(9)
    R2 = Rs
    for _ in range(25):
        k, k2 = jax.random.split(k)
        R2, _ = var.vmc_sweep(system, k2, R2, jnp.asarray(1.2), 0.5,
                              nsweeps=5, a_ho=jnp.asarray([a, a]))
        g = float(gfn(jnp.asarray(a), R2)) / cfg.Np
        a = float(np.clip(a - 0.1 * np.clip(g, -1, 1), 0.6, 2.0))
    assert abs(a - 1.0) < 0.12, a
