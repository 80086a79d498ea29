"""Sampler integration tests (SURVEY.md §4 'Statistical/integration').

The harmonic-oscillator config is the reference's own implicit sanity check
(system_mod.f90:213-252 trap terms; README.md:9 cites Sarsa et al. who
validated on exactly this system): with the exact Gaussian trial WF the
mixed estimator must give E0 = d/2 (hbar=m=omega=1, a_ho=1) with zero
variance, and the thermodynamic estimator must agree within error bars.

Note: jit-compiling the sweep is expensive on the CI CPU (~1-2 min per
distinct config), so tests share cached simulation runs per config.
"""

import functools

import jax
import numpy as np
import pytest

from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.state import init_state
from pathintegralgroundstate_tpu.sweep import _CIDX, Sweeper, run_block
from pathintegralgroundstate_tpu.system import make_system, make_tables


def _ho_cfg(**kw):
    base = dict(dim=1, Np=1, trap=True, a_ho=(1.0,), potential="none",
                sampling="sta", Lstag=8, Nlev=2, Nstag=2, Nb=8, dt=0.05,
                CMFreq=1, delta_cm=0.5, n_walkers=64, Nstep=20,
                dtype="float64", CWorm=0.0, Nobdm=0, seed=11)
    base.update(kw)
    return SimConfig(**base)


@functools.lru_cache(maxsize=None)
def _run_blocks(cfg, nblocks):
    system = make_system(cfg)
    tables = make_tables(system)
    sweeper = Sweeper(system, tables)
    state = init_state(system)
    blk = jax.jit(lambda st: run_block(system, tables, sweeper, st, cfg.Nstep))
    results = []
    for _ in range(nblocks):
        state, stats = blk(state)
        results.append(jax.tree.map(np.asarray, stats))
    return system, state, results


@pytest.mark.parametrize("sampling", ["sta", "bis"])
def test_ho_ground_state_energy(sampling):
    cfg = _ho_cfg(sampling=sampling)
    system, state, results = _run_blocks(cfg, 3)
    stats = results[-1]
    nd = float(stats.n_diag)
    assert nd == cfg.Nstep * cfg.n_walkers  # no worm => all diagonal
    E = float(stats.sumE) / nd
    # exact trial WF => mixed estimator exact, zero variance
    np.testing.assert_allclose(E, 0.5 * cfg.dim, rtol=1e-10)
    E2 = float(stats.sumE2) / nd
    assert abs(E2 - E * E) < 1e-10

    Et = float(stats.sumEt) / nd
    vart = np.sqrt(max(float(stats.sumEt2) / nd - Et * Et, 0.0) / nd)
    # thermodynamic estimator: agreement within ~5 sigma + dt^2 bias margin
    assert abs(Et - 0.5 * cfg.dim) < 5 * vart + 0.02


def test_ho_density_width():
    """Central-bead density must follow |psi_0|^2 = N(0, 1/2)."""
    cfg = _ho_cfg()
    system, state, results = _run_blocks(cfg, 3)
    x = np.asarray(state.paths[:, cfg.Nb, 0, 0])
    assert abs(np.mean(x)) < 0.45
    np.testing.assert_allclose(np.mean(x ** 2), 0.5, atol=0.25)


def test_ho_3d():
    cfg = _ho_cfg(dim=3, a_ho=(1.0, 1.0, 1.0), n_walkers=16, Nstep=10)
    system, state, results = _run_blocks(cfg, 2)
    stats = results[-1]
    nd = float(stats.n_diag)
    E = float(stats.sumE) / nd
    np.testing.assert_allclose(E, 1.5, rtol=1e-10)


def test_acceptance_counters_sane():
    cfg = _ho_cfg()
    system, state, results = _run_blocks(cfg, 3)
    c = np.asarray(results[-1].counters)
    W, Np, Nstep, Nstag = cfg.n_walkers, cfg.Np, cfg.Nstep, cfg.Nstag
    assert c[_CIDX["try_cm"]] == W * Np * Nstep
    assert c[_CIDX["try_stag"]] == W * Np * Nstep * Nstag
    for a, t in (("acc_cm", "try_cm"), ("acc_bd", "try_stag"),
                 ("acc_head", "try_stag"), ("acc_tail", "try_stag")):
        assert 0 < c[_CIDX[a]] <= c[_CIDX[t]]


def test_reproducible():
    cfg = _ho_cfg()
    system = make_system(cfg)
    tables = make_tables(system)
    sweeper = Sweeper(system, tables)
    blk = jax.jit(lambda st: run_block(system, tables, sweeper, st, 5))
    s1, r1 = blk(init_state(system))
    s2, r2 = blk(init_state(system))
    np.testing.assert_array_equal(np.asarray(s1.paths), np.asarray(s2.paths))
    assert float(r1.sumE) == float(r2.sumE)


def test_free_bosons_pbc_energy():
    """Free particles in a PBC box: psi_T = 1 (vanishing Jastrow) is the
    exact ground state, so the mixed estimator is exactly 0 and the
    thermodynamic estimator must agree statistically — an end-to-end check
    of the spring terms, Chin weights, and staging moves under PBC.

    Box chosen so the single-image approximation (shared with the
    reference's staging, vpi_mod.f90:517-529) is negligible:
    window-end displacement sigma = sqrt(Lstag*dt) << L/2."""
    cfg = SimConfig(dim=3, Np=4, density=0.02, potential="none", Rm=1e-3,
                    sampling="sta", Lstag=8, Nstag=2, Nb=8, dt=0.02,
                    CMFreq=1, delta_cm=0.3, n_walkers=64, Nstep=20,
                    dtype="float64", CWorm=0.0, seed=21)
    system, state, results = _run_blocks(cfg, 4)
    stats = results[-1]
    nd = float(stats.n_diag)
    E = float(stats.sumE) / nd
    assert abs(E) < 1e-8  # exact trial WF
    Et = float(stats.sumEt) / nd / cfg.Np
    vart = np.sqrt(max(float(stats.sumEt2) / nd - (Et * cfg.Np) ** 2, 0.0)
                   / nd) / cfg.Np
    # Et ~ 0 within 5 sigma + O(dt^2/volume) margin
    assert abs(Et) < 5 * vart + 0.05, (Et, vart)


def test_dipolar_2d_runs():
    """2-D dipolar Bose gas (BASELINE.json stretch config): the sampler and
    estimators must run and produce finite physical output in 2D."""
    cfg = SimConfig(dim=2, Np=8, density=0.1, potential="dipolar", Rm=1.0,
                    sampling="bis", Nlev=2, Lstag=4, Nstag=1, Nb=4, dt=0.01,
                    CMFreq=1, delta_cm=0.2, n_walkers=16, Nstep=5,
                    dtype="float64", CWorm=0.0, seed=2)
    system, state, results = _run_blocks(cfg, 2)
    stats = results[-1]
    nd = float(stats.n_diag)
    E = float(stats.sumE) / nd / cfg.Np
    Et = float(stats.sumEt) / nd / cfg.Np
    assert np.isfinite(E) and np.isfinite(Et)
    assert stats.gr.sum() > 0
    assert np.isfinite(np.asarray(stats.sk)).all()


def test_bridge_regrow_matches_scan():
    """The one-matmul Brownian-bridge regrow (cfg.regrow='bridge') is the
    staging recursion unrolled: same gaussians, same order, same linear
    combination — outputs must agree to fp roundoff (trap, no PBC wraps)."""
    import jax.numpy as jnp
    from pathintegralgroundstate_tpu.ops.moves import segment_regrow

    kw = dict(dim=3, Np=4, trap=True, a_ho=(1.0, 1.0, 1.0), potential="none",
              dt=0.05, Nb=8, n_walkers=32, dtype="float64", sampling="sta",
              Lstag=8, seed=3)
    outs = {}
    for mode in ("bridge", "scan"):
        cfg = SimConfig(regrow=mode, **kw)
        system = make_system(cfg)
        tables = make_tables(system)
        st = init_state(system, key=jax.random.key(1))
        # jitter beads so the segment isn't degenerate
        pk = jax.random.normal(jax.random.key(2), st.paths.shape) * 0.1
        paths = st.paths + pk
        W = cfg.n_walkers
        seg = paths[:, :9, 0, :]
        R_seg = paths[:, :9]
        ib_seg = jnp.broadcast_to(jnp.arange(9), (W, 9))
        Ls = jax.random.randint(jax.random.key(4), (W,), 2, 9)
        outs[mode] = segment_regrow(
            system, tables, jax.random.key(5), seg, R_seg, ib_seg, 0, Ls,
            "gauss", 1.0, start_parity=0)
    for a, b in zip(outs["bridge"], outs["scan"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-12)


def test_nlev1_unfused_bisection_runs():
    """Regression (round-4 review): the batched-randoms blocks must be
    sized for the END moves' clamped depth max(Nlev, 2) — Nlev=1 (the
    config default) crashed at trace time when the blocks were sized by
    Nlev alone."""
    import jax

    from pathintegralgroundstate_tpu.config import SimConfig
    from pathintegralgroundstate_tpu.state import init_state
    from pathintegralgroundstate_tpu.sweep import Sweeper, run_block
    from pathintegralgroundstate_tpu.system import make_system, make_tables

    cfg = SimConfig(dim=3, Np=4, density=0.3, dt=5e-3, Nb=4,
                    sampling="bis", Nlev=1, Nstag=1, CMFreq=1,
                    delta_cm=0.1, Rm=1.2, n_walkers=8, dtype="float64",
                    potential="aziz2", fused_sweep=False, seed=3)
    system = make_system(cfg)
    tables = make_tables(system)
    sweeper = Sweeper(system, tables)
    state = init_state(system)
    state, stats = jax.jit(
        lambda s: run_block(system, tables, sweeper, s, 2))(state)
    c = np.asarray(stats.counters)
    assert c[0] > 0  # CM tries happened; the step compiled and ran


def test_monoshot_matches_per_level():
    """The one-dispatch monoshot bisection moves (cfg.bis_monoshot, VERDICT
    r4 task 1) must reproduce the per-level dispatch form EXACTLY given the
    same pre-drawn randoms: same hierarchy, same row Delta-S values, same
    accept chain — the fusion is a scheduling change, not a kernel change."""
    import jax.numpy as jnp

    from pathintegralgroundstate_tpu.ops import bisection as bis
    from pathintegralgroundstate_tpu.ops.pairwise import force_field

    for exact_f2 in (False, True):
        cfg = SimConfig(dim=3, Np=8, density=0.365, dt=5e-3, Nb=8,
                        sampling="bis", Nlev=2, Nstag=1, n_walkers=16,
                        dtype="float64", potential="aziz2", seed=5,
                        exact_f2=exact_f2)
        tables = make_tables(make_system(cfg))
        st = init_state(make_system(cfg))
        paths = st.paths
        W, L = 16, 2 ** cfg.Nlev
        key = jax.random.key(7)
        active = jnp.ones((W,), bool)
        fodd = force_field(make_system(cfg), tables, paths[:, 1::2]) \
            if exact_f2 else None
        g = jax.random.normal(jax.random.key(1), (W, L, 3), jnp.float64)
        u = jax.random.uniform(jax.random.key(2), (W, cfg.Nlev + 1),
                               jnp.float64)
        us = jax.random.uniform(jax.random.key(3), (), jnp.float64)
        cases = [
            ("interior", bis.bisection, (us, g, u)),
            ("head", bis.move_head_bisection, (None, g, u)),
            ("tail", bis.move_tail_bisection, (None, g, u)),
        ]
        for name, fn, rand in cases:
            outs = {}
            for mono in (True, False):
                s2 = make_system(cfg.replace(bis_monoshot=mono))
                kw = dict(rand=rand)
                if fodd is not None:
                    kw["fodd"] = fodd
                outs[mono] = fn(s2, tables, key, paths, 3, active, cfg.Nlev,
                                **kw)
            for x, y in zip(outs[True], outs[False]):
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), rtol=1e-12, atol=1e-14,
                    err_msg=f"{name}/exact_f2={exact_f2}")
            assert int(np.sum(np.asarray(outs[True][-1]))) > 0


def test_paired_end_bisections_bitwise():
    """paired_end_bisections (retired scheduling lever, kept tested):
    computing head+tail from the SAME pre-move paths with both writebacks
    applied afterward must be BITWISE identical to the sequential order —
    the two end windows are disjoint and non-adjacent, so neither move
    sees the other's writes."""
    import jax.numpy as jnp

    from pathintegralgroundstate_tpu.ops import bisection as bis

    cfg = SimConfig(dim=3, Np=8, density=0.365, dt=5e-3, Nb=20,
                    sampling="bis", Nlev=2, Nstag=1, n_walkers=16,
                    dtype="float64", potential="aziz2", seed=5)
    s = make_system(cfg)
    t = make_tables(s)
    paths = init_state(s).paths
    kh, kt = jax.random.key(1), jax.random.key(2)
    active = jnp.ones((16,), bool)
    p1, a_h1 = bis.move_head_bisection(s, t, kh, paths, 3, active, cfg.Nlev)
    p1, a_t1 = bis.move_tail_bisection(s, t, kt, p1, 3, active, cfg.Nlev)
    p2, a_h2, a_t2 = bis.paired_end_bisections(s, t, kh, kt, paths, 3,
                                               active, cfg.Nlev)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(a_h1), np.asarray(a_h2))
    np.testing.assert_array_equal(np.asarray(a_t1), np.asarray(a_t2))
    assert int(np.sum(np.asarray(a_h2))) > 0


def test_monoshot_composites_match_per_level():
    """The composite monoshot forms (_fused_ends_monoshot,
    _bisection_multi_monoshot) must also reproduce their per-level
    counterparts exactly under identical pre-drawn randoms — a misaligned
    accept column or a dropped tail row-flip would otherwise only face the
    (much weaker) distributional invariance tests."""
    import jax.numpy as jnp

    from pathintegralgroundstate_tpu.ops import bisection as bis

    cfg = SimConfig(dim=3, Np=8, density=0.365, dt=5e-3, Nb=10,
                    sampling="bis", Nlev=2, Nstag=1, n_walkers=16,
                    dtype="float64", potential="aziz2", seed=5)
    tables = make_tables(make_system(cfg))
    paths = init_state(make_system(cfg)).paths
    W, L, K = 16, 2 ** cfg.Nlev, 3
    key = jax.random.key(7)
    active = jnp.ones((W,), bool)
    g2 = jax.random.normal(jax.random.key(1), (W, 2, L, 3), jnp.float64)
    u2 = jax.random.uniform(jax.random.key(2), (W, 2, cfg.Nlev + 1),
                            jnp.float64)
    gK = jax.random.normal(jax.random.key(3), (W, K, L, 3), jnp.float64)
    uK = jax.random.uniform(jax.random.key(4), (W, K, cfg.Nlev + 1),
                            jnp.float64)
    us = jax.random.uniform(jax.random.key(5), (), jnp.float64)

    outs = {}
    for mono in (True, False):
        s2 = make_system(cfg.replace(bis_monoshot=mono))
        outs[mono] = bis.fused_end_bisections(
            s2, tables, key, paths, 3, active, cfg.Nlev,
            rand=(None, g2, u2))
    for a, b in zip(outs[True], outs[False]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-14,
                                   err_msg="fused ends")
    assert int(np.sum(np.asarray(outs[True][1]))) > 0

    outs = {}
    for mono in (True, False):
        s2 = make_system(cfg.replace(bis_monoshot=mono))
        outs[mono] = bis.bisection_multi(
            s2, tables, key, paths, [1, 4, 6], active, cfg.Nlev,
            rand=(us, gK, uK))
    for a, b in zip(outs[True], outs[False]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-14,
                                   err_msg="bisection_multi")
    assert int(np.sum(np.asarray(outs[True][1]))) > 0
