"""The Chin-action F^2 term: reference semantics vs exact field difference.

The reference's UpdatePot returns dF2 = |F_ip^new|^2 - |F_ip^old|^2 for the
MOVED particle only (vpi_mod.f90:2825-2836), omitting the partners' force
changes.  That Delta-S is NOT the difference of any configuration function:
summing it around a closed cycle of single-particle moves does not return
to zero, so the Metropolis chain samples a move-mix-dependent distortion of
the nominal 4th-order measure.  cfg.exact_f2 switches delta_pot to the
exact field difference F^2(R') - F^2(R) with F^2 = sum_i |F_i|^2 — a
conservative Delta-S by construction.

These tests pin both facts quantitatively.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.ops.pairwise import delta_pot, pair_pot
from pathintegralgroundstate_tpu.system import make_system, make_tables


def _mk(Np=8, exact=True, seed=0):
    cfg = SimConfig(dim=3, Np=Np, density=0.3, dt=5e-3, Nb=4, Rm=1.2,
                    dtype="float64", potential="aziz2", n_walkers=1,
                    exact_f2=exact)
    system = make_system(cfg)
    tables = make_tables(system)
    L = system.geo.Lbox[0]
    key = jax.random.key(seed)
    # spread-out configuration (no hard-core overlap): jittered lattice
    n = int(np.ceil(Np ** (1 / 3)))
    grid = (np.stack(np.meshgrid(*[np.arange(n)] * 3), -1)
            .reshape(-1, 3)[:Np] + 0.5) / n * L - L / 2
    R = jnp.asarray(grid) + 0.05 * jax.random.normal(key, (Np, 3))
    return system, tables, R[None, None]  # [W=1, B=1, N, D]


def _df2(system, tables, R, xnew, xold, ip):
    _, df2 = delta_pot(system, tables, R, xnew, xold, ip, with_force=True)
    return float(df2[0, 0])


def test_exact_f2_equals_field_difference():
    """cfg.exact_f2 reproduces the brute-force F^2(R') - F^2(R)."""
    system, tables, R = _mk(exact=True)
    xold = R[:, :, 3]
    xnew = xold + 0.11
    got = _df2(system, tables, R, xnew, xold, 3)
    Rp = R.at[:, :, 3].set(xnew)
    _, f2n = pair_pot(system, tables, Rp, with_force=True)
    _, f2o = pair_pot(system, tables, R, with_force=True)
    np.testing.assert_allclose(got, float((f2n - f2o)[0, 0]), rtol=1e-10)


def test_exact_f2_n2_is_twice_partial():
    """N=2, pure pair forces: F_2 = -F_1 (Newton's third law), so the exact
    Delta(sum_i |F_i|^2) is exactly TWICE the reference's moved-particle
    delta — the minimal case where the omission is visible."""
    sys_p, tab_p, R = _mk(Np=2, exact=False)
    sys_e, tab_e, _ = _mk(Np=2, exact=True)
    xold = R[:, :, 0]
    xnew = xold + 0.07
    d_partial = _df2(sys_p, tab_p, R, xnew, xold, 0)
    d_exact = _df2(sys_e, tab_e, R, xnew, xold, 0)
    assert abs(d_partial) > 1e-12
    np.testing.assert_allclose(d_exact, 2.0 * d_partial, rtol=1e-10)


def test_cached_matches_brute_exact():
    """delta_pot_cached (O(N) incremental form) == the brute-force field
    difference, and its dfield increment reproduces the new field exactly."""
    from pathintegralgroundstate_tpu.ops.pairwise import (delta_pot_cached,
                                                          force_field)

    system, tables, R = _mk(Np=8, exact=True, seed=4)
    # window of B=3 displaced beads (same config replicated, varied moves)
    R3 = jnp.concatenate([R, R + 0.01, R - 0.02], axis=1)     # [1, 3, N, D]
    ip = 5
    xold = R3[:, :, ip]
    xnew = xold + jnp.asarray([[0.08, -0.03, 0.05],
                               [-0.06, 0.04, 0.02],
                               [0.03, 0.07, -0.04]])[None]
    dpot_b, df2_b = delta_pot(system, tables, R3, xnew, xold, ip,
                              with_force=True)
    fold = force_field(system, tables, R3)
    dpot_c, df2_c, dfield = delta_pot_cached(system, tables, R3, xnew, xold,
                                             ip, fold)
    np.testing.assert_allclose(np.asarray(dpot_c), np.asarray(dpot_b),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(df2_c), np.asarray(df2_b),
                               rtol=1e-9)
    Rn = R3.at[:, :, ip].set(xnew)
    np.testing.assert_allclose(np.asarray(fold + dfield),
                               np.asarray(force_field(system, tables, Rn)),
                               rtol=1e-9, atol=1e-12)


def test_cached_sweep_matches_brute_trajectory():
    """A full He-4 block with exact_f2: the cached path (f2_cache=True) and
    the brute-force path (False) must produce the SAME trajectory (same
    randomness, same Delta-S up to fp roundoff) — the end-to-end gate on
    every cache slice/update in the fused sweep."""
    from pathintegralgroundstate_tpu.state import init_state
    from pathintegralgroundstate_tpu.sweep import Sweeper, run_block, \
        zero_stats
    from pathintegralgroundstate_tpu.system import make_system, make_tables
    import jax

    outs = []
    for cache in (True, False):
        cfg = SimConfig(dim=3, Np=6, density=0.3, dt=5e-3, Nb=8,
                        sampling="bis", Nlev=2, Nstag=2, CMFreq=1,
                        delta_cm=0.1, Rm=1.2, swapping=False, CWorm=0.0,
                        Nobdm=0, n_walkers=4, dtype="float64",
                        potential="aziz2", exact_f2=True, f2_cache=cache,
                        smart_mc=0.05, seed=3, Nstep=3)
        system = make_system(cfg)
        tables = make_tables(system)
        sweeper = Sweeper(system, tables)
        assert sweeper.fused_diag
        state = init_state(system)
        state, _ = jax.jit(lambda s: run_block(system, tables, sweeper,
                                               s, 3))(state)
        outs.append(np.asarray(state.paths))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-8, atol=1e-10)


def test_cached_sweep_matches_brute_trajectory_production():
    """Round-4 gate on VERDICT r3 item 1: the cache must ride the PRODUCTION
    configuration — the unfused reference-order sweep (fused_sweep=False,
    the flagship default) WITH the worm phase (open/close, half-chain moves,
    swap) — and still reproduce the brute-force trajectory and acceptance
    counters exactly."""
    from pathintegralgroundstate_tpu.state import init_state
    from pathintegralgroundstate_tpu.sweep import Sweeper, run_block
    from pathintegralgroundstate_tpu.system import make_system, make_tables
    import jax

    for sampling in ("bis", "sta"):
        outs = []
        for cache in (True, False):
            cfg = SimConfig(dim=3, Np=6, density=0.3, dt=5e-3, Nb=8,
                            sampling=sampling, Nlev=2, Lstag=4, Nstag=2,
                            CMFreq=1, delta_cm=0.1, Rm=1.2, swapping=True,
                            CWorm=0.5, Nobdm=2, n_walkers=8,
                            dtype="float64", potential="aziz2",
                            exact_f2=True, f2_cache=cache,
                            fused_sweep=False, seed=3, Nstep=3)
            system = make_system(cfg)
            tables = make_tables(system)
            sweeper = Sweeper(system, tables)
            assert not sweeper.fused_diag
            state = init_state(system)
            state, stats = jax.jit(
                lambda s: run_block(system, tables, sweeper, s, 3))(state)
            outs.append((np.asarray(state.paths), np.asarray(state.xend),
                         np.asarray(stats.counters)))
        np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-8,
                                   atol=1e-10, err_msg=sampling)
        np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-8,
                                   atol=1e-10)
        np.testing.assert_array_equal(outs[0][2], outs[1][2])


def test_mcmillan_c1_continuous_at_rcut():
    """'mcmillan_c1' trial WF: u and u' vanish continuously at rcut, so the
    truncated psi_T has no delta-shell Laplacian terms and the mixed
    estimator is unbiased (the bare 'mcmillan' + rcut truncation jumps by
    u(rc), u'(rc) — the reference's estimator omits those distributional
    terms, a ~-0.5 K/atom He-4 bias; docs/VALIDATION.md)."""
    cfg = SimConfig(dim=3, Np=8, density=0.3, dt=5e-3, Nb=4, Rm=1.2,
                    dtype="float64", potential="aziz2", n_walkers=1,
                    jastrow="mcmillan_c1")
    system = make_system(cfg)
    rc = system.geo.rcut
    r = jnp.asarray(rc)
    np.testing.assert_allclose(float(system.u(r)), 0.0, atol=1e-14)
    np.testing.assert_allclose(float(system.du(r)), 0.0, atol=1e-14)
    # away from rcut the shape is the McMillan one shifted by a linear term
    from pathintegralgroundstate_tpu.models import jastrow as jas
    r2 = jnp.asarray(0.5 * rc)
    expect = (jas.mcmillan_u(cfg.Rm, r2) - jas.mcmillan_u(cfg.Rm, rc)
              - jas.mcmillan_du(cfg.Rm, rc) * (r2 - rc))
    np.testing.assert_allclose(float(system.u(r2)), float(expect),
                               rtol=1e-12)


def test_partial_f2_is_not_conservative_exact_is():
    """Sum Delta-F^2 around a closed 3-leg cycle of single-particle moves
    (particle 0 then particle 1 then both back).  The exact form returns to
    zero; the reference's partial form does not — the defect that biases
    its sampled measure."""
    system_p, tables_p, R0 = _mk(exact=False, seed=2)
    system_e, tables_e, _ = _mk(exact=True, seed=2)
    d0 = jnp.asarray([0.09, -0.04, 0.06])
    d1 = jnp.asarray([-0.05, 0.08, 0.03])

    def cycle(system, tables):
        total = 0.0
        R = R0
        # leg 1: move particle 0 by d0
        x0 = R[:, :, 0]
        total += _df2(system, tables, R, x0 + d0, x0, 0)
        R = R.at[:, :, 0].set(x0 + d0)
        # leg 2: move particle 1 by d1
        x1 = R[:, :, 1]
        total += _df2(system, tables, R, x1 + d1, x1, 1)
        R = R.at[:, :, 1].set(x1 + d1)
        # legs 3+4: undo both
        x0 = R[:, :, 0]
        total += _df2(system, tables, R, x0 - d0, x0, 0)
        R = R.at[:, :, 0].set(x0 - d0)
        x1 = R[:, :, 1]
        total += _df2(system, tables, R, x1 - d1, x1, 1)
        return total

    loop_exact = cycle(system_e, tables_e)
    loop_partial = cycle(system_p, tables_p)
    assert abs(loop_exact) < 1e-9, loop_exact
    assert abs(loop_partial) > 1e-6, (
        "expected the reference's partial dF2 to be path-dependent; "
        f"got cycle sum {loop_partial}")
