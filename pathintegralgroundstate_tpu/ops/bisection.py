"""Multilevel bisection moves (Bisection / MoveHeadBisection /
MoveTailBisection, vpi_mod.f90:864-1372), batched over the ensemble.

The reference's per-level Metropolis with early exit (vpi_mod.f90:960-969)
becomes a per-walker `alive` mask over a static level loop: a walker whose
level is rejected carries a dead mask (later proposals are computed but
discarded by the final restore), which generates the identical Markov
kernel — accept iff every level accepts, each level's proposal built on the
previous levels' updated beads.

TPU-native choices (all preserve detailed balance; see ops/moves.py notes):
  * every level's midpoint Delta-S is ONE fused all-bead pair kernel
    (ops/pairwise.delta_action_rows) with the Chin weights derived from the
    traced bead indices — no odd/even subset gymnastics;
  * the end-segment variants draw their random depth Nlev in [2, level]
    (vpi_mod.f90:1023) once per move site — shared across walkers — so a
    `lax.switch` dispatches to fully static per-depth implementations.
    (Sharing the depth across walkers leaves each walker's kernel the same
    mixture and the product stationary distribution exact; it only adds a
    negligible cross-walker correlation of proposal sizes.)

Exact-F^2 cache (cfg.exact_f2 + f2_cache): the cache holds the force field
at the ODD beads only — the only rows whose F^2 carries a Chin weight.
Bisection level ilev displaces beads at offsets 2^(nlev-ilev)*(2j+1) from
the even window start, so ONLY the last level touches odd beads: it is the
single cached kernel per move (its midpoints are exactly the window's odd
beads, one contiguous cache slice), applied at the end gated by the FINAL
alive mask — a walker rejected at any level leaves the cache untouched,
exactly matching the restored path.  All other levels (and the chain-end
gates, beads 0/2Nb, even) run need_f2=False: no force arithmetic, no cache
traffic, bitwise-identical dS (their F^2 weight is exactly zero).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..system import System, Tables
from .moves import _cache_win_write, _codd_window, _codd_window_rev, \
    _mi, _window_start, _wrap_pos, get_chain, metropolis, metropolis_u, \
    set_chain, _slice_beads, _update_beads
from .pairwise import delta_action, delta_action_rows


def _level_geometry(ilev: int, nlev: int):
    """Static midpoint geometry of bisection level ilev of nlev: the
    midpoints are the arithmetic sequence d2, d2+delta, .. (m points) —
    which means every level access is a STRIDED SLICE, never an
    integer-array gather (XLA lowers small-index gathers of the big paths
    array into full-array mini-gather passes — measured ~1.5 ms/level at
    W=4096 before this change)."""
    delta = 2 ** (nlev - ilev + 1)
    m = 2 ** (ilev - 1)
    return delta, m, delta // 2


def _strided_set(arr, upd, axis: int, d2: int, delta: int, L: int):
    """arr with positions d2, d2+delta, ... (inside [0, L)) along `axis`
    replaced by upd — via reshape + unit-index DUS (a strided .at[].set
    would lower to a serializing scatter)."""
    pre = arr.shape[:axis]
    post = arr.shape[axis + 1:]
    m = L // delta
    colon = (slice(None),) * axis
    body = arr[colon + (slice(0, L),)].reshape(pre + (m, delta) + post)
    body = body.at[colon + (slice(None), d2)].set(upd)
    tail = arr[colon + (slice(L, None),)]
    return jnp.concatenate(
        [body.reshape(pre + (L,) + post), tail], axis=axis)


def _level_proposal(system: System, key, seg, ilev: int, nlev: int,
                    g_rows=None):
    """Midpoint gaussian proposal of one level: returns
    (d2, delta, m, xold, xnew) with xold/xnew [..., m, D].

    seg [..., 2**nlev+1, D]; sigma = sqrt(dt_bis/2), dt_bis = delta*dt/2
    (vpi_mod.f90:905-907).

    g_rows [..., L, D] (optional): pre-drawn gaussians indexed by WINDOW
    POSITION — level ilev consumes rows d2::delta, so every displaced row
    owns exactly one gaussian and the levels partition the block (the
    batched-randoms hot path; key is ignored then).
    """
    dt = system.cfg.dt
    dtype = seg.dtype
    L = seg.shape[-2] - 1
    delta, m, d2 = _level_geometry(ilev, nlev)
    xold = seg[..., d2::delta, :]                  # midpoints   [..., m, D]
    xp = seg[..., 0:L:delta, :]                    # left anchors
    xn = seg[..., delta::delta, :]                 # right anchors
    if g_rows is not None:
        g = g_rows[..., d2::delta, :]
    else:
        g = jax.random.normal(key, xold.shape, dtype)
    sigma = jnp.sqrt(0.25 * delta * dt)
    xprev = xold + _mi(system, xp - xold)
    xnext = xold - _mi(system, xold - xn)
    xnew = _wrap_pos(system, 0.5 * (xprev + xnext) + sigma * g)
    return d2, delta, m, xold, xnew


# ---------------------------------------------------------------------------
# Monoshot level evaluation (round 5, VERDICT r4 task 1: fuse the move)
#
# The per-level Metropolis chain does NOT gate the hierarchy construction in
# this engine — a rejected level only marks the walker dead, the remaining
# levels still build (masked) proposals, and the single final writeback
# restores seg0 for dead walkers.  The construction is therefore a
# DETERMINISTIC function of (seg0, gaussians), every displaced row's Delta-S
# involves only that row's own (old, new) pair against the frozen partners,
# and the accept chain factorizes:
#
#     alive = active AND_k [ u_k < exp(-sum_{rows r of level k} dS_r) ]
#
# So the whole multilevel move collapses to: (1) build the full proposed
# window with a cheap elementwise level loop (no pair kernels), (2) evaluate
# ALL rows' dS in ONE fused pair kernel over the window, (3) segment-sum the
# rows by level (a tiny static matmul) and reduce the accepts.  This cuts a
# move's sequential pair-kernel chain from nlev(+1) dispatches to ONE —
# the per-move glue the round-4 phase accounting measured at ~3x over the
# window-traffic roofline (docs/VALIDATION.md).  Same draws, same row
# values, same accept semantics as the per-level rand path — regression-
# pinned in tests/test_sampler.py::test_monoshot_matches_per_level.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _dyadic_tables(level: int, dt: float):
    """The all-level bisection construction as a linear map (float64).

    Unrolling the dyadic recursion  y_p = 0.5 (y_prev + y_next) +
    sigma_lev g_p  (anchors y_0 = 0, y_L = u_L) gives

        y_p = c_p u_L + sum_q T[p, q] g_q ,   c_p = p / L,

    with T the dyadic bridge factor — the bisection-basis analogue of the
    staging Brownian-bridge matrix (ops/moves._bridge_tables).  Returns
    (T[L-1, L-1], c[L-1]) over interior positions 1..L-1 (T columns index
    the gaussian of the SAME window position, matching the rand path's
    row-indexed g blocks)."""
    L = 2 ** level
    T = np.zeros((L + 1, L + 1))
    c = np.zeros(L + 1)
    c[L] = 1.0
    for ilev in range(1, level + 1):
        delta = 2 ** (level - ilev + 1)
        sigma = math.sqrt(0.25 * delta * dt)
        for p in range(delta // 2, L, delta):
            prev, nxt = p - delta // 2, p + delta // 2
            T[p] = 0.5 * (T[prev] + T[nxt])
            T[p, p] += sigma
            c[p] = 0.5 * (c[prev] + c[nxt])
    return T[1:L, 1:L], c[1:L]


def _construct_levels(system: System, seg, level: int, L: int, g_rows):
    """Deterministic all-level bisection construction: the whole dyadic
    hierarchy as ONE bridge matmul in displacement space (unwrap the far
    anchor once, matmul, wrap once) — ~8 small elementwise kernels per
    move collapse to ~3.  Equivalent to the per-level loop below up to
    image choice at intermediate levels (per-level wraps pick box images
    mid-construction; all downstream pair math is image-invariant — the
    same argument as the staging bridge vs scan, ops/moves.segment_regrow)
    and to fp reassociation.  Works at any batch rank (window axis -2);
    g_rows indexed by window position (rand-path convention)."""
    dtype = seg.dtype
    Tnp, cnp = _dyadic_tables(level, system.cfg.dt)
    T = jnp.asarray(Tnp, dtype)
    c = jnp.asarray(cnp, dtype)
    x0 = seg[..., 0, :]
    uL = -_mi(system, x0 - seg[..., L, :])       # unwrapped (x_L - x_0)
    y = (c[:, None] * uL[..., None, :]
         + jnp.einsum("pq,...qd->...pd", T, g_rows[..., 1:L, :]))
    x = _wrap_pos(system, x0[..., None, :] + y)
    return seg.at[..., 1:L, :].set(x)


def _construct_levels_loop(system: System, seg, level: int, L: int, g_rows):
    """The literal per-level construction (reference order; regression
    anchor for _construct_levels' matmul form)."""
    ax = seg.ndim - 2
    for ilev in range(1, level + 1):
        d2, delta, m, _, xnew = _level_proposal(system, None, seg, ilev,
                                                level, g_rows=g_rows)
        seg = _strided_set(seg, xnew, ax, d2, delta, L)
    return seg


def _pos_level(p: int, level: int) -> int:
    """Bisection level (1-based) that displaces window position p."""
    for ilev in range(1, level + 1):
        delta = 2 ** (level - ilev + 1)
        if p % delta == delta // 2:
            return ilev
    raise ValueError(p)


@functools.lru_cache(maxsize=None)
def _level_assign(level: int, gate: bool):
    """Static [nrows, ngroups] 0/1 matrix mapping displaced window rows to
    their accept group: interior moves group rows 1..L-1 into `level`
    groups; end moves (gate=True) group rows 0..L-1 into 1 + level groups
    with the terminal-bead gate as group 0."""
    L = 2 ** level
    if gate:
        A = np.zeros((L, level + 1))
        A[0, 0] = 1.0
        for p in range(1, L):
            A[p, _pos_level(p, level)] = 1.0
    else:
        A = np.zeros((L - 1, level))
        for p in range(1, L):
            A[p - 1, _pos_level(p, level) - 1] = 1.0
    return A


def _monoshot_accept(active, rows, u_acc, level: int, gate: bool):
    """Per-level accept chain from the one-kernel row dS values."""
    A = jnp.asarray(_level_assign(level, gate), rows.dtype)
    dS_grp = rows @ A                       # [..., ngroups]
    return active & jnp.all(metropolis_u(u_acc, dS_grp), axis=-1)


def _draw_monoshot(key, W: int, L: int, ngrp: int, dim: int, dtype,
                   start_shape=None):
    """(u_start, g_rows [W, L, D], u_acc [W, ngrp]) — the same block shapes
    the batched-randoms path pre-draws (sweep.py draw()).  start_shape:
    None = no window draw; () = shared window; (W,) = per-walker windows."""
    ks = jax.random.split(key, 3)
    g = jax.random.normal(ks[0], (W, L, dim), dtype)
    u = jax.random.uniform(ks[1], (W, ngrp), dtype)
    s = (jax.random.uniform(ks[2], start_shape, dtype)
         if start_shape is not None else None)
    return s, g, u


def _bisection_monoshot(system: System, tables: Tables, key, paths, ip,
                        active, level: int, fodd=None, rand=None):
    """Interior bisection, one pair kernel for all levels (module note)."""
    M = system.M
    W = paths.shape[0]
    L = 2 ** level
    n_opts = (M - 1 - L) // 2 + 1
    if rand is None:
        rand = _draw_monoshot(
            key, W, L, level + 1, system.cfg.dim, paths.dtype,
            start_shape=() if system.cfg.shared_windows else (W,))
    u_start, g_rows, u_acc = rand
    ii = 2 * jnp.floor(u_start * n_opts).astype(jnp.int32)
    R_seg = _slice_beads(paths, ii, L + 1)
    seg0 = R_seg[:, :, ip, :]
    ib_seg = jnp.broadcast_to(
        jnp.expand_dims(ii, -1) + jnp.arange(L + 1), (W, L + 1))

    seg = _construct_levels(system, seg0, level, L, g_rows)
    xnew_rows, xold_rows = seg[:, 1:L], seg0[:, 1:L]
    dfield = None
    if fodd is not None:
        f_seg, _, k0 = _codd_window(fodd, ii, 0, L)
        rows, dfield = delta_action_rows(
            system, tables, R_seg[:, 1:L], xnew_rows, xold_rows, ip,
            ib_seg[:, 1:L], fold=f_seg, fold_sub=(0, 2), need_wf=False)
    else:
        rows = delta_action_rows(
            system, tables, R_seg[:, 1:L], xnew_rows, xold_rows, ip,
            ib_seg[:, 1:L], need_wf=False)
    alive = _monoshot_accept(active, rows, u_acc[:, 1:], level, gate=False)

    seg_fin = jnp.where(alive[:, None, None], seg, seg0)
    if jnp.ndim(ii) == 0:
        paths = lax.dynamic_update_slice(
            paths, seg_fin[:, :, None, :].astype(paths.dtype),
            (jnp.int32(0), ii, jnp.asarray(ip, jnp.int32), jnp.int32(0)))
    else:
        chain = get_chain(paths, ip)
        chain = _update_beads(chain, ii, seg_fin)
        paths = set_chain(paths, ip, chain)
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_seg, dfield, alive, k0)
        return paths, fodd, alive
    return paths, alive


def _end_bisection_monoshot(system: System, tables: Tables, key, paths, ip,
                            active, nlev: int, tail: bool, fodd=None,
                            rand=None, defer_write: bool = False):
    """End-segment bisection, one pair kernel for gate + all levels.

    defer_write=True returns (seg_fin, alive) instead of writing the
    window back — the paired-ends caller applies both ends' writebacks
    after computing both from the SAME input paths (valid because the two
    windows are disjoint/non-adjacent; see paired_end_bisections)."""
    cfg = system.cfg
    M = system.M
    dt = cfg.dt
    W = paths.shape[0]
    L = 2 ** nlev
    if rand is None:
        rand = _draw_monoshot(key, W, L, nlev + 1, cfg.dim, paths.dtype)
    _, g_rows, u_acc = rand

    if tail:
        # the partner block is fed in FORWARD bead order (the reversed view
        # [:, ::-1] materializes a window-sized copy per move — the rev
        # kernel was ~36 ms/step of the W=4096 profile); only the moved
        # particle's small [W, L+1, D] segment is reversed for the
        # construction, and the row outputs are mapped back by flipping
        # the level-assignment matrix
        R_fwd = paths[:, M - 1 - L:]                  # beads M-1-L .. M-1
        seg0 = R_fwd[:, :, ip, :][:, ::-1]            # reversed chain (small)
        if fodd is not None:
            f_seg, _, k_lo = _codd_window_rev(fodd, M - 1, 0, L)
    else:
        R_fwd = paths[:, : L + 1]
        seg0 = R_fwd[:, :, ip, :]
        if fodd is not None:
            f_seg, _, k_lo = _codd_window(fodd, 0, 0, L)
    dtype = seg0.dtype

    # free-gaussian terminal guess (vpi_mod.f90:1039-1076) consumes g row 0
    xold0 = seg0[:, 0]
    anchor = seg0[:, L]
    xmid = xold0 - _mi(system, xold0 - anchor)
    xnew0 = _wrap_pos(system, xmid + jnp.sqrt(L * dt) * g_rows[:, 0])
    seg = _construct_levels(system, seg0.at[:, 0].set(xnew0), nlev, L,
                            g_rows)

    dfield = None
    if tail:
        # forward window row r (r = 1..L, beads M-L..M-1) <-> reversed-
        # segment row L-r; rows 1..L of R_fwd are the displaced beads
        xnew_rows = seg[:, :L][:, ::-1]
        xold_rows = seg0[:, :L][:, ::-1]
        R_rows = R_fwd[:, 1:]
        ib_rows = jnp.broadcast_to(jnp.arange(M - L, M), (W, L))
        flip = True
    else:
        xnew_rows, xold_rows = seg[:, :L], seg0[:, :L]
        R_rows = R_fwd[:, :L]
        ib_rows = jnp.broadcast_to(jnp.arange(L), (W, L))
        flip = False
    if fodd is not None:
        # cache rows ride the reversed order; fold odd rows are forward
        # rows L-1::-2 <-> reversed rows 1::2.  Keep the reversed-row call
        # (exact_f2 path only; the window copy is accepted there).
        rows, dfield = delta_action_rows(
            system, tables, R_fwd[:, 1:][:, ::-1] if tail else R_rows,
            seg[:, :L], seg0[:, :L], ip,
            jnp.broadcast_to(jnp.arange(M - 1, M - 1 - L, -1), (W, L))
            if tail else ib_rows, fold=f_seg, fold_sub=(1, 2))
        alive = _monoshot_accept(active, rows, u_acc, nlev, gate=True)
    else:
        # NOTE (round 5): splitting the terminal gate row into its own
        # 1-row kernel (so the interior rows run need_wf=False, saving the
        # masked u-passes) measured 223 vs 122 ms/step at W=1024 and 854
        # vs 827 at W=4096 — the single L-row call fuses better than the
        # 1 + (L-1) split despite the extra masked arithmetic.  Keep the
        # one-call form.
        rows = delta_action_rows(
            system, tables, R_rows, xnew_rows, xold_rows, ip, ib_rows)
        A = jnp.asarray(_level_assign(nlev, True), rows.dtype)
        if flip:
            A = A[::-1]
        alive = active & jnp.all(
            metropolis_u(u_acc, rows @ A), axis=-1)

    seg_fin = jnp.where(alive[:, None, None], seg, seg0)
    if defer_write:
        assert fodd is None
        return seg_fin, alive
    ip_i = jnp.asarray(ip, jnp.int32)
    if tail:
        paths = lax.dynamic_update_slice(
            paths, seg_fin[:, ::-1][:, :, None, :].astype(paths.dtype),
            (jnp.int32(0), jnp.int32(M - 1 - L), ip_i, jnp.int32(0)))
    else:
        paths = lax.dynamic_update_slice(
            paths, seg_fin[:, :, None, :].astype(paths.dtype),
            (jnp.int32(0), jnp.int32(0), ip_i, jnp.int32(0)))
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_seg, dfield, alive, k_lo,
                                reverse=tail)
        return paths, fodd, alive
    return paths, alive


def paired_end_bisections(system: System, tables: Tables, kh, kt, paths,
                          ip, active, level: int, rand_h=None, rand_t=None):
    """Head + tail monoshot end-bisections of one particle computed from
    the SAME input paths, writebacks applied together afterward.

    Kernel-identical to running the two moves sequentially: the windows
    are disjoint and non-adjacent (caller guarantees 2**(level+1) < M-1),
    so the tail's partner block and its own segment are unchanged by the
    head's writeback — reading both from the pre-move paths removes the
    false head -> tail buffer dependency and lets XLA overlap the two
    pair chains' DMA/compute.  Returns (paths, acc_h, acc_t)."""
    M = system.M
    L = 2 ** max(level, 2)
    fin_h, acc_h = _end_bisection_monoshot(
        system, tables, kh, paths, ip, active, max(level, 2), tail=False,
        rand=rand_h, defer_write=True)
    fin_t, acc_t = _end_bisection_monoshot(
        system, tables, kt, paths, ip, active, max(level, 2), tail=True,
        rand=rand_t, defer_write=True)
    ip_i = jnp.asarray(ip, jnp.int32)
    paths = lax.dynamic_update_slice(
        paths, fin_h[:, :, None, :].astype(paths.dtype),
        (jnp.int32(0), jnp.int32(0), ip_i, jnp.int32(0)))
    paths = lax.dynamic_update_slice(
        paths, fin_t[:, ::-1][:, :, None, :].astype(paths.dtype),
        (jnp.int32(0), jnp.int32(M - 1 - L), ip_i, jnp.int32(0)))
    return paths, acc_h, acc_t


def bisection(system: System, tables: Tables, key, paths, ip, active,
              level: int, fodd=None, rand=None):
    """Interior multilevel bisection over an even-aligned window of
    2**level links.

    fodd [W, Nb, N, D] (optional): odd-bead force-field cache.  Only the
    LAST level's midpoints sit on odd beads (level ilev displaces beads at
    offsets 2^(nlev-ilev) * (2j+1) from the even window start), so every
    other level runs with need_f2=False and zero cache traffic; the last
    level's midpoints are exactly the window's odd beads — one contiguous
    cache slice, one dynamic-update-slice write-back gated by the FINAL
    alive mask (see module note).

    rand (optional): pre-drawn randoms (u_start scalar, g [W, L, D],
    u_acc [W, level+1]) — the batched-randoms hot path (see
    moves.metropolis_u); requires shared windows.  `key` is unused then."""
    if system.cfg.bis_monoshot:
        return _bisection_monoshot(system, tables, key, paths, ip, active,
                                   level, fodd=fodd, rand=rand)
    M = system.M
    W = paths.shape[0]
    seg_len = 2 ** level
    if rand is not None:
        u_start, g_rows, u_acc = rand
        keys = [None] * (level + 2)
        n_opts = (M - 1 - seg_len) // 2 + 1
        ii = 2 * jnp.floor(u_start * n_opts).astype(jnp.int32)
    else:
        g_rows = None
        keys = jax.random.split(key, level + 2)
        ii = _window_start(system, keys[0], W, (M - 1 - seg_len) // 2 + 1)
    R_seg = _slice_beads(paths, ii, seg_len + 1)
    # the moved particle's window comes out of the ALREADY-SLICED partner
    # block — slicing the full chain from paths forces a whole-array layout
    # copy per iteration (measured 0.64 ms at W=4096)
    seg0 = R_seg[:, :, ip, :]
    ib_seg = jnp.expand_dims(ii, -1) + jnp.arange(seg_len + 1)
    ib_seg = jnp.broadcast_to(ib_seg, (W, seg_len + 1))
    if fodd is not None:
        f_seg, _, k0 = _codd_window(fodd, ii, 0, seg_len)

    seg = seg0
    alive = active
    dfield = None
    for ilev in range(1, level + 1):
        d2, delta, m, xold, xnew = _level_proposal(system, keys[ilev], seg,
                                                   ilev, level,
                                                   g_rows=g_rows)
        if fodd is not None and ilev == level:
            # last level: midpoints d2=1, delta=2 — all the window's odd
            # beads, 1:1 with the hoisted cache rows
            rows, dfield = delta_action_rows(
                system, tables, R_seg[:, d2::delta], xnew, xold, ip,
                ib_seg[:, d2::delta], fold=f_seg, fold_sub=(0, 1),
                need_wf=False)
            dS = jnp.sum(rows, axis=-1)
        elif fodd is not None:
            # even-bead midpoints: zero Chin F^2 weight, no cache traffic
            dS = jnp.sum(delta_action_rows(
                system, tables, R_seg[:, d2::delta], xnew, xold, ip,
                ib_seg[:, d2::delta], need_wf=False, need_f2=False),
                axis=-1)
        else:
            # even-bead levels (ilev < level) carry zero Chin F^2 weight:
            # need_f2=False skips the force reductions, bitwise-identical dS
            dS = jnp.sum(delta_action_rows(
                system, tables, R_seg[:, d2::delta], xnew, xold, ip,
                ib_seg[:, d2::delta], need_wf=False,
                need_f2=(ilev == level)), axis=-1)
        seg = _strided_set(seg, xnew, 1, d2, delta, seg_len)
        if rand is not None:
            alive = alive & metropolis_u(u_acc[:, ilev], dS)
        else:
            alive = alive & metropolis(jax.random.fold_in(keys[-1], ilev),
                                       dS)
    seg_fin = jnp.where(alive[:, None, None], seg, seg0)
    if jnp.ndim(ii) == 0:
        paths = lax.dynamic_update_slice(
            paths, seg_fin[:, :, None, :].astype(paths.dtype),
            (jnp.int32(0), ii, jnp.asarray(ip, jnp.int32), jnp.int32(0)))
    else:
        chain = get_chain(paths, ip)
        chain = _update_beads(chain, ii, seg_fin)
        paths = set_chain(paths, ip, chain)
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_seg, dfield, alive, k0)
        return paths, fodd, alive
    return paths, alive


def _end_bisection_fixed_depth(system: System, tables: Tables, key, paths,
                               ip, active, nlev: int, tail: bool,
                               fodd=None, rand=None):
    """MoveHead/TailBisection body at a static depth nlev
    (vpi_mod.f90:1002-1372); tail=True runs on the bead-reversed segment.

    fodd: odd-bead force-field cache, hoisted as one contiguous (reversed
    for tail) window like the paths window (see bisection).

    rand (optional): (None, g [W, L, D], u_acc [W, nlev+1]) pre-drawn
    randoms — the gate consumes g row 0 / u_acc column 0, level ilev its
    strided g rows / u_acc column ilev (rows partition exactly)."""
    if system.cfg.bis_monoshot:
        return _end_bisection_monoshot(system, tables, key, paths, ip,
                                       active, nlev, tail, fodd=fodd,
                                       rand=rand)
    cfg = system.cfg
    M = system.M
    dt = cfg.dt
    W = paths.shape[0]
    seg_len = 2 ** nlev
    if rand is not None:
        _, g_rows, u_acc = rand
        k_g = k_acc0 = None
        k_lev = [None] * (nlev + 1)
    else:
        g_rows = None
        k_g, k_acc0, *k_lev = jax.random.split(key, nlev + 3)

    if tail:
        R_seg = paths[:, M - 1 - seg_len:][:, ::-1]
        ib_seg = jnp.broadcast_to(
            jnp.arange(M - 1, M - 2 - seg_len, -1), (W, seg_len + 1))
        if fodd is not None:
            f_seg, _, k_lo = _codd_window_rev(fodd, M - 1, 0, seg_len)
    else:
        R_seg = paths[:, : seg_len + 1]
        ib_seg = jnp.broadcast_to(jnp.arange(seg_len + 1), (W, seg_len + 1))
        if fodd is not None:
            f_seg, _, k_lo = _codd_window(fodd, 0, 0, seg_len)
    seg0 = R_seg[:, :, ip, :]      # window-first chain access (see bisection)

    # free-gaussian guess for the terminal bead, sigma = sqrt(2**nlev*dt),
    # with its own accept gate (vpi_mod.f90:1039-1076)
    dtype = seg0.dtype
    xold0 = seg0[:, 0]
    anchor = seg0[:, seg_len]
    if rand is not None:
        g = g_rows[:, 0]
    else:
        g = jax.random.normal(k_g, xold0.shape, dtype)
    xmid = xold0 - _mi(system, xold0 - anchor)
    xnew0 = _wrap_pos(system, xmid + jnp.sqrt(seg_len * dt) * g)
    if fodd is not None or rand is not None:
        # the terminal bead (0 or M-1) is EVEN: its F^2 weight is zero, so
        # the gate needs neither forces nor cache rows
        dS0 = jnp.sum(delta_action_rows(
            system, tables, R_seg[:, :1], xnew0[:, None], xold0[:, None],
            ip, ib_seg[:, :1], need_f2=False), axis=-1)
    else:
        dS0 = jnp.sum(delta_action(system, tables, R_seg[:, :1],
                                   xnew0[:, None], xold0[:, None], ip,
                                   ib_seg[:, :1]), axis=-1)
    if rand is not None:
        alive = active & metropolis_u(u_acc[:, 0], dS0)
    else:
        alive = active & metropolis(k_acc0, dS0)
    seg = seg0.at[:, 0].set(xnew0)

    dfield = None
    for ilev in range(1, nlev + 1):
        d2, delta, m, xold, xnew = _level_proposal(system, k_lev[ilev - 1],
                                                   seg, ilev, nlev,
                                                   g_rows=g_rows)
        if fodd is not None and ilev == nlev:
            # last level == the window's odd beads (see bisection)
            rows, dfield = delta_action_rows(
                system, tables, R_seg[:, d2::delta], xnew, xold, ip,
                ib_seg[:, d2::delta], fold=f_seg, fold_sub=(0, 1),
                need_wf=False)
            dS = jnp.sum(rows, axis=-1)
        elif fodd is not None:
            dS = jnp.sum(delta_action_rows(
                system, tables, R_seg[:, d2::delta], xnew, xold, ip,
                ib_seg[:, d2::delta], need_wf=False, need_f2=False),
                axis=-1)
        else:
            dS = jnp.sum(delta_action_rows(
                system, tables, R_seg[:, d2::delta], xnew, xold, ip,
                ib_seg[:, d2::delta], need_wf=False,
                need_f2=(ilev == nlev)), axis=-1)
        seg = _strided_set(seg, xnew, 1, d2, delta, seg_len)
        if rand is not None:
            alive = alive & metropolis_u(u_acc[:, ilev], dS)
        else:
            alive = alive & metropolis(jax.random.fold_in(k_lev[-1], ilev),
                                       dS)

    seg_fin = jnp.where(alive[:, None, None], seg, seg0)
    ip_i = jnp.asarray(ip, jnp.int32)
    if tail:
        paths = lax.dynamic_update_slice(
            paths, seg_fin[:, ::-1][:, :, None, :].astype(paths.dtype),
            (jnp.int32(0), jnp.int32(M - 1 - seg_len), ip_i, jnp.int32(0)))
    else:
        paths = lax.dynamic_update_slice(
            paths, seg_fin[:, :, None, :].astype(paths.dtype),
            (jnp.int32(0), jnp.int32(0), ip_i, jnp.int32(0)))
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_seg, dfield, alive, k_lo,
                                reverse=tail)
        return paths, fodd, alive
    return paths, alive


def _end_bisection(system: System, tables: Tables, key, paths, ip, active,
                   level: int, tail: bool, fodd=None, rand=None):
    """End-segment bisection.

    The reference draws a random depth Nlev ~ U{2..level} per move
    (vpi_mod.f90:1023).  The depth distribution is a free proposal
    parameter (any state-independent choice preserves detailed balance):
    the default here regrows the full 2**level window every time — one
    static body, fastest compile and widest window.  Set
    cfg.bis_end_random_depth for the reference's randomized depths,
    dispatched through lax.switch over static bodies (compiles ~level-1
    copies of the move).
    """
    if not system.cfg.bis_end_random_depth or level <= 2:
        return _end_bisection_fixed_depth(system, tables, key, paths, ip,
                                          active, max(level, 2), tail,
                                          fodd=fodd, rand=rand)
    k_n, k_body = jax.random.split(key)
    nlev = jax.random.randint(k_n, (), 0, level - 1)  # 0 .. level-2
    branches = [
        (lambda args, d=d: _end_bisection_fixed_depth(
            system, tables, args[0], args[1], args[2], args[3], d, tail,
            fodd=args[4]))
        for d in range(2, level + 1)
    ]
    return lax.switch(nlev, branches, (k_body, paths, ip, active, fodd))


# ---------------------------------------------------------------------------
# Fused composite moves (TPU perf: fewer, larger sequential kernels)
# ---------------------------------------------------------------------------
#
# The reference applies MoveHeadBisection, MoveTailBisection and Bisection
# back-to-back per particle (vpi.f90:431-435) — ~14 dependent pair-kernel
# launches per particle per Nstag iteration, which on TPU is launch/overhead
# bound at ~20% of the fused kernels' standalone pair throughput.  The
# composites below cut the sequential depth ~2-3x by exploiting a structural
# fact of the action: two single-particle window moves are INDEPENDENT
# (their joint proposal + independent Metropolis accepts form a valid
# product kernel) whenever their displaced bead sets have no direct action
# coupling — pair terms act at EQUAL bead index and spring terms between
# ADJACENT beads of the SAME particle, so it suffices that
#   * displaced sets of different particles are disjoint in bead index, and
#   * displaced sets of the same particle are disjoint and non-adjacent.
# Under these conditions the action splits as S = S_A(A, C) + S_B(B, C) +
# S_0(C) over the two displaced blocks A, B and the frozen rest C, the
# target conditional factorizes, and simultaneous independent
# Metropolis-accepted proposals of A and B leave it invariant (the same
# argument as the SP product kernel, parallel/beadshard.py).  Invariance is
# tested per composite in tests/test_invariance.py.


def _fused_ends_monoshot(system: System, tables: Tables, key, paths, ip,
                         active, level: int, fodd=None, rand=None):
    """Head+tail composite in monoshot form: one shared draw block, one
    batched construction over both segments, TWO pair kernels (head rows
    forward, tail rows forward — no reversed window copies), one accept
    matmul.  Composite validity as fused_end_bisections; kernel semantics
    as _end_bisection_monoshot.  Returns (paths[, fodd], acc_h, acc_t)."""
    cfg = system.cfg
    M = system.M
    dt = cfg.dt
    W = paths.shape[0]
    L = 2 ** level
    if rand is None:
        ks = jax.random.split(key, 2)
        g2 = jax.random.normal(ks[0], (W, 2, L, cfg.dim), paths.dtype)
        u2 = jax.random.uniform(ks[1], (W, 2, level + 1), paths.dtype)
    else:
        _, g2, u2 = rand

    R_head = paths[:, : L + 1]
    R_tailf = paths[:, M - 1 - L:]                 # forward order
    seg0 = jnp.stack([R_head[:, :, ip, :],
                      R_tailf[:, :, ip, :][:, ::-1]], axis=1)  # [W,2,L+1,D]
    dtype = seg0.dtype
    if fodd is not None:
        f_head, _, k_h = _codd_window(fodd, 0, 0, L)
        f_tail, _, k_t = _codd_window_rev(fodd, M - 1, 0, L)

    xold0 = seg0[:, :, 0]
    anchor = seg0[:, :, L]
    xmid = xold0 - _mi(system, xold0 - anchor)
    xnew0 = _wrap_pos(system, xmid + jnp.sqrt(L * dt) * g2[:, :, 0])
    seg = _construct_levels(system, seg0.at[:, :, 0].set(xnew0), level, L,
                            g2)

    A = jnp.asarray(_level_assign(level, True), dtype)
    # head rows: forward order 0..L-1
    ib_h = jnp.broadcast_to(jnp.arange(L), (W, L))
    # tail rows: forward beads M-L..M-1 <-> reversed-segment rows L-1..0
    ib_t = jnp.broadcast_to(jnp.arange(M - L, M), (W, L))
    if fodd is not None:
        rows_h, df_h = delta_action_rows(
            system, tables, R_head[:, :L], seg[:, 0, :L], seg0[:, 0, :L],
            ip, ib_h, fold=f_head, fold_sub=(1, 2))
        # tail keeps the reversed-row orientation on the cache path
        rows_t, df_t = delta_action_rows(
            system, tables, R_tailf[:, 1:][:, ::-1], seg[:, 1, :L],
            seg0[:, 1, :L], ip,
            jnp.broadcast_to(jnp.arange(M - 1, M - 1 - L, -1), (W, L)),
            fold=f_tail, fold_sub=(1, 2))
        acc_h = active & jnp.all(metropolis_u(u2[:, 0], rows_h @ A),
                                 axis=-1)
        acc_t = active & jnp.all(metropolis_u(u2[:, 1], rows_t @ A),
                                 axis=-1)
    else:
        rows_h = delta_action_rows(system, tables, R_head[:, :L],
                                   seg[:, 0, :L], seg0[:, 0, :L], ip, ib_h)
        rows_t = delta_action_rows(system, tables, R_tailf[:, 1:],
                                   seg[:, 1, :L][:, ::-1],
                                   seg0[:, 1, :L][:, ::-1], ip, ib_t)
        acc_h = active & jnp.all(metropolis_u(u2[:, 0], rows_h @ A),
                                 axis=-1)
        acc_t = active & jnp.all(metropolis_u(u2[:, 1], rows_t @ A[::-1]),
                                 axis=-1)

    acc2 = jnp.stack([acc_h, acc_t], axis=1)
    seg_fin = jnp.where(acc2[:, :, None, None], seg, seg0)
    ip_i = jnp.asarray(ip, jnp.int32)
    paths = lax.dynamic_update_slice(
        paths, seg_fin[:, 0][:, :, None, :].astype(paths.dtype),
        (jnp.int32(0), jnp.int32(0), ip_i, jnp.int32(0)))
    paths = lax.dynamic_update_slice(
        paths, seg_fin[:, 1, ::-1][:, :, None, :].astype(paths.dtype),
        (jnp.int32(0), jnp.int32(M - 1 - L), ip_i, jnp.int32(0)))
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_head, df_h, acc_h, k_h)
        fodd = _cache_win_write(fodd, f_tail, df_t, acc_t, k_t,
                                reverse=True)
        return paths, fodd, acc_h, acc_t
    return paths, acc_h, acc_t


def fused_end_bisections(system: System, tables: Tables, key, paths, ip,
                         active, level: int, fodd=None, rand=None):
    """MoveHeadBisection + MoveTailBisection of one particle as ONE
    composite update (valid: head displaces beads 0..2**level-1, tail
    M-2**level..M-1 — disjoint and non-adjacent when 2**(level+1) < M-1,
    which the caller must guarantee).

    Per level, the head and tail midpoints are evaluated in a single
    batched pair kernel (rows doubled), halving the sequential kernel count
    of the two end moves.  fodd [W, M, N, D]: all-bead force-field cache
    (see module note on the deferred, final-alive-gated update).
    Returns (paths[, fodd], acc_head[W], acc_tail[W]).
    """
    if system.cfg.bis_monoshot:
        return _fused_ends_monoshot(system, tables, key, paths, ip, active,
                                    level, fodd=fodd, rand=rand)
    cfg = system.cfg
    M = system.M
    dt = cfg.dt
    W = paths.shape[0]
    L = 2 ** level
    if rand is not None:
        # (None, g2 [W, 2, L, D], u2 [W, 2, level+1]) pre-drawn randoms:
        # g2 row j feeds displaced window row j of each segment (gate row
        # 0, level ilev its strided rows), u2 column 0 the gate accept,
        # column ilev the level accepts (see moves.metropolis_u)
        _, g2, u2 = rand
        k_g = k_acc0 = None
        k_lev = [None] * (level + 1)
    else:
        g2 = None
        k_g, k_acc0, *k_lev = jax.random.split(key, level + 3)

    # hoist the two CONTIGUOUS windows once; every level access below
    # slices these small blocks (strided slices of the full paths array
    # lower to whole-array mini-gather passes — the round-3 profiling
    # story, docs/VALIDATION.md)
    R_head = paths[:, : L + 1]                                # [W, L+1, N, D]
    R_tail = paths[:, M - 1 - L:][:, ::-1]
    seg0 = jnp.stack([R_head[:, :, ip, :], R_tail[:, :, ip, :]],
                     axis=1)                                  # [W, 2, L+1, D]
    dtype = seg0.dtype
    # bead indices per segment row (head: 0..L, tail reversed: M-1..M-1-L)
    ib2 = jnp.stack([jnp.arange(L + 1), M - 1 - jnp.arange(L + 1)])  # [2,L+1]

    # free-gaussian end guesses with their own accept gate
    # (vpi_mod.f90:1039-1076), both ends at once
    xold0 = seg0[:, :, 0]                                     # [W, 2, D]
    anchor = seg0[:, :, L]
    if rand is not None:
        g = g2[:, :, 0]
    else:
        g = jax.random.normal(k_g, xold0.shape, dtype)
    xmid = xold0 - _mi(system, xold0 - anchor)
    xnew0 = _wrap_pos(system, xmid + jnp.sqrt(L * dt) * g)
    R_ends = jnp.stack([R_head[:, 0], R_tail[:, 0]], axis=1)    # [W, 2, N, D]
    ib_ends = jnp.broadcast_to(jnp.array([0, M - 1]), (W, 2))
    if fodd is not None:
        # hoist the odd-bead cache windows ONCE, contiguous, like
        # R_head/R_tail.  The terminal beads 0 and M-1 are EVEN (zero F^2
        # weight), so the end gate is cache-free with need_f2=False.
        f_head, _, k_h = _codd_window(fodd, 0, 0, L)
        f_tail, _, k_t = _codd_window_rev(fodd, M - 1, 0, L)
        dS0 = delta_action_rows(system, tables, R_ends, xnew0, xold0, ip,
                                ib_ends, need_f2=False)
    else:
        # terminal beads 0 and M-1 are EVEN — zero Chin F^2 weight — so the
        # end gate never needs the force reduction (matches the fodd branch
        # and _end_bisection_fixed_depth; value-identical either way)
        dS0 = delta_action_rows(system, tables, R_ends, xnew0, xold0, ip,
                                ib_ends, need_f2=False)
    if rand is not None:
        alive = active[:, None] & metropolis_u(u2[:, :, 0], dS0)  # [W, 2]
    else:
        alive = active[:, None] & metropolis(k_acc0, dS0)         # [W, 2]
    seg = seg0.at[:, :, 0].set(xnew0)

    # ONE hoisted two-window partner buffer [W, 2, L+1, N, D]: every level
    # below slices it (strided, fusable) instead of concatenating two
    # strided slices per level — the stack/concat overhead was what made
    # the round-3 composites lose to the unfused order (VERDICT r3 item 6)
    R2 = jnp.stack([R_head, R_tail], axis=1)
    dfield = None
    for ilev in range(1, level + 1):
        d2, delta, m, xold, xnew = _level_proposal(system, k_lev[ilev - 1],
                                                   seg, ilev, level,
                                                   g_rows=g2)
        # one batched pair kernel over BOTH segments' midpoints, kept in
        # [W, 2, m, ...] form end to end (no concat, no reshape)
        R_mid = R2[:, :, d2:L:delta]
        ib_mid = jnp.broadcast_to(ib2[None, :, d2::delta], (W, 2, m))
        if fodd is not None and ilev == level:
            # last level == both windows' odd beads (see bisection)
            fold2 = jnp.stack([f_head, f_tail], axis=1)
            rows, dfield = delta_action_rows(
                system, tables, R_mid, xnew, xold, ip, ib_mid, fold=fold2,
                fold_sub=(0, 1), need_wf=False)
        elif fodd is not None:
            rows = delta_action_rows(system, tables, R_mid, xnew, xold, ip,
                                     ib_mid, need_wf=False, need_f2=False)
        else:
            rows = delta_action_rows(system, tables, R_mid, xnew, xold, ip,
                                     ib_mid, need_wf=False,
                                     need_f2=(ilev == level))
        dS = jnp.sum(rows, axis=-1)                            # [W, 2]
        if rand is not None:
            alive = alive & metropolis_u(u2[:, :, ilev], dS)
        else:
            alive = alive & metropolis(
                jax.random.fold_in(k_lev[-1], ilev), dS)
        seg = _strided_set(seg, xnew, 2, d2, delta, L)

    seg_fin = jnp.where(alive[:, :, None, None], seg, seg0)
    ip_i = jnp.asarray(ip, jnp.int32)
    paths = lax.dynamic_update_slice(
        paths, seg_fin[:, 0][:, :, None, :].astype(paths.dtype),
        (jnp.int32(0), jnp.int32(0), ip_i, jnp.int32(0)))
    paths = lax.dynamic_update_slice(
        paths, seg_fin[:, 1, ::-1][:, :, None, :].astype(paths.dtype),
        (jnp.int32(0), jnp.int32(M - 1 - L), ip_i, jnp.int32(0)))
    if fodd is not None:
        fodd = _cache_win_write(fodd, f_head, dfield[:, 0], alive[:, 0],
                                k_h)
        fodd = _cache_win_write(fodd, f_tail, dfield[:, 1], alive[:, 1],
                                k_t, reverse=True)
        return paths, fodd, alive[:, 0], alive[:, 1]
    return paths, alive[:, 0], alive[:, 1]


def _bisection_multi_monoshot(system: System, tables: Tables, key, paths,
                              ips, active, level: int, fodd=None,
                              rand=None):
    """K-slot interior composite in monoshot form: one span read, one
    batched construction over all slots, ONE pair kernel over every slot's
    displaced rows, one accept matmul.  Slot/span semantics exactly as
    bisection_multi.  Returns (paths[, fodd], acc[W, K])."""
    cfg = system.cfg
    M = system.M
    W = paths.shape[0]
    L = 2 ** level
    K = len(ips)
    span = K * L
    assert span <= M - 1, f"K={K} slots of {L} links exceed {M - 1} links"
    active = jnp.asarray(active)
    if active.ndim == 1:
        active = jnp.broadcast_to(active[:, None], (W, K))
    n_shift = (M - 1 - span) // 2 + 1
    if rand is None:
        ks = jax.random.split(key, 3)
        u_shift = jax.random.uniform(ks[0], (), paths.dtype)
        gK = jax.random.normal(ks[1], (W, K, L, cfg.dim), paths.dtype)
        uK = jax.random.uniform(ks[2], (W, K, level + 1), paths.dtype)
    else:
        u_shift, gK, uK = rand
    s = 2 * jnp.floor(u_shift * n_shift).astype(jnp.int32)
    R_big = lax.dynamic_slice_in_dim(paths, s, span + 1, axis=1)

    ips_arr = [jnp.asarray(p, jnp.int32) for p in ips]
    ip_mat = jnp.stack(ips_arr)                               # [K]
    seg0 = jnp.stack(
        [R_big[:, k * L: (k + 1) * L + 1, ips_arr[k], :] for k in range(K)],
        axis=1)                                               # [W, K, L+1, D]
    seg = _construct_levels(system, seg0, level, L, gK)

    # every slot's displaced rows in ONE kernel: slot k rows 1..L-1 at
    # beads s + kL + 1 .. s + kL + L - 1 (the span reshape is a free view)
    R_rows = R_big[:, :span].reshape(W, K, L, cfg.Np, cfg.dim)[:, :, 1:]
    idx = np.stack([k * L + np.arange(1, L) for k in range(K)])  # [K, L-1]
    ib_rows = s + jnp.broadcast_to(jnp.asarray(idx)[None], (W, K, L - 1))
    ip_rows = jnp.broadcast_to(ip_mat[None, :, None], (W, K, L - 1))
    dfield = None
    if fodd is not None:
        f_big = lax.dynamic_slice_in_dim(fodd, s // 2, span // 2, axis=1)
        rows, dfield = delta_action_rows(
            system, tables, R_rows, seg[:, :, 1:L], seg0[:, :, 1:L],
            ip_rows, ib_rows,
            fold=f_big.reshape(W, K, L // 2, cfg.Np, cfg.dim),
            fold_sub=(0, 2), need_wf=False)
    else:
        rows = delta_action_rows(
            system, tables, R_rows, seg[:, :, 1:L], seg0[:, :, 1:L],
            ip_rows, ib_rows, need_wf=False)
    A = jnp.asarray(_level_assign(level, False), rows.dtype)
    alive = active & jnp.all(
        metropolis_u(uK[:, :, 1:], rows @ A), axis=-1)        # [W, K]

    seg_fin = jnp.where(alive[:, :, None, None], seg, seg0)
    for k in range(K):
        upd = seg_fin[:, k, 1:L, None, :]                     # [W, L-1, 1, D]
        paths = lax.dynamic_update_slice(
            paths, upd.astype(paths.dtype),
            (jnp.int32(0), s + k * L + 1, ips_arr[k], jnp.int32(0)))
    if fodd is not None:
        slot_alive = jnp.repeat(alive, L // 2, axis=1)        # [W, span//2]
        dF = dfield.reshape(W, span // 2, cfg.Np, cfg.dim)
        f_big = f_big + jnp.where(slot_alive[:, :, None, None], dF, 0.0)
        fodd = lax.dynamic_update_slice_in_dim(fodd, f_big, s // 2, axis=1)
        return paths, fodd, alive
    return paths, alive


def bisection_multi(system: System, tables: Tables, key, paths, ips, active,
                    level: int, fodd=None, rand=None):
    """Interior multilevel bisections of K DISTINCT particles as one
    composite update.

    ips: length-K sequence of (traced) particle indices, pairwise distinct.
    Slot k regrows the window of L = 2**level links starting at bead
    s + k*L, with one random even shift s shared by all slots; slot
    interiors are disjoint in bead index, so the K simultaneous Metropolis
    decisions compose into a valid product kernel (see module note above).
    The union of slot-k starts over shifts is every even start in
    [0, M-1-L] — the same support as the sequential kernel's window mixture
    (_window_start), restoring full bead coverage.

    active: [W] or [W, K] per-slot activity mask.  fodd [W, M, N, D]:
    all-bead force-field cache (deferred, final-alive-gated update).
    Returns (paths[, fodd], acc[W, K]).
    """
    if system.cfg.bis_monoshot:
        return _bisection_multi_monoshot(system, tables, key, paths, ips,
                                         active, level, fodd=fodd,
                                         rand=rand)
    cfg = system.cfg
    M = system.M
    dt = cfg.dt
    W = paths.shape[0]
    L = 2 ** level
    K = len(ips)
    span = K * L
    assert span <= M - 1, f"K={K} slots of {L} links exceed {M - 1} links"
    keys = jax.random.split(key, level + 2)

    active = jnp.asarray(active)
    if active.ndim == 1:
        active = jnp.broadcast_to(active[:, None], (W, K))

    n_shift = (M - 1 - span) // 2 + 1
    if rand is not None:
        # (u_shift, gK [W, K, L, D], uK [W, K, level+1]) pre-drawn randoms
        # (slot-k rows feed slot k's displaced window rows; uK column ilev
        # the level accepts — column 0 unused, interior moves have no gate)
        u_shift, gK, uK = rand
        s = 2 * jnp.floor(u_shift * n_shift).astype(jnp.int32)
    else:
        gK = None
        s = 2 * jax.random.randint(keys[0], (), 0, n_shift, dtype=jnp.int32)
    R_big = lax.dynamic_slice_in_dim(paths, s, span + 1, axis=1)
    dtype = paths.dtype

    ips_arr = [jnp.asarray(p, jnp.int32) for p in ips]
    ip_mat = jnp.stack(ips_arr)                               # [K]
    # slot segments: particle ips[k]'s beads [kL .. (k+1)L] (static within
    # R_big) -> [W, K, L+1, D]
    seg0 = jnp.stack(
        [R_big[:, k * L: (k + 1) * L + 1, ips_arr[k], :] for k in range(K)],
        axis=1)
    seg = seg0
    alive = active
    if fodd is not None:
        # odd beads of the span: s+1, s+3, .. — cache rows s//2 onward,
        # exactly the last level's midpoints (see bisection)
        f_big = lax.dynamic_slice_in_dim(fodd, s // 2, span // 2, axis=1)

    dfield = None
    for ilev in range(1, level + 1):
        d2, delta, m, xold, xnew = _level_proposal(system, keys[ilev], seg,
                                                   ilev, level, g_rows=gK)
        # one pair kernel over all K slots' midpoints, kept in
        # [W, K, m, ...] form end to end (the slot-k midpoint beads
        # k*L + d2 + j*delta factor through a [K, L] reshape into one
        # strided slice — no integer-array gather, no flattening copies)
        idx_np = np.stack(
            [k * L + np.arange(d2, L, delta) for k in range(K)])   # [K, m]
        R_mid = R_big[:, :span].reshape(W, K, L, cfg.Np, cfg.dim)[
            :, :, d2::delta]                                # [W, K, m, N, D]
        ib_mid = s + jnp.broadcast_to(
            jnp.asarray(idx_np)[None], (W, K, m))
        ip_rows = jnp.broadcast_to(ip_mat[None, :, None], (W, K, m))
        if fodd is not None and ilev == level:
            # last level: K*m == span//2 midpoints, 1:1 with f_big rows
            rows, dfield = delta_action_rows(
                system, tables, R_mid, xnew, xold, ip_rows, ib_mid,
                fold=f_big.reshape(W, K, m, cfg.Np, cfg.dim),
                fold_sub=(0, 1), need_wf=False)
        elif fodd is not None:
            rows = delta_action_rows(system, tables, R_mid, xnew, xold,
                                     ip_rows, ib_mid, need_wf=False,
                                     need_f2=False)
        else:
            rows = delta_action_rows(system, tables, R_mid, xnew, xold,
                                     ip_rows, ib_mid, need_wf=False,
                                     need_f2=(ilev == level))
        dS = jnp.sum(rows, axis=-1)                               # [W, K]
        if rand is not None:
            alive = alive & metropolis_u(uK[:, :, ilev], dS)
        else:
            alive = alive & metropolis(
                jax.random.fold_in(keys[-1], ilev), dS)
        seg = _strided_set(seg, xnew, 2, d2, delta, L)

    seg_fin = jnp.where(alive[:, :, None, None], seg, seg0)
    # write back each slot's interior beads into its particle's worldline
    for k in range(K):
        upd = seg_fin[:, k, 1:L, None, :]                   # [W, L-1, 1, D]
        paths = lax.dynamic_update_slice(
            paths, upd.astype(paths.dtype),
            (jnp.int32(0), s + k * L + 1, ips_arr[k], jnp.int32(0)))
    if fodd is not None:
        # per-slot final gate: slot k's increments are its L/2 odd rows
        slot_alive = jnp.repeat(alive, L // 2, axis=1)        # [W, span//2]
        dF = dfield.reshape(W, span // 2, cfg.Np, cfg.dim)
        f_big = f_big + jnp.where(slot_alive[:, :, None, None], dF, 0.0)
        fodd = lax.dynamic_update_slice_in_dim(fodd, f_big, s // 2, axis=1)
        return paths, fodd, alive
    return paths, alive


def move_head_bisection(system, tables, key, paths, ip, active, level: int,
                        fodd=None, rand=None):
    return _end_bisection(system, tables, key, paths, ip, active, level,
                          tail=False, fodd=fodd, rand=rand)


def move_tail_bisection(system, tables, key, paths, ip, active, level: int,
                        fodd=None, rand=None):
    return _end_bisection(system, tables, key, paths, ip, active, level,
                          tail=True, fodd=fodd, rand=rand)
