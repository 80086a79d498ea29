"""Multilevel bisection moves (Bisection / MoveHeadBisection /
MoveTailBisection, vpi_mod.f90:864-1372), batched over the ensemble.

The reference's per-level Metropolis with early exit (vpi_mod.f90:960-969)
becomes a per-walker `alive` mask over a static level loop: a walker whose
level is rejected carries a dead mask (later proposals are computed but
discarded by the final restore), which generates the identical Markov
kernel — accept iff every level accepts, each level's proposal built on the
previous levels' updated beads.

TPU-native choices (all preserve detailed balance; see ops/moves.py notes):
  * interior windows are even-aligned, making each level's midpoint beads a
    single *static* parity: only the finest level (odd beads) carries the
    F^2 force pass, and midpoints are never chain ends (no WF pass);
  * the end-segment variants draw their random depth Nlev in [2, level]
    (vpi_mod.f90:1023) once per move site — shared across walkers — so a
    `lax.switch` dispatches to fully static per-depth implementations.
    (Sharing the depth across walkers leaves each walker's kernel the same
    mixture and the product stationary distribution exact; it only adds a
    negligible cross-walker correlation of proposal sizes.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..system import System, Tables
from .moves import _mi, _window_start, _wrap_pos, get_chain, metropolis, \
    set_chain, _slice_beads, _update_beads
from .pairwise import delta_action, delta_action_level


def _level_midpoints_static(system: System, tables: Tables, key, seg, R_seg,
                            ib_seg, ip, ilev: int, nlev: int):
    """One bisection level with static depth: displace the level's midpoints.

    seg [W, 2**nlev+1, D]; midpoints icurr = (2j-1)*delta/2 are static
    positions with one static bead parity (even-aligned windows).
    """
    cfg = system.cfg
    dt = cfg.dt
    dtype = seg.dtype
    W = seg.shape[0]
    delta = 2 ** (nlev - ilev + 1)
    j = jnp.arange(1, 2 ** (ilev - 1) + 1)
    iprev = (j - 1) * delta
    inext = j * delta
    icurr = (iprev + inext) // 2
    odd_level = ilev == nlev  # finest level: midpoints on odd beads

    xold = seg[:, icurr]                     # [W, nmid, D]
    xp = seg[:, iprev]
    xn = seg[:, inext]
    g = jax.random.normal(key, xold.shape, dtype)
    # dt_bis = 0.5*delta*dt, sigma = sqrt(0.5*dt_bis) (vpi_mod.f90:905-907)
    sigma = jnp.sqrt(0.25 * delta * dt)
    xprev = xold + _mi(system, xp - xold)
    xnext = xold - _mi(system, xold - xn)
    xmid = 0.5 * (xprev + xnext)
    xnew = _wrap_pos(system, xmid + sigma * g)

    dS = delta_action_level(system, tables, R_seg[:, icurr], xnew, xold, ip,
                            odd_beads=odd_level)
    seg = seg.at[:, icurr].set(xnew)
    return seg, dS


def bisection(system: System, tables: Tables, key, paths, ip, active,
              level: int):
    """Interior multilevel bisection over an even-aligned window of
    2**level links."""
    M = system.M
    W = paths.shape[0]
    seg_len = 2 ** level
    keys = jax.random.split(key, level + 2)
    ii = _window_start(system, keys[0], W, (M - 1 - seg_len) // 2 + 1)
    chain = get_chain(paths, ip)
    seg0 = _slice_beads(chain, ii, seg_len + 1)
    R_seg = _slice_beads(paths, ii, seg_len + 1)
    ib_seg = jnp.expand_dims(ii, -1) + jnp.arange(seg_len + 1)

    seg = seg0
    alive = active
    for ilev in range(1, level + 1):
        seg, dS = _level_midpoints_static(system, tables, keys[ilev], seg,
                                          R_seg, ib_seg, ip, ilev, level)
        alive = alive & metropolis(jax.random.fold_in(keys[-1], ilev), dS)
    seg_fin = jnp.where(alive[:, None, None], seg, seg0)
    chain = _update_beads(chain, ii, seg_fin)
    return set_chain(paths, ip, chain), alive


def _end_bisection_fixed_depth(system: System, tables: Tables, key, paths,
                               ip, active, nlev: int, tail: bool):
    """MoveHead/TailBisection body at a static depth nlev
    (vpi_mod.f90:1002-1372); tail=True runs on the bead-reversed segment."""
    cfg = system.cfg
    M = system.M
    dt = cfg.dt
    W = paths.shape[0]
    seg_len = 2 ** nlev
    k_g, k_acc0, *k_lev = jax.random.split(key, nlev + 3)

    chain = get_chain(paths, ip)
    if tail:
        seg0 = chain[:, M - 1 - seg_len:][:, ::-1]
        R_seg = paths[:, M - 1 - seg_len:][:, ::-1]
        ib_seg = jnp.broadcast_to(
            jnp.arange(M - 1, M - 2 - seg_len, -1), (W, seg_len + 1))
    else:
        seg0 = chain[:, : seg_len + 1]
        R_seg = paths[:, : seg_len + 1]
        ib_seg = jnp.broadcast_to(jnp.arange(seg_len + 1), (W, seg_len + 1))

    # free-gaussian guess for the terminal bead, sigma = sqrt(2**nlev*dt),
    # with its own accept gate (vpi_mod.f90:1039-1076)
    dtype = seg0.dtype
    xold0 = seg0[:, 0]
    anchor = seg0[:, seg_len]
    g = jax.random.normal(k_g, xold0.shape, dtype)
    xmid = xold0 - _mi(system, xold0 - anchor)
    xnew0 = _wrap_pos(system, xmid + jnp.sqrt(seg_len * dt) * g)
    dS0 = jnp.sum(delta_action(system, tables, R_seg[:, :1], xnew0[:, None],
                               xold0[:, None], ip, ib_seg[:, :1]), axis=-1)
    alive = active & metropolis(k_acc0, dS0)
    seg = seg0.at[:, 0].set(xnew0)

    for ilev in range(1, nlev + 1):
        seg, dS = _level_midpoints_static(system, tables, k_lev[ilev - 1],
                                          seg, R_seg, ib_seg, ip, ilev, nlev)
        alive = alive & metropolis(jax.random.fold_in(k_lev[-1], ilev), dS)

    seg_fin = jnp.where(alive[:, None, None], seg, seg0)
    if tail:
        chain = chain.at[:, M - 1 - seg_len:].set(seg_fin[:, ::-1])
    else:
        chain = chain.at[:, : seg_len + 1].set(seg_fin)
    return set_chain(paths, ip, chain), alive


def _end_bisection(system: System, tables: Tables, key, paths, ip, active,
                   level: int, tail: bool):
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
                                          active, max(level, 2), tail)
    k_n, k_body = jax.random.split(key)
    nlev = jax.random.randint(k_n, (), 0, level - 1)  # 0 .. level-2
    branches = [
        (lambda args, d=d: _end_bisection_fixed_depth(
            system, tables, args[0], args[1], args[2], args[3], d, tail))
        for d in range(2, level + 1)
    ]
    return lax.switch(nlev, branches, (k_body, paths, ip, active))


def move_head_bisection(system, tables, key, paths, ip, active, level: int):
    return _end_bisection(system, tables, key, paths, ip, active, level,
                          tail=False)


def move_tail_bisection(system, tables, key, paths, ip, active, level: int):
    return _end_bisection(system, tables, key, paths, ip, active, level,
                          tail=True)
