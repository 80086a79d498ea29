"""Multilevel bisection moves (Bisection / MoveHeadBisection /
MoveTailBisection, vpi_mod.f90:864-1372).

The reference's per-level Metropolis with early exit (vpi_mod.f90:960-969)
becomes a per-walker `alive` mask over a static level loop: a walker whose
level is rejected carries a dead mask (its remaining proposals are computed
but discarded by the final restore), which generates the identical Markov
kernel — accept iff every level accepts, with each level's proposal built on
the previous levels' updated beads.

The end-segment variants draw a random depth Nlev in [2, level]
(vpi_mod.f90:1023) — per walker — so bead strides are traced; the segment
buffer is static at 2**level + 1 beads and inactive midpoints propose
xnew == xold (zero dS).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..system import System, Tables
from .moves import _mi, _wrap_pos, get_chain, metropolis, set_chain
from .pairwise import delta_action


def _level_midpoints(system: System, tables: Tables, key, seg, R_seg, ib_seg,
                     ip, ilev: int, nlev, level: int):
    """One bisection level: displace the level's midpoints, return dS sum.

    seg: [2**level+1, D] current segment; nlev may be traced (<= level).
    Midpoints at level ilev: icurr = (2j-1)*delta/2, delta = 2**(nlev-ilev+1),
    j = 1..2**(ilev-1) (vpi_mod.f90:903-916).  For walkers with nlev < ilev
    or j beyond the active count the midpoint proposes xnew == xold.
    """
    cfg = system.cfg
    dt = cfg.dt
    dtype = seg.dtype
    nmid_max = 2 ** (ilev - 1)
    nlev = jnp.asarray(nlev, jnp.int32)
    level_active = ilev <= nlev

    # traced stride; clamp the exponent so dead levels (ilev > nlev) stay
    # well-defined — their proposals are overwritten with xold anyway
    delta = 2 ** jnp.maximum(nlev - ilev + 1, 1)
    j = jnp.arange(1, nmid_max + 1)
    iprev = (j - 1) * delta
    inext = j * delta
    icurr = (iprev + inext) // 2
    # guard indices for dead lanes (delta can exceed the buffer when traced
    # nlev < ilev); clamp — proposals there are discarded anyway
    cap = seg.shape[0] - 1
    iprev = jnp.clip(iprev, 0, cap)
    inext = jnp.clip(inext, 0, cap)
    icurr = jnp.clip(icurr, 0, cap)

    xold = seg[icurr]                        # [nmid, D]
    xp = seg[iprev]
    xn = seg[inext]
    g = jax.random.normal(key, xold.shape, dtype)
    # dt_bis = 0.5*delta*dt, sigma = sqrt(0.5*dt_bis) (vpi_mod.f90:905-907)
    sigma = jnp.sqrt(0.25 * delta.astype(dtype) * dt)
    xprev = xold + _mi(system, xp - xold)
    xnext = xold - _mi(system, xold - xn)
    xmid = 0.5 * (xprev + xnext)
    xnew = _wrap_pos(system, xmid + sigma * g)
    xnew = jnp.where(level_active, xnew, xold)

    dS = jnp.sum(delta_action(system, tables, R_seg[icurr], xnew, xold, ip,
                              ib_seg[icurr]))
    seg = seg.at[icurr].set(xnew)
    return seg, dS


def bisection(system: System, tables: Tables, key, paths_w, ip, active,
              level: int):
    """Interior multilevel bisection over a window of 2**level links."""
    M = system.M
    seg_len = 2 ** level
    keys = jax.random.split(key, level + 2)
    ii = jax.random.randint(keys[0], (), 0, M - seg_len)  # vpi_mod.f90:890
    chain = get_chain(paths_w, ip)
    seg0 = lax.dynamic_slice(chain, (ii, 0), (seg_len + 1, chain.shape[1]))
    R_seg = lax.dynamic_slice(paths_w, (ii, 0, 0),
                              (seg_len + 1,) + paths_w.shape[1:])
    ib_seg = ii + jnp.arange(seg_len + 1)

    seg = seg0
    alive = active
    for ilev in range(1, level + 1):
        seg, dS = _level_midpoints(system, tables, keys[ilev], seg, R_seg,
                                   ib_seg, ip, ilev, level, level)
        alive = alive & metropolis(jax.random.fold_in(keys[-1], ilev), dS)
    seg_fin = jnp.where(alive, seg, seg0)
    chain = lax.dynamic_update_slice(chain, seg_fin, (ii, 0))
    return set_chain(paths_w, ip, chain), alive


def _end_bisection(system: System, tables: Tables, key, paths_w, ip, active,
                   level: int, tail: bool):
    """Shared body of MoveHead/MoveTailBisection (vpi_mod.f90:1002-1372).

    tail=True runs on the bead-reversed segment (exact by time-reversal
    symmetry of the bridge construction and the Chin weights).
    """
    cfg = system.cfg
    M = system.M
    dt = cfg.dt
    seg_cap = 2 ** level
    k_n, k_g, k_acc0, *k_lev = jax.random.split(key, level + 4)
    # Nlev = int((level-1)*u)+2 in [2, level] (vpi_mod.f90:1023)
    nlev = jax.random.randint(k_n, (), 0, level - 1) + 2
    seg_len = 2 ** nlev                      # traced

    chain = get_chain(paths_w, ip)
    if tail:
        seg0 = chain[M - 1 - seg_cap:][::-1]
        R_seg = paths_w[M - 1 - seg_cap:][::-1]
        ib_seg = jnp.arange(M - 1, M - 2 - seg_cap, -1)
    else:
        seg0 = chain[: seg_cap + 1]
        R_seg = paths_w[: seg_cap + 1]
        ib_seg = jnp.arange(seg_cap + 1)

    # free-gaussian guess for the terminal bead, sigma = sqrt(2**Nlev*dt)
    # with its own accept gate (vpi_mod.f90:1039-1076)
    dtype = seg0.dtype
    xold0 = seg0[0]
    anchor = jnp.take(seg0, seg_len, axis=0)
    g = jax.random.normal(k_g, xold0.shape, dtype)
    xmid = xold0 - _mi(system, xold0 - anchor)
    xnew0 = _wrap_pos(system, xmid + jnp.sqrt(seg_len.astype(dtype) * dt) * g)
    dS0 = delta_action(system, tables, R_seg[:1], xnew0[None], xold0[None],
                       ip, ib_seg[:1])[0]
    alive = active & metropolis(k_acc0, dS0)
    seg = seg0.at[0].set(xnew0)

    for ilev in range(1, level + 1):
        seg, dS = _level_midpoints(system, tables, k_lev[ilev - 1], seg,
                                   R_seg, ib_seg, ip, ilev, nlev, level)
        lvl_on = ilev <= nlev
        acc = metropolis(jax.random.fold_in(k_lev[-1], ilev), dS)
        alive = alive & (acc | ~lvl_on)

    seg_fin = jnp.where(alive, seg, seg0)
    if tail:
        chain = chain.at[M - 1 - seg_cap:].set(seg_fin[::-1])
    else:
        chain = chain.at[: seg_cap + 1].set(seg_fin)
    return set_chain(paths_w, ip, chain), alive


def move_head_bisection(system, tables, key, paths_w, ip, active, level: int):
    return _end_bisection(system, tables, key, paths_w, ip, active, level,
                          tail=False)


def move_tail_bisection(system, tables, key, paths_w, ip, active, level: int):
    return _end_bisection(system, tables, key, paths_w, ip, active, level,
                          tail=True)
