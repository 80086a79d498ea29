"""Monte Carlo path updates (single walker; vmapped over the ensemble).

Each reference move subroutine (vpi_mod.f90) becomes a pure function
`(key, paths_w, ...) -> (paths_w', accepted)` on one walker's state
`paths_w[M, N, D]`; `parallel/sweep.py` vmaps these over the W walker axis.

Structural redesign vs the reference (see SURVEY.md §7):
  * The staging *free-particle* reconstruction is a cheap `lax.scan` over the
    window (the recursion is inherently sequential, vpi_mod.f90:531-533), but
    the expensive part — the per-bead interaction Delta-S (UpdateAction) —
    is hoisted out of the loop and evaluated for the whole window in ONE
    batched pair kernel (ops/pairwise.py).  This is exact because the other
    particles are frozen during a single-particle move.
  * Tail-type moves reuse the head-type machinery on the bead-reversed
    segment: the free-particle bridge construction and the Chin weights are
    symmetric under time reversal (M-1-ib keeps bead parity since 2*Nb is
    even), so the flipped move generates the identical distribution.
  * Variable window lengths (random Ls, vpi_mod.f90:601) use a static
    buffer of Lmax beads with inactive beads proposing xnew == xold, whose
    Delta-S contribution is exactly zero — no masking epsilon anywhere.

Every move draws from its own fold-in of the per-walker PRNG key, so the
ensemble is reproducible and order-independent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..system import System, Tables
from ..utils.pbc import minimum_image, wrap
from .pairwise import delta_action, delta_action_sum


# ---------------------------------------------------------------------------
# Small helpers
# ---------------------------------------------------------------------------

def metropolis(key, dS):
    """Metropolis accept for action change dS (vpi_mod.f90:356-364 pattern)."""
    u = jax.random.uniform(key, dS.shape if hasattr(dS, "shape") else ())
    return u < jnp.exp(-dS)


def _mi(system: System, x):
    """Single-image wrap of a displacement (identity under a trap)."""
    if system.pbc:
        return wrap(x, system.geo.Lbox)
    return x


def _wrap_pos(system: System, x):
    """BoundaryConditions equivalent for absolute positions."""
    if system.pbc:
        return wrap(x, system.geo.Lbox)
    return x


def get_chain(paths_w, ip):
    """Worldline of one particle: [M, D]."""
    return paths_w[:, ip, :]


def set_chain(paths_w, ip, chain):
    return paths_w.at[:, ip, :].set(chain)


# ---------------------------------------------------------------------------
# The segment-regrow workhorse
# ---------------------------------------------------------------------------

def segment_regrow(system: System, tables: Tables, key, seg, R_seg, ib_seg,
                   ip, Ls, first_mode: str, first_w, first_pos=None):
    """Regrow a path segment in 'head orientation'.

    seg:    [Lb+1, D] bead positions (index 0 = the end being regrown,
            index Ls = the fixed anchor; beads beyond Ls untouched)
    R_seg:  [Lb+1, N, D] all particles at the segment's beads
    ib_seg: [Lb+1] true bead indices (drive Chin weights / end-WF terms)
    Ls:     active segment length (2 <= Ls <= Lb; may be traced per walker)
    first_mode: 'gauss' — free-gaussian guess for bead 0 with
                  sigma = sqrt(Ls*dt) (MoveHead, vpi_mod.f90:619-645);
                'pin'   — set bead 0 := first_pos (CloseChain / Swap);
                'fixed' — keep bead 0 (interior Staging).
    first_w: weight multiplying the first bead's Delta-S (0.5 for the worm
             central bead, vpi_mod.f90:1573-1577; 0.0 for Swap's pin).

    Then beads 1..Ls-1 are rebuilt by the exact staging recursion
    (vpi_mod.f90:509-549) toward the anchor, and the interaction Delta-S of
    the whole window is evaluated in one batched pair kernel.

    Returns (seg_new, dS_first, dS_rest).
    """
    cfg = system.cfg
    dt = cfg.dt
    Lb = seg.shape[0] - 1
    D = seg.shape[-1]
    dtype = seg.dtype
    k_first, k_stag = jax.random.split(key)

    Ls = jnp.asarray(Ls, jnp.int32)
    anchor = jnp.take(seg, Ls, axis=0)  # fixed far end of the active window
    xold0 = seg[0]

    if first_mode == "gauss":
        g = jax.random.normal(k_first, (D,), dtype)
        xmid = xold0 - _mi(system, xold0 - anchor)  # unwrap anchor near xold0
        sigma = jnp.sqrt(Ls.astype(dtype) * dt)
        xnew0 = _wrap_pos(system, xmid + sigma * g)
    elif first_mode == "pin":
        xnew0 = jnp.asarray(first_pos, dtype)
    elif first_mode == "fixed":
        xnew0 = xold0
    else:
        raise ValueError(first_mode)

    if first_mode == "fixed":
        dS_first = jnp.zeros((), dtype)
    else:
        dS_first = first_w * delta_action(
            system, tables, R_seg[:1], xnew0[None], xold0[None], ip, ib_seg[:1])[0]

    # staging reconstruction of beads 1..Ls-1 (scan over the static buffer)
    xolds = seg[1:Lb]  # [Lb-1, D]
    gs = jax.random.normal(k_stag, (Lb - 1, D), dtype)

    def body(prev_new, inp):
        j, g, xold_j = inp
        active = j < Ls
        nrem = jnp.maximum(Ls - j, 1).astype(dtype)  # = Ls-j on active beads
        xprev = xold_j + _mi(system, prev_new - xold_j)
        xnext = xold_j - _mi(system, xold_j - anchor)
        sigma = jnp.sqrt(nrem / (nrem + 1.0) * dt)
        xmid = (xnext + xprev * nrem) / (nrem + 1.0)
        xnew_j = _wrap_pos(system, xmid + sigma * g)
        xnew_j = jnp.where(active, xnew_j, xold_j)
        return xnew_j, xnew_j

    _, xnews = lax.scan(body, xnew0, (jnp.arange(1, Lb), gs, xolds))

    dS_rest = delta_action_sum(
        system, tables, R_seg[1:Lb], xnews, xolds, ip, ib_seg[1:Lb])

    seg_new = seg.at[0].set(xnew0).at[1:Lb].set(xnews)
    return seg_new, dS_first, dS_rest


# ---------------------------------------------------------------------------
# Rigid translations (TranslateChain, vpi_mod.f90:313-379)
# ---------------------------------------------------------------------------

def translate_chain(system: System, tables: Tables, key, paths_w, ip, active,
                    delta):
    """Rigid CM displacement of one particle's whole worldline."""
    M = system.M
    D = system.cfg.dim
    k_dx, k_acc = jax.random.split(key)
    dx = delta * (2.0 * jax.random.uniform(k_dx, (D,), paths_w.dtype) - 1.0)
    chain = get_chain(paths_w, ip)
    xnew = _wrap_pos(system, chain + dx)
    dS = delta_action_sum(system, tables, paths_w, xnew, chain, ip,
                          jnp.arange(M))
    acc = metropolis(k_acc, dS) & active
    chain_new = jnp.where(acc, xnew, chain)
    return set_chain(paths_w, ip, chain_new), acc


def translate_half_chain(system: System, tables: Tables, key, paths_w, xend_w,
                         ip, half: int, active, delta):
    """Rigid displacement of one worm half (vpi_mod.f90:383-476).

    Bead Nb is first pinned to xend[half] (this pin persists even on
    rejection, exactly as in the reference, vpi_mod.f90:400-402).
    half is static: 1 -> beads [0..Nb], 2 -> beads [Nb..2Nb].
    """
    cfg = system.cfg
    Nb, D = cfg.Nb, cfg.dim
    k_dx, k_acc = jax.random.split(key)
    chain = get_chain(paths_w, ip).at[Nb].set(xend_w[half - 1])
    lo, hi = (0, Nb + 1) if half == 1 else (Nb, 2 * Nb + 1)
    ib_seg = jnp.arange(lo, hi)
    xold = chain[lo:hi]
    dx = delta * (2.0 * jax.random.uniform(k_dx, (D,), paths_w.dtype) - 1.0)
    xnew = _wrap_pos(system, xold + dx)
    dS = delta_action_sum(system, tables, paths_w[lo:hi], xnew, xold, ip,
                          ib_seg)
    acc = metropolis(k_acc, dS) & active
    seg_fin = jnp.where(acc, xnew, xold)
    chain = chain.at[lo:hi].set(seg_fin)
    xend_w = xend_w.at[half - 1].set(chain[Nb])
    return set_chain(paths_w, ip, chain), xend_w, acc


# ---------------------------------------------------------------------------
# Staging moves (Staging, vpi_mod.f90:480-578)
# ---------------------------------------------------------------------------

def staging_move(system: System, tables: Tables, key, paths_w, ip, active,
                 L: int):
    """Interior staging over a random window of L links."""
    M = system.M
    k_ii, k_reg, k_acc = jax.random.split(key, 3)
    ii = jax.random.randint(k_ii, (), 0, M - L)  # int((2Nb-L+1)*u), vpi_mod.f90:498
    chain = get_chain(paths_w, ip)
    seg = lax.dynamic_slice(chain, (ii, 0), (L + 1, chain.shape[1]))
    R_seg = lax.dynamic_slice(
        paths_w, (ii, 0, 0), (L + 1,) + paths_w.shape[1:])
    ib_seg = ii + jnp.arange(L + 1)
    seg_new, dS0, dSr = segment_regrow(
        system, tables, k_reg, seg, R_seg, ib_seg, ip, L, "fixed", 1.0)
    acc = metropolis(k_acc, dS0 + dSr) & active
    seg_fin = jnp.where(acc, seg_new, seg)
    chain = lax.dynamic_update_slice(chain, seg_fin, (ii, 0))
    return set_chain(paths_w, ip, chain), acc


def staging_half_chain(system: System, tables: Tables, key, paths_w, xend_w,
                       ip, half: int, active, L: int):
    """Staging confined to one worm half (vpi_mod.f90:1376-1491)."""
    cfg = system.cfg
    Nb = cfg.Nb
    k_ii, k_reg, k_acc = jax.random.split(key, 3)
    chain = get_chain(paths_w, ip).at[Nb].set(xend_w[half - 1])
    paths_pin = paths_w  # pin affects only the moved particle's own beads
    base = 0 if half == 1 else Nb
    ii = base + jax.random.randint(k_ii, (), 0, Nb - L + 1)
    seg = lax.dynamic_slice(chain, (ii, 0), (L + 1, chain.shape[1]))
    R_seg = lax.dynamic_slice(
        paths_pin, (ii, 0, 0), (L + 1,) + paths_w.shape[1:])
    ib_seg = ii + jnp.arange(L + 1)
    seg_new, dS0, dSr = segment_regrow(
        system, tables, k_reg, seg, R_seg, ib_seg, ip, L, "fixed", 1.0)
    acc = metropolis(k_acc, dS0 + dSr) & active
    seg_fin = jnp.where(acc, seg_new, seg)
    chain = lax.dynamic_update_slice(chain, seg_fin, (ii, 0))
    xend_w = xend_w.at[half - 1].set(chain[Nb])
    return set_chain(paths_w, ip, chain), xend_w, acc


# ---------------------------------------------------------------------------
# Head / tail open-end moves (MoveHead/MoveTail, vpi_mod.f90:582-860)
# ---------------------------------------------------------------------------

def _rand_ls(key, Lmax: int):
    """Ls = int((Lmax-1)*u)+2 in [2, Lmax] (vpi_mod.f90:601)."""
    return jax.random.randint(key, (), 0, Lmax - 1) + 2


def move_head(system: System, tables: Tables, key, paths_w, ip, active,
              Lmax: int):
    """Regrow the first Ls beads from a free-gaussian guess for bead 0."""
    k_ls, k_reg, k_acc = jax.random.split(key, 3)
    Ls = _rand_ls(k_ls, Lmax)
    chain = get_chain(paths_w, ip)
    seg = chain[: Lmax + 1]
    R_seg = paths_w[: Lmax + 1]
    ib_seg = jnp.arange(Lmax + 1)
    seg_new, dS0, dSr = segment_regrow(
        system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", 1.0)
    acc = metropolis(k_acc, dS0 + dSr) & active
    chain = chain.at[: Lmax + 1].set(jnp.where(acc, seg_new, seg))
    return set_chain(paths_w, ip, chain), acc


def move_tail(system: System, tables: Tables, key, paths_w, ip, active,
              Lmax: int):
    """Mirror of move_head at the far end, via the bead-reversed segment."""
    M = system.M
    k_ls, k_reg, k_acc = jax.random.split(key, 3)
    Ls = _rand_ls(k_ls, Lmax)
    chain = get_chain(paths_w, ip)
    seg = chain[M - 1 - Lmax:][::-1]
    R_seg = paths_w[M - 1 - Lmax:][::-1]
    ib_seg = jnp.arange(M - 1, M - 2 - Lmax, -1)
    seg_new, dS0, dSr = segment_regrow(
        system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", 1.0)
    acc = metropolis(k_acc, dS0 + dSr) & active
    chain = chain.at[M - 1 - Lmax:].set(jnp.where(acc, seg_new, seg)[::-1])
    return set_chain(paths_w, ip, chain), acc


def move_head_half_chain(system: System, tables: Tables, key, paths_w, xend_w,
                         ip, half: int, active, Lmax: int):
    """MoveHeadHalfChain (vpi_mod.f90:1495-1656): half=1 regrows from bead 0,
    half=2 from the central bead Nb (with the half-weight 1/2 on its dS)."""
    cfg = system.cfg
    Nb = cfg.Nb
    k_ls, k_reg, k_acc = jax.random.split(key, 3)
    Ls = _rand_ls(k_ls, Lmax)
    chain = get_chain(paths_w, ip).at[Nb].set(xend_w[half - 1])
    lo = 0 if half == 1 else Nb
    w0 = 1.0 if half == 1 else 0.5
    seg = chain[lo: lo + Lmax + 1]
    R_seg = paths_w[lo: lo + Lmax + 1]
    ib_seg = lo + jnp.arange(Lmax + 1)
    seg_new, dS0, dSr = segment_regrow(
        system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", w0)
    acc = metropolis(k_acc, dS0 + dSr) & active
    chain = chain.at[lo: lo + Lmax + 1].set(jnp.where(acc, seg_new, seg))
    xend_w = xend_w.at[half - 1].set(chain[Nb])
    return set_chain(paths_w, ip, chain), xend_w, acc


def move_tail_half_chain(system: System, tables: Tables, key, paths_w, xend_w,
                         ip, half: int, active, Lmax: int):
    """MoveTailHalfChain (vpi_mod.f90:1660-1817): half=1 regrows the central
    bead Nb (weight 1/2), half=2 the last bead 2*Nb."""
    cfg = system.cfg
    Nb, M = cfg.Nb, system.M
    k_ls, k_reg, k_acc = jax.random.split(key, 3)
    Ls = _rand_ls(k_ls, Lmax)
    chain = get_chain(paths_w, ip).at[Nb].set(xend_w[half - 1])
    hi = Nb if half == 1 else 2 * Nb  # bead being regrown (segment end)
    w0 = 0.5 if half == 1 else 1.0
    lo = hi - Lmax
    seg = chain[lo: hi + 1][::-1]
    R_seg = paths_w[lo: hi + 1][::-1]
    ib_seg = jnp.arange(hi, lo - 1, -1)
    seg_new, dS0, dSr = segment_regrow(
        system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", w0)
    acc = metropolis(k_acc, dS0 + dSr) & active
    chain = chain.at[lo: hi + 1].set(jnp.where(acc, seg_new, seg)[::-1])
    xend_w = xend_w.at[half - 1].set(chain[Nb])
    return set_chain(paths_w, ip, chain), xend_w, acc
