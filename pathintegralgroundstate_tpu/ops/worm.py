"""Worm algorithm: open / close / swap updates (vpi_mod.f90:1821-2487).

Single-walker implementations, vmapped over the ensemble by the sweeper.
Open/close toggle a per-walker `isopen` mask (replacing the reference's
global program branch, vpi.f90:304-473), so diagonal and off-diagonal
walkers coexist in one batch.  The swap partner's tower sampling over
kinetic weights (vpi_mod.f90:2311-2345) becomes a `jax.random.categorical`
draw on the kinetic logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..system import System, Tables
from ..utils.pbc import minimum_image
from .moves import get_chain, metropolis, segment_regrow, set_chain
from .pairwise import delta_action


def _rand_even_ls(key, Lmax: int):
    """Ls = 2*int(((Lmax-2)/2)*u)+2, even in [2, Lmax-2] (vpi_mod.f90:1846)."""
    return 2 * jax.random.randint(key, (), 0, (Lmax - 2) // 2) + 2


def _gap_rij2(system: System, xa, xb):
    xij = xa - xb
    if system.pbc:
        _, rij2 = minimum_image(xij, system.geo.Lbox)
    else:
        rij2 = jnp.sum(xij * xij, axis=-1)
    return rij2


def _broken_link_k(system: System, rij2, Ls):
    """DeltaK = -rij^2/(2*Ls*dt) - (d/2) log(2*pi*Ls*dt) (vpi_mod.f90:1872)."""
    cfg = system.cfg
    Lf = Ls.astype(rij2.dtype)
    return (-0.5 * rij2 / (Lf * cfg.dt)
            - 0.5 * cfg.dim * jnp.log(2.0 * jnp.pi * Lf * cfg.dt))


def open_chain(system: System, tables: Tables, key, paths_w, xend_w, ip,
               active, Lmax: int):
    """OpenChain (vpi_mod.f90:1821-2076).

    Returns (paths_w, xend_w, opened, accepted).  `opened` is the new isopen
    value contribution for this walker (True only on accept); on rejection
    xend is reset to the (restored) central bead, exactly as the reference
    (vpi_mod.f90:2066-2069).
    """
    cfg, geo = system.cfg, system.geo
    Nb = cfg.Nb
    k_ls, k_half, k_reg, k_acc = jax.random.split(key, 4)
    Ls = _rand_even_ls(k_ls, Lmax)
    half1 = jax.random.randint(k_half, (), 0, 2) == 0

    chain = get_chain(paths_w, ip)
    dS_base = -jnp.log(jnp.asarray(cfg.CWorm * geo.density, chain.dtype))

    def run(half1_static: bool):
        if half1_static:
            # ii = Nb-Ls, ie = Nb; head-oriented via the reversed segment
            seg = chain[Nb - (Lmax - 2): Nb + 1][::-1]
            R_seg = paths_w[Nb - (Lmax - 2): Nb + 1][::-1]
            ib_seg = jnp.arange(Nb, Nb - (Lmax - 2) - 1, -1)
        else:
            # ii = Nb, ie = Nb+Ls; head orientation directly
            seg = chain[Nb: Nb + (Lmax - 2) + 1]
            R_seg = paths_w[Nb: Nb + (Lmax - 2) + 1]
            ib_seg = Nb + jnp.arange((Lmax - 2) + 1)
        # broken-link kinetic term from the OLD gap (seg[0] old vs anchor)
        anchor = jnp.take(seg, Ls, axis=0)
        rij2 = _gap_rij2(system, seg[0], anchor)
        dK = _broken_link_k(system, rij2, Ls)
        seg_new, dS0, dSr = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", 0.5)
        return seg, seg_new, dS0 + dSr, dK

    sA_old, sA_new, dsA, dkA = run(True)
    sB_old, sB_new, dsB, dkB = run(False)
    dS = dS_base + jnp.where(half1, dsA, dsB)
    dK = jnp.where(half1, dkA, dkB)
    acc = metropolis(k_acc, dS + dK) & active

    # write back: only the chosen half's segment, only on accept
    segA = jnp.where(acc & half1, sA_new, sA_old)[::-1]
    segB = jnp.where(acc & ~half1, sB_new, sB_old)
    chain = chain.at[Nb - (Lmax - 2): Nb + 1].set(segA)
    chain = chain.at[Nb: Nb + (Lmax - 2) + 1].set(
        jnp.where(half1, chain[Nb: Nb + (Lmax - 2) + 1], segB))
    # ordering note: for half1 the final chain[Nb] comes from segA's bead Nb
    # (reference keeps the regrown value in Path for the chosen half)

    old_center = get_chain(paths_w, ip)[Nb]
    new_center = chain[Nb]
    xend1 = jnp.where(acc, jnp.where(half1, new_center, old_center), new_center)
    xend2 = jnp.where(acc, jnp.where(half1, old_center, new_center), new_center)
    xend_w = jnp.stack([xend1, xend2])

    return set_chain(paths_w, ip, chain), xend_w, acc, acc


def close_chain(system: System, tables: Tables, key, paths_w, xend_w, ip,
                active, Lmax: int):
    """CloseChain (vpi_mod.f90:2080-2266).

    Returns (paths_w, xend_w, closed_accept).
    """
    cfg, geo = system.cfg, system.geo
    Nb = cfg.Nb
    k_ls, k_half, k_reg, k_acc = jax.random.split(key, 4)
    Ls = _rand_even_ls(k_ls, Lmax)
    half1 = jax.random.randint(k_half, (), 0, 2) == 0

    chain = get_chain(paths_w, ip)
    dS_base = jnp.log(jnp.asarray(cfg.CWorm * geo.density, chain.dtype))

    def run(half1_static: bool):
        if half1_static:
            seg = chain[Nb - (Lmax - 2): Nb + 1][::-1]
            R_seg = paths_w[Nb - (Lmax - 2): Nb + 1][::-1]
            ib_seg = jnp.arange(Nb, Nb - (Lmax - 2) - 1, -1)
            pin = xend_w[1]  # close head side onto the tail end
        else:
            seg = chain[Nb: Nb + (Lmax - 2) + 1]
            R_seg = paths_w[Nb: Nb + (Lmax - 2) + 1]
            ib_seg = Nb + jnp.arange((Lmax - 2) + 1)
            pin = xend_w[0]
        seg_new, dS0, dSr = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "pin", 0.5,
            first_pos=pin)
        # closed-gap kinetic term from the NEW positions (vpi_mod.f90:2205-2219)
        anchor = jnp.take(seg_new, Ls, axis=0)
        rij2 = _gap_rij2(system, seg_new[0], anchor)
        dK = _broken_link_k(system, rij2, Ls)
        return seg, seg_new, dS0 + dSr, dK

    sA_old, sA_new, dsA, dkA = run(True)
    sB_old, sB_new, dsB, dkB = run(False)
    dS = dS_base + jnp.where(half1, dsA, dsB)
    dK = jnp.where(half1, dkA, dkB)
    acc = metropolis(k_acc, dS - dK) & active  # exp(-dS + dK), vpi_mod.f90:2223

    segA = jnp.where(acc & half1, sA_new, sA_old)[::-1]
    segB = jnp.where(acc & ~half1, sB_new, sB_old)
    chain = chain.at[Nb - (Lmax - 2): Nb + 1].set(segA)
    chain = chain.at[Nb: Nb + (Lmax - 2) + 1].set(
        jnp.where(half1, chain[Nb: Nb + (Lmax - 2) + 1], segB))

    center = chain[Nb]
    xend_new = jnp.stack([center, center])
    xend_w = jnp.where(acc, xend_new, xend_w)
    return set_chain(paths_w, ip, chain), xend_w, acc


def swap_move(system: System, tables: Tables, key, paths_w, xend_w, iw,
              active, Lmax: int):
    """Swap (vpi_mod.f90:2270-2487): permutation update exchanging the worm's
    tail half with a partner chosen by tower sampling over kinetic weights.

    Returns (paths_w, xend_w, accepted, partner).
    """
    cfg = system.cfg
    Nb = cfg.Nb
    dt = cfg.dt
    k_ls, k_pick, k_pre, k_reg, k_acc = jax.random.split(key, 5)
    Ls = _rand_even_ls(k_ls, Lmax)
    Lf = Ls.astype(paths_w.dtype)
    ii = Nb - Ls

    # kinetic weights of every particle's bead ii against the worm tail
    R_ii = jnp.take(paths_w, ii, axis=0)            # [N, D]
    rij2_w = _gap_rij2(system, R_ii, xend_w[1])     # [N]
    logits = -0.5 * rij2_w / (Lf * dt)
    Sw = jnp.sum(jnp.exp(logits))
    ik = jax.random.categorical(k_pick, logits)

    # reverse weights against the partner's central bead (vpi_mod.f90:2352-2371)
    x_ik_nb = paths_w[Nb, ik]
    rij2_k = _gap_rij2(system, R_ii, x_ik_nb)
    Sk = jnp.sum(jnp.exp(-0.5 * rij2_k / (Lf * dt)))

    pre = jax.random.uniform(k_pre) <= Sw / Sk
    ok = active & (ik != iw) & pre

    chain_iw = get_chain(paths_w, iw)
    chain_ik = get_chain(paths_w, ik)

    # regrow the partner's [Nb-Ls .. Nb] segment onto the worm tail
    # (pin bead Nb := xend2; the pin bead itself carries NO dS —
    #  vpi_mod.f90:2388-2436 accumulates only the staging beads)
    seg = chain_ik[Nb - (Lmax - 2): Nb + 1][::-1]
    R_seg = paths_w[Nb - (Lmax - 2): Nb + 1][::-1]
    ib_seg = jnp.arange(Nb, Nb - (Lmax - 2) - 1, -1)
    seg_new, _, dSr = segment_regrow(
        system, tables, k_reg, seg, R_seg, ib_seg, ik, Ls, "pin", 0.0,
        first_pos=xend_w[1])
    acc = ok & metropolis(k_acc, dSr)

    chain_ik_regrown = chain_ik.at[Nb - (Lmax - 2): Nb + 1].set(seg_new[::-1])

    # tail-half exchange (vpi_mod.f90:2450-2464):
    #   worm tail := partner's tail, then bead Nb := partner's old center;
    #   partner tail := worm's old tail.
    new_iw = chain_iw.at[Nb:].set(chain_ik_regrown[Nb:]).at[Nb].set(chain_ik[Nb])
    new_ik = chain_ik_regrown.at[Nb:].set(chain_iw[Nb:])

    out_iw = jnp.where(acc, new_iw, chain_iw)
    out_ik = jnp.where(acc, new_ik, chain_ik)
    paths_w = set_chain(paths_w, iw, out_iw)
    # write the partner only when it differs from the worm (guard ik == iw)
    paths_w = set_chain(paths_w, jnp.where(ik == iw, iw, ik),
                        jnp.where(ik == iw, out_iw, out_ik))
    xend_w = xend_w.at[1].set(jnp.where(acc, chain_ik[Nb], xend_w[1]))
    return paths_w, xend_w, acc, ik


def obdm_terms(system: System, xend_w):
    """One walker's OBDM accumulation terms (sample_mod.f90:480-526).

    Returns (ibin, weights[Npw+1], valid): histogram bin of |xend1 - xend2|
    and the cos(2 m theta) partial-wave weights.
    """
    cfg, geo = system.cfg, system.geo
    xij = xend_w[0] - xend_w[1]
    if system.pbc:
        xij, rij2 = minimum_image(xij, geo.Lbox)
    else:
        rij2 = jnp.sum(xij * xij)
    valid = rij2 <= geo.rcut2
    rij = jnp.sqrt(jnp.maximum(rij2, 1e-300))
    ibin = jnp.clip((rij / geo.rbin).astype(jnp.int32), 0, cfg.Nbin - 1)
    # partial waves from the (x, y) angle (2-D convention, sample_mod.f90:505)
    if cfg.dim >= 2:
        ct = xij[0] / rij
        st = xij[1] / rij
    else:
        ct = jnp.sign(xij[0])
        st = jnp.zeros_like(ct)
    e2 = jax.lax.complex(ct, st) ** 2
    m = jnp.arange(cfg.Npw + 1)
    w = jnp.real(e2 ** m)
    return ibin, w, valid
