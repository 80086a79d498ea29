"""Worm algorithm: open / close / swap updates (vpi_mod.f90:1821-2487),
batched over the walker ensemble.

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
from .moves import _cache_win_write, _codd_window, _codd_window_rev, \
    _slice_beads, get_chain, metropolis, segment_regrow, set_chain
from .pairwise import delta_action


def _rand_even_ls(key, W, Lmax: int):
    """Ls = 2*int(((Lmax-2)/2)*u)+2, even in [2, Lmax-2] (vpi_mod.f90:1846)."""
    return 2 * jax.random.randint(key, (W,), 0, (Lmax - 2) // 2,
                                  dtype=jnp.int32) + 2


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


def _half_segments(system: System, paths, chain, half1_static: bool,
                   Lmax: int):
    """Worm-center segment buffers in head orientation.

    half1 (beads Nb-Ls..Nb, regrown at Nb): the bead-reversed buffer
    [Nb-(Lmax-2) .. Nb]; half2 (beads Nb..Nb+Ls): the forward buffer.
    Segment starts (bead Nb) are even for even Nb => static parity Nb%2.
    """
    Nb = system.cfg.Nb
    W = paths.shape[0]
    Lb = Lmax - 2
    if half1_static:
        seg = chain[:, Nb - Lb: Nb + 1][:, ::-1]
        R_seg = paths[:, Nb - Lb: Nb + 1][:, ::-1]
        ib_seg = jnp.broadcast_to(jnp.arange(Nb, Nb - Lb - 1, -1),
                                  (W, Lb + 1))
    else:
        seg = chain[:, Nb: Nb + Lb + 1]
        R_seg = paths[:, Nb: Nb + Lb + 1]
        ib_seg = jnp.broadcast_to(Nb + jnp.arange(Lb + 1), (W, Lb + 1))
    return seg, R_seg, ib_seg


def _writeback_half(chain, half1, acc, sA_old, sA_new, sB_old, sB_new,
                    Nb, Lmax):
    """Write the chosen half's (possibly accepted) segment back."""
    Lb = Lmax - 2
    segA = jnp.where((acc & half1)[:, None, None], sA_new, sA_old)[:, ::-1]
    segB = jnp.where((acc & ~half1)[:, None, None], sB_new, sB_old)
    chain = chain.at[:, Nb - Lb: Nb + 1].set(segA)
    chain = chain.at[:, Nb: Nb + Lb + 1].set(
        jnp.where(half1[:, None, None], chain[:, Nb: Nb + Lb + 1], segB))
    return chain


def _half_fold(fodd, half1_static: bool, Nb: int, Lmax: int):
    """Odd-bead cache rows under a worm-center half segment's displaced
    rows 0..Lb-1, in segment orientation (half1: row r is bead Nb - r,
    reversed; half2 forward).  Returns (f, fold_sub, k_lo)."""
    Lb = Lmax - 2
    if half1_static:
        return _codd_window_rev(fodd, Nb, Nb % 2, Lb)
    return _codd_window(fodd, Nb, Nb % 2, Lb)


def _apply_half_dfield(fodd, half1, acc, infoA, infoB, Nb: int, Lmax: int):
    """Apply the chosen half's acc-gated cache increments.

    infoA/infoB = (dfield, k_lo) in each half's segment orientation.  The
    base rows are RE-SLICED from fodd before each write: when Nb is odd the
    two halves share the central cache row, and a stale base would revert
    the first write (the acc gates themselves are disjoint)."""
    from jax import lax as _lax
    dfA, kA = infoA
    gA = (acc & half1)[:, None, None, None]
    curA = _slice_beads(fodd, kA, dfA.shape[1])[:, ::-1]
    fodd = _lax.dynamic_update_slice_in_dim(
        fodd, (curA + jnp.where(gA, dfA, 0.0))[:, ::-1], kA, axis=1)
    dfB, kB = infoB
    gB = (acc & ~half1)[:, None, None, None]
    curB = _slice_beads(fodd, kB, dfB.shape[1])
    return _lax.dynamic_update_slice_in_dim(
        fodd, curB + jnp.where(gB, dfB, 0.0), kB, axis=1)


def open_chain(system: System, tables: Tables, key, paths, xend, ip,
               active, Lmax: int, fodd=None):
    """OpenChain (vpi_mod.f90:1821-2076) over the ensemble.

    Returns (paths, xend[, fodd], opened).  On rejection xend is reset to
    the (restored) central bead, exactly as the reference
    (vpi_mod.f90:2066-69).
    """
    cfg, geo = system.cfg, system.geo
    Nb = cfg.Nb
    W = paths.shape[0]
    k_ls, k_half, k_reg, k_acc = jax.random.split(key, 4)
    Ls = _rand_even_ls(k_ls, W, Lmax)
    half1 = jax.random.randint(k_half, (W,), 0, 2) == 0

    chain = get_chain(paths, ip)
    dS_base = -jnp.log(jnp.asarray(cfg.CWorm * geo.density, chain.dtype))

    oh_ls = (jnp.arange(Lmax - 1) == Ls[:, None]).astype(chain.dtype)

    def run(half1_static):
        seg, R_seg, ib_seg = _half_segments(system, paths, chain,
                                            half1_static, Lmax)
        anchor = jnp.einsum("wld,wl->wd", seg, oh_ls)
        rij2 = _gap_rij2(system, seg[:, 0], anchor)
        dK = _broken_link_k(system, rij2, Ls)
        if fodd is not None:
            fold, sub, kk = _half_fold(fodd, half1_static, Nb, Lmax)
            seg_new, dS, dfield = segment_regrow(
                system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss",
                0.5, fold=fold, fold_sub=sub)
            return seg, seg_new, dS, dK, (dfield, kk)
        seg_new, dS = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "gauss", 0.5)
        return seg, seg_new, dS, dK, None

    sA_old, sA_new, dsA, dkA, dfA = run(True)
    sB_old, sB_new, dsB, dkB, dfB = run(False)
    dS = dS_base + jnp.where(half1, dsA, dsB)
    dK = jnp.where(half1, dkA, dkB)
    acc = metropolis(k_acc, dS + dK) & active

    old_center = chain[:, Nb]
    chain = _writeback_half(chain, half1, acc, sA_old, sA_new, sB_old,
                            sB_new, Nb, Lmax)
    new_center = chain[:, Nb]
    xend1 = jnp.where(acc[:, None],
                      jnp.where(half1[:, None], new_center, old_center),
                      new_center)
    xend2 = jnp.where(acc[:, None],
                      jnp.where(half1[:, None], old_center, new_center),
                      new_center)
    xend = jnp.stack([xend1, xend2], axis=1)
    paths = set_chain(paths, ip, chain)
    if fodd is not None:
        fodd = _apply_half_dfield(fodd, half1, acc, dfA, dfB, Nb, Lmax)
        return paths, xend, fodd, acc
    return paths, xend, acc


def close_chain(system: System, tables: Tables, key, paths, xend, ip,
                active, Lmax: int, fodd=None):
    """CloseChain (vpi_mod.f90:2080-2266) over the ensemble."""
    cfg, geo = system.cfg, system.geo
    Nb = cfg.Nb
    W = paths.shape[0]
    k_ls, k_half, k_reg, k_acc = jax.random.split(key, 4)
    Ls = _rand_even_ls(k_ls, W, Lmax)
    half1 = jax.random.randint(k_half, (W,), 0, 2) == 0

    chain = get_chain(paths, ip)
    dS_base = jnp.log(jnp.asarray(cfg.CWorm * geo.density, chain.dtype))
    oh_ls = (jnp.arange(Lmax - 1) == Ls[:, None]).astype(chain.dtype)

    def run(half1_static):
        seg, R_seg, ib_seg = _half_segments(system, paths, chain,
                                            half1_static, Lmax)
        pin = xend[:, 1] if half1_static else xend[:, 0]
        if fodd is not None:
            fold, sub, kk = _half_fold(fodd, half1_static, Nb, Lmax)
            seg_new, dS, dfield = segment_regrow(
                system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "pin",
                0.5, first_pos=pin, fold=fold, fold_sub=sub)
            dfield = (dfield, kk)
        else:
            seg_new, dS = segment_regrow(
                system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "pin",
                0.5, first_pos=pin)
            dfield = None
        # closed-gap kinetic term from the NEW positions (vpi_mod.f90:2205-19)
        anchor = jnp.einsum("wld,wl->wd", seg_new, oh_ls)
        rij2 = _gap_rij2(system, seg_new[:, 0], anchor)
        dK = _broken_link_k(system, rij2, Ls)
        return seg, seg_new, dS, dK, dfield

    sA_old, sA_new, dsA, dkA, dfA = run(True)
    sB_old, sB_new, dsB, dkB, dfB = run(False)
    dS = dS_base + jnp.where(half1, dsA, dsB)
    dK = jnp.where(half1, dkA, dkB)
    acc = metropolis(k_acc, dS - dK) & active  # exp(-dS+dK), vpi_mod.f90:2223

    chain = _writeback_half(chain, half1, acc, sA_old, sA_new, sB_old,
                            sB_new, Nb, Lmax)
    center = chain[:, Nb]
    xend_new = jnp.stack([center, center], axis=1)
    xend = jnp.where(acc[:, None, None], xend_new, xend)
    paths = set_chain(paths, ip, chain)
    if fodd is not None:
        fodd = _apply_half_dfield(fodd, half1, acc, dfA, dfB, Nb, Lmax)
        return paths, xend, fodd, acc
    return paths, xend, acc


def swap_move(system: System, tables: Tables, key, paths, xend, iw,
              active, Lmax: int, fodd=None):
    """Swap (vpi_mod.f90:2270-2487): permutation update exchanging the worm's
    tail half with a partner chosen by tower sampling over kinetic weights.

    Returns (paths, xend[, fodd], accepted, partner[W]).

    Cache semantics on accept: (a) the partner's regrown interior beads
    Nb-Ls+1..Nb-1 get the segment_regrow increments; (b) beads Nb..2Nb are
    a pure LABEL swap between iw and ik — the per-bead configuration is the
    same set of positions, so only the two particles' force columns swap
    (F_iw[b] <-> F_ik[b]); every other column is untouched."""
    cfg = system.cfg
    Nb = cfg.Nb
    dt = cfg.dt
    W, M, N, D = paths.shape
    k_ls, k_pick, k_pre, k_reg, k_acc = jax.random.split(key, 5)
    Ls = _rand_even_ls(k_ls, W, Lmax)
    Lf = Ls.astype(paths.dtype)
    ii = Nb - Ls  # [W]

    # kinetic weights of every particle's bead ii against the worm tail
    # (one-hot contraction over beads; per-row gathers serialize on TPU)
    oh_ii = (jnp.arange(M) == ii[:, None]).astype(paths.dtype)   # [W, M]
    R_ii = jnp.einsum("wmnd,wm->wnd", paths, oh_ii)              # [W, N, D]
    rij2_w = _gap_rij2(system, R_ii, xend[:, 1][:, None, :])  # [W, N]
    logits = -0.5 * rij2_w / (Lf[:, None] * dt)
    Sw = jnp.sum(jnp.exp(logits), axis=-1)
    ik = jax.random.categorical(k_pick, logits).astype(jnp.int32)  # [W]

    # reverse weights against the partner's central bead (vpi_mod.f90:2352-71)
    oh_ik = (jnp.arange(N) == ik[:, None]).astype(paths.dtype)   # [W, N]
    x_ik_nb = jnp.einsum("wnd,wn->wd", paths[:, Nb], oh_ik)      # [W, D]
    rij2_k = _gap_rij2(system, R_ii, x_ik_nb[:, None, :])
    Sk = jnp.sum(jnp.exp(-0.5 * rij2_k / (Lf[:, None] * dt)), axis=-1)

    pre = jax.random.uniform(k_pre, (W,)) <= Sw / Sk
    ok = active & (ik != iw) & pre

    chain_iw = get_chain(paths, iw)
    chain_ik = get_chain(paths, ik)

    # regrow the partner's [Nb-Ls .. Nb] segment onto the worm tail
    # (pin bead Nb := xend2; the pin bead itself carries NO dS —
    #  vpi_mod.f90:2388-2436 accumulates only the staging beads)
    Lb = Lmax - 2
    seg = chain_ik[:, Nb - Lb: Nb + 1][:, ::-1]
    R_seg = paths[:, Nb - Lb: Nb + 1][:, ::-1]
    ib_seg = jnp.broadcast_to(jnp.arange(Nb, Nb - Lb - 1, -1), (W, Lb + 1))
    if fodd is not None:
        f_seg, sub, k_lo = _codd_window_rev(fodd, Nb, Nb % 2, Lb)
        seg_new, dSr, dfield = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ik, Ls, "pin", 0.0,
            first_pos=xend[:, 1], fold=f_seg, fold_sub=sub)
    else:
        seg_new, dSr = segment_regrow(
            system, tables, k_reg, seg, R_seg, ib_seg, ik, Ls, "pin", 0.0,
            first_pos=xend[:, 1])
    acc = ok & metropolis(k_acc, dSr)

    chain_ik_regrown = chain_ik.at[:, Nb - Lb: Nb + 1].set(seg_new[:, ::-1])

    # tail-half exchange (vpi_mod.f90:2450-2464):
    #   worm tail := partner's tail, then bead Nb := partner's old center;
    #   partner tail := worm's old tail.
    new_iw = chain_iw.at[:, Nb:].set(chain_ik_regrown[:, Nb:])
    new_iw = new_iw.at[:, Nb].set(chain_ik[:, Nb])
    new_ik = chain_ik_regrown.at[:, Nb:].set(chain_iw[:, Nb:])

    a3 = acc[:, None, None]
    out_iw = jnp.where(a3, new_iw, chain_iw)
    out_ik = jnp.where(a3, new_ik, chain_ik)
    paths = set_chain(paths, iw, out_iw)
    # write the partner only when it differs from the worm (guard ik == iw)
    safe_ik = jnp.where(ik == iw, iw, ik)
    paths = set_chain(paths, safe_ik,
                      jnp.where((ik == iw)[:, None, None], out_iw, out_ik))
    xend = xend.at[:, 1].set(
        jnp.where(acc[:, None], chain_ik[:, Nb], xend[:, 1]))
    if fodd is not None:
        # (a) regrow increments at the odd beads of [Nb-Lb, Nb] (the pin
        # row has zero increment, so a shared central row is harmless)
        fodd = _cache_win_write(fodd, f_seg, dfield, acc, k_lo,
                                reverse=True)
        # (b) label swap of the iw/ik force columns at the odd beads of
        # [Nb, 2Nb] (cache rows k_sw..Nb-1; positions at those beads are
        # the same SET after the tail exchange, so only the two particles'
        # force columns swap)
        k_sw = (Nb + (Nb + 1) % 2) // 2  # cache row of first odd bead >= Nb
        f_tail = fodd[:, k_sw:]
        dtype = f_tail.dtype
        oh_iw = jnp.arange(N) == iw[:, None]                  # [W, N]
        oh_ik = jnp.arange(N) == safe_ik[:, None]
        f_iw = jnp.einsum("wbnd,wn->wbd", f_tail, oh_iw.astype(dtype))
        f_ik = jnp.einsum("wbnd,wn->wbd", f_tail, oh_ik.astype(dtype))
        swapped = jnp.where(
            oh_iw[:, None, :, None], f_ik[:, :, None, :],
            jnp.where(oh_ik[:, None, :, None], f_iw[:, :, None, :], f_tail))
        gate = (acc & (ik != iw))[:, None, None, None]
        fodd = lax.dynamic_update_slice_in_dim(
            fodd, jnp.where(gate, swapped, f_tail), k_sw, axis=1)
        return paths, xend, fodd, acc, ik
    return paths, xend, acc, ik


def obdm_terms(system: System, xend):
    """OBDM accumulation terms over the ensemble (sample_mod.f90:480-526).

    xend [W, 2, D] -> (ibin[W], weights[W, Npw+1], valid[W]): histogram bin
    of |xend1 - xend2| and the cos(2 m theta) partial-wave weights.
    """
    cfg, geo = system.cfg, system.geo
    xij = xend[:, 0] - xend[:, 1]
    if system.pbc:
        xij, rij2 = minimum_image(xij, geo.Lbox)
    else:
        rij2 = jnp.sum(xij * xij, axis=-1)
    valid = rij2 <= geo.rcut2
    rij = jnp.sqrt(jnp.maximum(rij2, 1e-30))
    ibin = jnp.clip((rij / geo.rbin).astype(jnp.int32), 0, cfg.Nbin - 1)
    # partial waves from the (x, y) angle (2-D convention,
    # sample_mod.f90:505): cos(2 m theta), computed as a real cosine table
    # rather than complex powers — Re[(e^{i theta})^{2m}] needs an
    # int->complex convert that the TPU x64 path cannot lower (a real f64
    # worm run crashed on it), and the trig form is the reference's own
    # expression anyway
    if cfg.dim >= 2:
        theta = jnp.arctan2(xij[:, 1], xij[:, 0])
    else:
        # 1-D: the old complex form gave sign(x)^2m == 1 for every wave
        theta = jnp.where(xij[:, 0] >= 0, 0.0, jnp.pi).astype(rij.dtype)
    m = jnp.arange(cfg.Npw + 1, dtype=rij.dtype)
    w = jnp.cos(2.0 * theta[:, None] * m[None, :])
    return ibin, w, valid
