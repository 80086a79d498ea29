"""Batched pair-interaction kernels — the engine's hot path.

These are the TPU-native re-expressions of the reference's innermost O(Np)
partner loops:

  UpdatePot  (vpi_mod.f90:2660-2841)  -> delta_pot
  UpdateWf   (vpi_mod.f90:2534-2656)  -> delta_wf
  UpdateAction (vpi_mod.f90:2491-2530) -> delta_action

The key structural change: the reference evaluates one displaced bead at a
time inside a scalar loop; here a whole *window* of B displaced beads (and,
via vmap, W walkers) is evaluated in one fused tensor computation of shape
[B, N].  This is exact — during a single-particle move the other particles'
positions at each bead are constant, so the per-bead Delta-S terms are
independent (see SURVEY.md §7 'Moves as batched kernels').

Shapes (single walker; vmap adds the leading W axis):
  R     [B, N, D]  positions of all particles at the B displaced beads
  xnew  [B, D]     proposed positions of the moved particle
  xold  [B, D]     current positions of the moved particle
  ip    scalar     moved-particle index (self-pair excluded)
  ib    [B]        bead indices (select Chin weights / end-WF terms)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax

from ..models import jastrow as jas
from ..system import System, Tables
from ..utils.interpolate import interpolate
from ..utils.pbc import minimum_image


def _self_mask(R, ip):
    """notself mask broadcastable against [..., B, N] pair arrays.

    ip may be a scalar (one particle for the whole batch), a [W] array
    (per-walker particle, e.g. the worm), or a [W, B] array (per-row
    particle — the fused multi-particle moves, ops/bisection.bisection_multi,
    where different window rows belong to different particles);
    R is [..., B, N, D]."""
    N = R.shape[-2]
    iota = jnp.arange(N)
    ip = jnp.asarray(ip)
    if ip.ndim == 0:
        return iota != ip  # [N]
    if ip.ndim == 2:
        # [W, B] -> [W, B, N]
        return iota[None, None, :] != ip[:, :, None]
    # [W] -> [W, 1, N] against [W, B, N]
    return iota[None, None, :] != ip[:, None, None]


def _pair_terms(system: System, x, R, ip):
    """Displacements of x[..., B, D] against all partners R[..., B, N, D].

    Returns (mask, rij2, r, xij) with self-pair masked out and the minimum
    image applied under PBC.  r is 1.0 at masked slots (safe for 1/r).
    Works single-walker ([B, ...]) and batched ([W, B, ...]).
    """
    xij = x[..., None, :] - R  # [..., B, N, D]
    if system.pbc:
        xij, rij2 = minimum_image(xij, system.geo.Lbox)
    else:
        rij2 = jnp.sum(xij * xij, axis=-1)
    notself = _self_mask(R, ip)
    r = jnp.sqrt(jnp.where(notself, rij2, 1.0))
    notself = jnp.broadcast_to(notself, rij2.shape)
    return notself, rij2, r, xij


def _v_of_r(system: System, tables: Tables, r):
    if system.cfg.v_table and tables.vtab is not None:
        return interpolate(0, system.geo.dr, tables.vtab, r)
    return system.potential.v(r)


def _dv_of_r(system: System, tables: Tables, r):
    if system.cfg.v_table and tables.vtab is not None:
        return interpolate(1, system.geo.dr, tables.vtab, r)
    return system.potential.dvdr(r)


def _v_dv_of_r(system: System, tables: Tables, r, rinv=None):
    """Fused (V, dV/dr): one transcendental pass on the closed-form path."""
    if system.cfg.v_table and tables.vtab is not None:
        return (interpolate(0, system.geo.dr, tables.vtab, r),
                interpolate(1, system.geo.dr, tables.vtab, r))
    try:
        return system.potential.v_dv(r, rinv)
    except TypeError:
        return system.potential.v_dv(r)


def _u_of_r(system: System, tables: Tables, r):
    if system.cfg.wf_table and tables.logwf is not None:
        return interpolate(0, system.geo.dr, tables.logwf, r)
    return system.u(r)


def force_field(system: System, tables: Tables, R):
    """Per-particle total force field F[..., N, D] of configurations
    R[..., N, D] (pair dV/dr components within rcut + trap gradient) —
    the quantity whose squared norm enters the Chin action's F^2 term.
    Matches the reference's force convention F_i = sum_j V'(r_ij)
    (x_i - x_j)/r_ij (vpi_mod.f90:2733-2743)."""
    geo, cfg = system.geo, system.cfg
    N = R.shape[-2]
    xij = R[..., :, None, :] - R[..., None, :, :]
    if system.pbc:
        xij, rij2 = minimum_image(xij, geo.Lbox)
    else:
        rij2 = jnp.sum(xij * xij, axis=-1)
    notself = ~jnp.eye(N, dtype=bool)
    m = notself & (rij2 <= geo.rcut2) if system.pbc else notself
    r = jnp.sqrt(jnp.where(notself, rij2, 1.0))
    fr = jnp.where(m, _dv_of_r(system, tables, r) / r, 0.0)
    F = jnp.sum(fr[..., None] * xij, axis=-2)
    if cfg.trap:
        F = F + jas.trap_pot_grad(cfg.a_ho, R)
    return F


def delta_pot_cached(system: System, tables: Tables, R, xnew, xold, ip,
                     fold):
    """Exact Chin Delta-F^2 at O(N B) per displaced bead via the force-field
    cache (production form of cfg.exact_f2; the brute-force field difference
    in delta_pot is the O(N^2 B) validation form).

    fold[..., B, N, D]: current per-particle forces at the displaced beads
    (rows aligned with R).  Exploits that moving particle ip changes F_ip
    entirely and every partner j by the single pair component
    dg_j = f_{j<-ip}^new - f_{j<-ip}^old = -(fr_n dx_n - fr_o dx_o):

        dF^2 = |F_ip^new|^2 - |F_ip^old|^2
             + sum_j (2 fold_j . dg_j + |dg_j|^2)

    Returns (dpot, df2, dfield) with dfield[..., B, N, D] the per-particle
    force-field increment of the move (dfield[ip] = F_ip^new - F_ip^old), to
    be added to the cache for accepted proposals.
    """
    geo, cfg = system.geo, system.cfg

    def side(x):
        notself, rij2, r, xij = _pair_terms(system, x, R, ip)
        rinv = lax.rsqrt(jnp.where(notself, rij2, 1.0))
        m = notself & (rij2 <= geo.rcut2) if system.pbc else notself
        vv, dv = _v_dv_of_r(system, tables, r, rinv)
        pot = jnp.sum(jnp.where(m, vv, 0.0), axis=-1)
        fpair = jnp.where(m, dv * rinv, 0.0)[..., None] * xij  # [., B, N, D]
        F = jnp.sum(fpair, axis=-2)                            # [., B, D]
        if cfg.trap:
            pot = pot + jas.trap_pot(cfg.a_ho, x)
            F = F + jas.trap_pot_grad(cfg.a_ho, x)
        return pot, F, fpair

    pot_n, F_n, fp_n = side(xnew)
    pot_o, F_o, fp_o = side(xold)
    dpot = pot_n - pot_o
    # partner force increments: force ON j from ip is -(pair component)
    dg = -(fp_n - fp_o)                                        # [., B, N, D]
    df2 = (jnp.sum(F_n * F_n, axis=-1) - jnp.sum(F_o * F_o, axis=-1)
           + jnp.sum(2.0 * fold * dg + dg * dg, axis=(-1, -2)))
    sel = ~_self_mask(R, ip)[..., None]                        # [., B, N, 1]
    dfield = jnp.where(sel, (F_n - F_o)[..., None, :], dg)
    return dpot, df2, dfield


def delta_pot(system: System, tables: Tables, R, xnew, xold, ip,
              with_force: bool = True):
    """Potential-energy and force-squared deltas for displaced beads.

    Equivalent of UpdatePot (vpi_mod.f90:2660-2841): for each displaced bead,
    dPot = sum_j [V(r_new_j) - V(r_old_j)] over partners j != ip within rcut,
    dF2  = |F_new|^2 - |F_old|^2 where F is the moved particle's total pair
    force (table-derivative or analytic dV/dr), plus trap one-body terms.

    Returns (dPot[B], dF2[B]); dF2 is zeros when with_force=False.
    """
    geo, cfg = system.geo, system.cfg

    if with_force and cfg.exact_f2:
        # EXACT Chin F^2 (deviation from the reference — vpi_mod.f90:2825
        # tracks only the MOVED particle's |F_ip|^2 change, omitting the
        # partners' force changes; that Delta-S is not the difference of any
        # state function, so the reference samples a move-mix-dependent
        # distortion of the Chin measure — measured at ~0.5 K/atom on the
        # He-4 flagship, see docs/VALIDATION.md).  Here: brute-force
        # difference of the full force field F^2 = sum_i |F_i|^2 between the
        # proposed and current configurations.  O(N^2 B) per move — the
        # validation/reference-quality path; production uses the same
        # semantics at O(N B) via the incremental force-field cache when
        # available.
        dpot, _ = delta_pot(system, tables, R, xnew, xold, ip,
                            with_force=False)
        notself = _self_mask(R, ip)
        sel = ~notself[..., None]                       # [..., B, N, 1]
        Rn = jnp.where(sel, xnew[..., None, :], R)
        _, f2n = pair_pot(system, tables, Rn, with_force=True)
        _, f2o = pair_pot(system, tables, R, with_force=True)
        return dpot, f2n - f2o

    if cfg.use_pallas and jnp.ndim(R) == 4:
        from .pallas_kernels import pallas_ok, pair_delta_pallas
        if pallas_ok(system, R):
            return pair_delta_pallas(system, R, xnew, xold, ip, with_force)

    def side(x):
        notself, rij2, r, xij = _pair_terms(system, x, R, ip)
        rinv = lax.rsqrt(jnp.where(notself, rij2, 1.0))
        if system.pbc:
            m = notself & (rij2 <= geo.rcut2)
        else:
            m = notself  # trap branch: no cutoff on pair terms
        F = None
        if with_force:
            vv, dv = _v_dv_of_r(system, tables, r, rinv)
            pot = jnp.sum(jnp.where(m, vv, 0.0), axis=-1)
            fr = jnp.where(m, dv * rinv, 0.0)
            F = jnp.sum(fr[..., None] * xij, axis=-2)  # [B, D]
        else:
            pot = jnp.sum(jnp.where(m, _v_of_r(system, tables, r), 0.0),
                          axis=-1)
        if cfg.trap:
            pot = pot + jas.trap_pot(cfg.a_ho, x)
            if with_force:
                F = F + jas.trap_pot_grad(cfg.a_ho, x)
        return pot, F

    pot_new, F_new = side(xnew)
    pot_old, F_old = side(xold)
    dpot = pot_new - pot_old
    if with_force:
        df2 = jnp.sum(F_new * F_new, axis=-1) - jnp.sum(F_old * F_old, axis=-1)
    else:
        df2 = jnp.zeros_like(dpot)
    return dpot, df2


def delta_wf(system: System, tables: Tables, R, xnew, xold, ip):
    """Trial-wavefunction log delta (UpdateWf, vpi_mod.f90:2534-2656).

    dLogPsi[B] = sum_j [u(r_new_j) - u(r_old_j)] (+ trap one-body terms).
    """
    geo, cfg = system.geo, system.cfg

    if cfg.use_pallas and jnp.ndim(R) == 4:
        from .pallas_kernels import pallas_ok_wf, pair_u_pallas
        if pallas_ok_wf(system, R):
            return pair_u_pallas(system, R, xnew, xold, ip)

    def side(x):
        notself, rij2, r, _ = _pair_terms(system, x, R, ip)
        if system.pbc:
            m = notself & (rij2 <= geo.rcut2)
        else:
            m = notself
        u = jnp.where(m, _u_of_r(system, tables, r), 0.0)
        psi = jnp.sum(u, axis=-1)
        if cfg.trap:
            psi = psi + jas.trap_psi(cfg.a_ho, x)
        return psi

    return side(xnew) - side(xold)


def delta_action(system: System, tables: Tables, R, xnew, xold, ip, ib,
                 with_force: bool = True):
    """Per-bead action delta (UpdateAction, vpi_mod.f90:2491-2530), batched.

    dS[B] = -dLogPsi * [ib at either end]
            + wv(ib) * dPot + wf(ib) * dF2      (Chin opt=0 weights)

    F^2 enters only on odd interior beads (weight zero elsewhere); the trial
    WF only at beads 0 and 2*Nb (vpi_mod.f90:2509-2525).

    This is the dense reference-semantics form (forces and WF evaluated on
    every bead, masked by the weights) — used for parity tests and small
    windows.  The sampler's hot path uses delta_action_sum below.
    """
    M = system.M
    dt = system.cfg.dt
    ib = jnp.asarray(ib)
    interior = (ib > 0) & (ib < M - 1)
    odd = interior & (ib % 2 == 1)
    even_int = interior & (ib % 2 == 0)
    is_end = ~interior

    # callers whose rows are never odd-interior (chain ends / worm center)
    # pass with_force=False: the F^2 weight is zero there, and skipping the
    # force pass keeps cfg.exact_f2's O(N^2) brute branch off those rows
    dpot, df2 = delta_pot(system, tables, R, xnew, xold, ip,
                          with_force=with_force)

    wv = jnp.where(odd, 4.0 * dt / 3.0,
                   jnp.where(even_int, 2.0 * dt / 3.0, dt / 3.0))
    wf = jnp.where(odd, (4.0 * dt / 3.0) * dt * dt / 6.0, 0.0) \
        if with_force else 0.0

    dS = wv * dpot + wf * df2

    dlogpsi = delta_wf(system, tables, R, xnew, xold, ip)
    dS = dS - jnp.where(is_end, dlogpsi, 0.0)
    return dS


def delta_action_sum(system: System, tables: Tables, R, xnew, xold, ip, ib,
                     start_parity: Optional[int] = None, fold=None):
    """Summed window action delta — the optimized hot path.

    Exploits three structural facts of the Chin action over a contiguous
    (or bead-reversed) window:
      * bead parity alternates along the window, so the odd beads (the only
        ones needing the F^2 force pass) are every second row — evaluated
        with the fused v+dv kernel on a half-size subset;
      * even beads need the potential only;
      * the trial-WF terms live exclusively on beads 0 and 2*Nb
        (vpi_mod.f90:2519-2525), which can only be the window's first or
        last row — so the O(N) Jastrow pass runs on at most 2 rows.

    start_parity: parity of ib[0] when known statically (all sampler windows
    are even-aligned, see ops/moves.py) — turns the subset selection into
    static strided slices.  None falls back to dynamic gathers
    (single-walker only).

    Shapes: R [..., B, N, D]; xnew/xold [..., B, D]; ib [..., B].
    Returns the window sum with the batch shape (scalar single-walker,
    [W] batched).  Numerically identical to summing delta_action over the
    window's bead axis.
    """
    M = system.M
    dt = system.cfg.dt
    ib = jnp.asarray(ib)
    B = R.shape[-3]
    dtype = xnew.dtype

    if B == 1:
        assert fold is None, "fold requires a multi-bead window (B > 1)"
        return jnp.sum(delta_action(system, tables, R, xnew, xold, ip, ib),
                       axis=-1)

    dfield = None
    if start_parity is not None:
        # static strided subsets: odd beads at positions (1-start_parity)::2
        po = (1 - start_parity) % 2
        pe = start_parity % 2
        if fold is not None:
            # force-field-cached exact Chin F^2 (rows must align with the
            # odd subset); returns the field increment for accepted moves
            dpot_o, df2_o, dfield = delta_pot_cached(
                system, tables, R[..., po::2, :, :], xnew[..., po::2, :],
                xold[..., po::2, :], ip, fold)
        else:
            dpot_o, df2_o = delta_pot(
                system, tables, R[..., po::2, :, :], xnew[..., po::2, :],
                xold[..., po::2, :], ip, with_force=True)
        dS = jnp.sum((4.0 * dt / 3.0) * dpot_o
                     + (2.0 * dt ** 3 / 9.0) * df2_o, axis=-1)
        dpot_e, _ = delta_pot(
            system, tables, R[..., pe::2, :, :], xnew[..., pe::2, :],
            xold[..., pe::2, :], ip, with_force=False)
        ib_e = ib[..., pe::2]
        interior_e = (ib_e > 0) & (ib_e < M - 1)
        wv_e = jnp.where(interior_e, 2.0 * dt / 3.0, dt / 3.0)
        dS = dS + jnp.sum(wv_e * dpot_e, axis=-1)
    else:
        if R.ndim != 3:
            raise ValueError("dynamic-parity path supports single-walker "
                             "windows only; pass start_parity when batched")
        Bh = (B + 1) // 2
        k = jnp.arange(Bh)
        ib0 = ib[0]
        p_odd = ((ib0 + 1) % 2) + 2 * k
        p_even = (ib0 % 2) + 2 * k
        v_odd = p_odd < B
        v_even = p_even < B
        p_odd_c = jnp.minimum(p_odd, B - 1)
        p_even_c = jnp.minimum(p_even, B - 1)

        dpot_o, df2_o = delta_pot(system, tables, R[p_odd_c], xnew[p_odd_c],
                                  xold[p_odd_c], ip, with_force=True)
        dS_o = (4.0 * dt / 3.0) * dpot_o + (2.0 * dt ** 3 / 9.0) * df2_o
        dS = jnp.sum(jnp.where(v_odd, dS_o, 0.0))

        dpot_e, _ = delta_pot(system, tables, R[p_even_c], xnew[p_even_c],
                              xold[p_even_c], ip, with_force=False)
        ib_e = ib[p_even_c]
        interior_e = (ib_e > 0) & (ib_e < M - 1)
        wv_e = jnp.where(interior_e, 2.0 * dt / 3.0, dt / 3.0)
        dS = dS + jnp.sum(jnp.where(v_even, wv_e * dpot_e, 0.0))

    # chain-end WF terms: only window rows 0 and B-1 can be beads 0 / 2*Nb
    rows = jnp.array([0, B - 1])
    is_end = (jnp.take(ib, rows, axis=-1) == 0) | \
             (jnp.take(ib, rows, axis=-1) == M - 1)
    dwf = delta_wf(system, tables, jnp.take(R, rows, axis=-3),
                   jnp.take(xnew, rows, axis=-2),
                   jnp.take(xold, rows, axis=-2), ip)
    dS = dS - jnp.sum(jnp.where(is_end, dwf, 0.0), axis=-1)
    if fold is not None:
        return dS.astype(dtype), dfield
    return dS.astype(dtype)


def delta_action_level(system: System, tables: Tables, R, xnew, xold, ip,
                       odd_beads: bool, fold=None):
    """Summed action delta for a bisection level's midpoints.

    Midpoints are never chain ends (no WF pass) and — with even-aligned
    windows — share one static parity: the finest level's midpoints are odd
    (carry the F^2 term), all coarser levels even (potential only).
    fold (odd levels only): force-field cache rows -> returns (dS, dfield).
    """
    dt = system.cfg.dt
    if odd_beads:
        if fold is not None:
            dpot, df2, dfield = delta_pot_cached(system, tables, R, xnew,
                                                 xold, ip, fold)
            return jnp.sum((4.0 * dt / 3.0) * dpot
                           + (2.0 * dt ** 3 / 9.0) * df2, axis=-1), dfield
        dpot, df2 = delta_pot(system, tables, R, xnew, xold, ip,
                              with_force=True)
        return jnp.sum((4.0 * dt / 3.0) * dpot
                       + (2.0 * dt ** 3 / 9.0) * df2, axis=-1)
    dpot, _ = delta_pot(system, tables, R, xnew, xold, ip, with_force=False)
    return jnp.sum((2.0 * dt / 3.0) * dpot, axis=-1)


# ---------------------------------------------------------------------------
# Full-configuration pair sums (estimator substrate)
# ---------------------------------------------------------------------------

def pair_pot(system: System, tables: Tables, R, with_force: bool = False):
    """Total potential (and total |F|^2) of one configuration R[N, D].

    Equivalent of PotentialEnergy (sample_mod.f90:13-150): O(N^2) pair sum
    with minimum image + rcut under PBC, plus trap one-body terms; F is the
    full antisymmetric pair-force field on every particle.
    Returns (Pot, F2) — F2 = sum_i |F_i|^2 (0.0 if with_force=False).
    """
    geo, cfg = system.geo, system.cfg

    if cfg.use_pallas and jnp.ndim(R) == 4:
        from .pallas_kernels import pallas_ok, pair_pot_pallas
        if pallas_ok(system, R):
            return pair_pot_pallas(system, R, with_force)

    N = R.shape[-2]
    xij = R[..., :, None, :] - R[..., None, :, :]  # [N, N, D]
    if system.pbc:
        xij, rij2 = minimum_image(xij, geo.Lbox)
    else:
        rij2 = jnp.sum(xij * xij, axis=-1)
    notself = ~jnp.eye(N, dtype=bool)
    if system.pbc:
        m = notself & (rij2 <= geo.rcut2)
    else:
        m = notself
    r = jnp.sqrt(jnp.where(notself, rij2, 1.0))
    if with_force:
        vv, dv = _v_dv_of_r(system, tables, r)
        v = jnp.where(m, vv, 0.0)
    else:
        v = jnp.where(m, _v_of_r(system, tables, r), 0.0)
    pot = 0.5 * jnp.sum(v, axis=(-1, -2))  # each unordered pair once
    F2 = jnp.zeros_like(pot)
    if with_force:
        fr = jnp.where(m, dv / r, 0.0)
        F = jnp.sum(fr[..., None] * xij, axis=-2)  # [N, D]: sum over partners
        if cfg.trap:
            F = F + jas.trap_pot_grad(cfg.a_ho, R)
        F2 = jnp.sum(F * F, axis=(-1, -2))
    if cfg.trap:
        pot = pot + jnp.sum(jas.trap_pot(cfg.a_ho, R), axis=-1)
    return pot, F2
