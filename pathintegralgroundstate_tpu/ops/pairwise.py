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

import jax
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
    if ip.ndim == 1:
        # [W] -> [W, 1, N] against [W, B, N]
        return iota[None, None, :] != ip[:, None, None]
    # per-row particles at any batch rank ([W, B] or [W, K, m] ...):
    # [..., rows] -> [..., rows, N]
    return iota != ip[..., None]


def _tp_constrain(system: System, x):
    """Tensor-parallel sharding annotation for a pair tensor whose PARTNER
    axis is -2 (xij [..., N, D] blocks).

    When the system carries a tp mesh (cfg.mesh_pairs > 1), the partner
    axis is constrained to the mesh's 'tp' axis (walker axis 0 to 'dp' when
    present), so GSPMD partitions every elementwise op of the pair chain
    across tp devices and turns the partner-axis reductions into psums over
    ICI — each tp device evaluates N/tp partner columns (SURVEY.md §2.3 TP;
    the reference's O(Np) partner loops, vpi_mod.f90:2697-2823).  No-op
    without a mesh.
    """
    mesh = system.tp_mesh
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = [None] * x.ndim
    spec[x.ndim - 2] = "tp"
    if x.ndim >= 4:
        spec[0] = "dp"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def _pair_terms(system: System, x, R, ip):
    """Displacements of x[..., B, D] against all partners R[..., B, N, D].

    Returns (mask, rij2, r, xij) with self-pair masked out and the minimum
    image applied under PBC.  r is 1.0 at masked slots (safe for 1/r).
    Works single-walker ([B, ...]) and batched ([W, B, ...]).
    """
    xij = _tp_constrain(system, x[..., None, :] - R)  # [..., B, N, D]
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
    (x_i - x_j)/r_ij (vpi_mod.f90:2733-2743).

    The engine's cache calls this on paths[:, 1::2] — the ODD beads only,
    the only rows whose F^2 carries a nonzero Chin weight
    (global_mod.f90:33-46)."""
    geo, cfg = system.geo, system.cfg
    N = R.shape[-2]
    xij = _tp_constrain(system, R[..., :, None, :] - R[..., None, :, :])
    if system.pbc:
        xij, rij2 = minimum_image(xij, geo.Lbox)
    else:
        rij2 = jnp.sum(xij * xij, axis=-1)
    notself = ~jnp.eye(N, dtype=bool)
    m = notself & (rij2 <= geo.rcut2) if system.pbc else notself
    m = m & (rij2 > 0.0)  # exact-coincidence guard (see delta_action_rows)
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
        # exact-coincidence guard (cf. delta_action_rows): a pinned bead can
        # coincide EXACTLY with a partner (worm-tail pins), where the force
        # direction is singular — without the rij2>0 mask, 0*inf = NaN
        mf = m & (rij2 > 0.0)
        vv, dv = _v_dv_of_r(system, tables, r, rinv)
        pot = jnp.sum(jnp.where(m, vv, 0.0), axis=-1)
        fpair = jnp.where(mf, dv * rinv, 0.0)[..., None] * xij  # [., B, N, D]
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


def chin_weights(system: System, ib, dtype):
    """Per-bead Chin opt=0 weights from bead indices (global_mod.f90:33-46 +
    the UpdateAction placement rules, vpi_mod.f90:2509-2525):

      wv   — potential weight: ends dt/3, even interior 2dt/3, odd 4dt/3
      wf   — F^2 weight: odd interior (4dt/3)*dt^2/6, zero elsewhere
      wpsi — trial-WF indicator: 1 at beads 0 and 2*Nb, else 0
    """
    M = system.M
    dt = system.cfg.dt
    ib = jnp.asarray(ib)
    interior = (ib > 0) & (ib < M - 1)
    odd = interior & (ib % 2 == 1)
    even_i = interior & (ib % 2 == 0)
    wv = jnp.where(odd, 4.0 * dt / 3.0,
                   jnp.where(even_i, 2.0 * dt / 3.0, dt / 3.0)).astype(dtype)
    wf = jnp.where(odd, 2.0 * dt ** 3 / 9.0, 0.0).astype(dtype)
    wpsi = (~interior).astype(dtype)
    return wv, wf, wpsi


def delta_action_rows(system: System, tables: Tables, R, xnew, xold, ip, ib,
                      fold=None, fold_sub=(0, 1), need_wf: bool = True,
                      need_f2: bool = True):
    """Per-bead action-delta contributions — the optimized hot-path core.

    ONE fused pair pass over ALL window beads: per row, the potential sum,
    the moved particle's force (for the Chin F^2 term), and — when the
    window can contain a chain end (need_wf) — the Jastrow log-sum, all
    from a single read of the partner block R.  The per-bead Chin weights
    (chin_weights, from the traced ib) mask each term into the row values:

        dS_b = wv_b dPot_b + wf_b dF2_b - wpsi_b dLogPsi_b

    This replaces the round-2 odd/even strided-subset design: on TPU the
    pair arithmetic is essentially free next to the HBM traffic of reading
    the window, so evaluating V' and u on rows whose weight is zero costs
    nothing, while the single pass halves the number of sequential kernels
    and eliminates the strided-layout copies (measured 1.7-2.8x faster per
    move at W=4096, docs/VALIDATION.md 'Performance').

    need_f2=False (static): the caller guarantees every row's Chin F^2
    weight is zero (even beads / chain ends), so all force arithmetic is
    skipped and df2 := 0 — bitwise-identical dS because wf == 0 there.

    fold [..., mo, N, D]: per-particle force-field cache rows under the
    ODD-bead rows of the window — the rows r0::s with (r0, s) = fold_sub
    (static).  Odd beads are the ONLY rows whose F^2 carries weight
    (global_mod.f90:33-46 via chin_weights), so the cache lives at odd
    beads only and all cache traffic (fold read, dfield write) is halved
    — or skipped entirely for even-bead-only windows.  Switches the F^2
    term to the exact-Chin cached form (delta_pot_cached semantics) and
    returns (dS_rows, dfield[..., mo, N, D]) with the odd-row cache
    increments for accepted moves.

    Without fold: cfg.exact_f2 selects the brute-force full-field O(N^2 B)
    df2 (validation path); otherwise the reference's partial
    moved-particle form (vpi_mod.f90:2825).

    Shapes: R [..., B, N, D]; xnew/xold [..., B, D]; ib [..., B].
    Returns dS_rows [..., B] (sum == the dense delta_action sum).
    """
    geo, cfg = system.geo, system.cfg
    dtype = xnew.dtype
    wv, wf, wpsi = chin_weights(system, ib, dtype)

    with_pair_forces = fold is not None
    forces = need_f2 or with_pair_forces

    if not with_pair_forces and not cfg.exact_f2 and cfg.pallas_rows \
            and jnp.ndim(R) in (4, 5) and not cfg.trap:
        # 5-D callers (the concat-free fused composites, [W, S, m, N, D])
        # flatten their leading batch axes for the walker-tiled kernel —
        # per-walker rows are independent, so the flatten is value-exact
        R4 = R.reshape((-1,) + R.shape[-3:]) if jnp.ndim(R) == 5 else R
        from .pallas_kernels import pallas_rows_ok, pair_rows_pallas
        if pallas_rows_ok(system, R4):
            if jnp.ndim(R) == 5:
                W_, S_, m_ = R.shape[0], R.shape[1], R.shape[2]
                xn4 = xnew.reshape(W_ * S_, m_, -1)
                xo4 = xold.reshape(W_ * S_, m_, -1)
                ip4 = ip
                if jnp.ndim(jnp.asarray(ip)) == 3:  # per-row [W, S, m]
                    ip4 = jnp.asarray(ip).reshape(W_ * S_, m_)
                dpot, df2, du = pair_rows_pallas(system, R4, xn4, xo4, ip4,
                                                 need_wf)
                dpot = dpot.reshape(W_, S_, m_)
                df2 = df2.reshape(W_, S_, m_)
                du = du.reshape(W_, S_, m_) if need_wf else du
            else:
                dpot, df2, du = pair_rows_pallas(system, R, xnew, xold, ip,
                                                 need_wf)
            dS = (wv * dpot + wf * df2).astype(dtype)
            if need_wf:
                dS = dS - (wpsi * du).astype(dtype)
            return dS

    def side(x):
        notself, rij2, r, xij = _pair_terms(system, x, R, ip)
        m = notself & (rij2 <= geo.rcut2) if system.pbc else notself
        # exact-coincidence guard: at rij == 0 the force direction (and the
        # Jastrow) are singular; mask them (the potential keeps its clamped
        # hard-core wall, so overlaps still reject) — without this, rows
        # whose Chin weight is ZERO would still poison the sum via 0 * inf
        mf = m & (rij2 > 0.0)
        F = f2 = fpair = None
        rinv = lax.rsqrt(jnp.where(notself, rij2, 1.0))
        # the fused (V, dV) form in BOTH branches: with need_f2=False the
        # derivative output is simply unused (XLA dead-code-eliminates its
        # graph) and the potential VALUES stay bitwise identical to the
        # forces branch — so switching need_f2 per call site never moves a
        # trajectory
        vv, dv = _v_dv_of_r(system, tables, r, rinv)
        pot = jnp.sum(jnp.where(m, vv, 0.0), axis=-1)          # [..., B]
        if forces:
            fr = jnp.where(mf, dv * rinv, 0.0)
            fpair = fr[..., None] * xij                        # [..., B, N, D]
            F = jnp.sum(fpair, axis=-2)                        # [..., B, D]
            if cfg.trap:
                F = F + jas.trap_pot_grad(cfg.a_ho, x)
            f2 = jnp.sum(F * F, axis=-1)
        if cfg.trap:
            pot = pot + jas.trap_pot(cfg.a_ho, x)
        usum = None
        if need_wf:
            u = jnp.where(mf, _u_of_r(system, tables, r), 0.0)
            usum = jnp.sum(u, axis=-1)
            if cfg.trap:
                usum = usum + jas.trap_psi(cfg.a_ho, x)
        return pot, F, f2, fpair if with_pair_forces else None, usum

    pot_n, F_n, f2_n, fp_n, u_n = side(xnew)
    pot_o, F_o, f2_o, fp_o, u_o = side(xold)

    dfield = None
    if with_pair_forces:
        # exact Chin F^2 via the cache, restricted to the odd-bead rows:
        # moving ip changes F_ip entirely and partner j by the pair
        # component dg_j (delta_pot_cached docstring)
        r0, s = fold_sub
        rows = slice(r0, None, s)
        dg = -(fp_n[..., rows, :, :] - fp_o[..., rows, :, :])  # [.., mo, N, D]
        df2_o = (f2_n[..., rows] - f2_o[..., rows]
                 + jnp.sum(2.0 * fold * dg + dg * dg, axis=(-1, -2)))
        if (r0, s) == (0, 1):
            df2 = df2_o
        else:
            df2 = jnp.zeros_like(pot_n).at[..., rows].set(df2_o)
        ip_o = ip
        if jnp.ndim(jnp.asarray(ip)) >= 2:           # per-row particles
            ip_o = jnp.asarray(ip)[..., rows]
        sel = ~_self_mask(fold, ip_o)[..., None]
        dF_o = F_n[..., rows, :] - F_o[..., rows, :]
        dfield = jnp.where(sel, dF_o[..., None, :], dg)
    elif not need_f2:
        df2 = jnp.zeros_like(pot_n)
    elif cfg.exact_f2:
        # exact Chin F^2 without a cache: brute-force full-field difference
        # (O(N^2 B) validation path, f2_cache=False)
        notself = _self_mask(R, ip)
        sel = ~notself[..., None]
        Rn = jnp.where(sel, xnew[..., None, :], R)
        _, f2n_full = pair_pot(system, tables, Rn, with_force=True)
        _, f2o_full = pair_pot(system, tables, R, with_force=True)
        df2 = f2n_full - f2o_full
    else:
        df2 = f2_n - f2_o

    dS = (wv * (pot_n - pot_o) + wf * df2).astype(dtype)
    if need_wf:
        dS = dS - (wpsi * (u_n - u_o)).astype(dtype)
    if with_pair_forces:
        return dS, dfield
    return dS


def delta_action_sum(system: System, tables: Tables, R, xnew, xold, ip, ib,
                     start_parity: Optional[int] = None, fold=None,
                     fold_sub=(0, 1), need_wf: bool = True,
                     row_weights=None):
    """Summed window action delta (see delta_action_rows).

    start_parity is accepted for backward compatibility and ignored (the
    weights come from the traced ib).  row_weights [..., B] (optional)
    scales each row's whole dS contribution (the worm center's 1/2 weight,
    vpi_mod.f90:1573-1577).
    """
    del start_parity
    out = delta_action_rows(system, tables, R, xnew, xold, ip, ib,
                            fold=fold, fold_sub=fold_sub, need_wf=need_wf)
    rows = out[0] if fold is not None else out
    if row_weights is not None:
        rows = rows * row_weights
    dS = jnp.sum(rows, axis=-1)
    if fold is not None:
        return dS, out[1]
    return dS


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
    if jnp.ndim(R) == 4:
        # keep the materialized [W, B, N, N, D] pair block bounded: chunk
        # the bead axis when it would exceed ~1 GB (per-bead outputs are
        # independent, so chunking is value-exact)
        W, B = R.shape[0], R.shape[1]
        ntp = system.tp_mesh.shape.get("tp", 1) if system.tp_mesh else 1
        budget = 2 ** 28 * ntp  # f32 elements across tp shards
        if W * B * N * N * R.shape[-1] > budget:
            chunk = max(1, budget // max(W * N * N * R.shape[-1], 1))
            nc = -(-B // chunk)
            pot = jnp.zeros((W, B), R.dtype)
            f2 = jnp.zeros((W, B), R.dtype)

            def body(c, carry):
                pot, f2 = carry
                Rc = lax.dynamic_slice_in_dim(
                    R, c * chunk, chunk, axis=1)  # clamped at the tail
                p, f = pair_pot(system, tables, Rc, with_force)
                pot = lax.dynamic_update_slice_in_dim(pot, p, c * chunk, 1)
                f2 = lax.dynamic_update_slice_in_dim(f2, f, c * chunk, 1)
                return pot, f2

            # XLA clamps out-of-range dynamic slices, so the tail chunk
            # re-evaluates a few rows — exact, just slightly redundant
            return lax.fori_loop(0, nc, body, (pot, f2))

    xij = _tp_constrain(system, R[..., :, None, :] - R[..., None, :, :])
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
