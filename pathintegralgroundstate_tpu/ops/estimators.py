"""Estimators: mixed & thermodynamic energy, g(r), S(k) (sample_mod.f90).

All functions take a single walker's configuration and are vmapped over the
ensemble by the sweeper; ensemble/block reductions (means, histograms) are
plain jnp reductions that XLA turns into on-chip sums + cross-device psums
under sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import jastrow as jas
from ..system import System, Tables
from ..utils.interpolate import interpolate
from ..utils.pbc import minimum_image
from .pairwise import _dv_of_r, _v_of_r, pair_pot


def _pair_geometry(system: System, R):
    """All-pairs displacements for one configuration R[N, D]."""
    xij = R[:, None, :] - R[None, :, :]
    if system.pbc:
        xij, rij2 = minimum_image(xij, system.geo.Lbox)
    else:
        rij2 = jnp.sum(xij * xij, axis=-1)
    N = R.shape[0]
    notself = ~jnp.eye(N, dtype=bool)
    if system.pbc:
        m = notself & (rij2 <= system.geo.rcut2)
    else:
        m = notself
    r = jnp.sqrt(jnp.where(notself, rij2, 1.0))
    return m, r, xij


def _du_of_r(system: System, tables: Tables, r):
    if system.cfg.wf_table and tables.logwf is not None:
        return interpolate(1, system.geo.dr, tables.logwf, r)
    return system.du(r)


def _d2u_of_r(system: System, tables: Tables, r):
    if system.cfg.wf_table and tables.logwf is not None:
        return interpolate(2, system.geo.dr, tables.logwf, r)
    return system.d2u(r)


def local_energy(system: System, tables: Tables, R):
    """Mixed estimator at a terminal time slice (LocalEnergy,
    sample_mod.f90:154-319).

    E_L = -1/2 [ 2*LapLogPsi + |F|^2 ] + V  with
    LapLogPsi = sum_pairs [(d-1) u'/r + u''] (+ 1/2 trap laplacian) and
    F_i = grad_i log Psi.  Returns (E, Kin, Pot).
    """
    cfg = system.cfg
    d = cfg.dim
    m, r, xij = _pair_geometry(system, R)

    dudr = jnp.where(m, _du_of_r(system, tables, r), 0.0)
    d2u = jnp.where(m, _d2u_of_r(system, tables, r), 0.0)
    # each unordered pair counted once (loops i<j in the reference)
    lap = 0.5 * jnp.sum((d - 1.0) * dudr / r + d2u)
    v = jnp.where(m, _v_of_r(system, tables, r), 0.0)
    pot = 0.5 * jnp.sum(v)

    F = jnp.sum((dudr / r)[..., None] * xij, axis=1)  # [N, D]
    if cfg.trap:
        F = F + jas.trap_psi_grad(cfg.a_ho, R)
        pot = pot + jnp.sum(jas.trap_pot(cfg.a_ho, R))
        # the reference halves only the trap part of the laplacian
        # (sample_mod.f90:177-189) — reproduced verbatim
        lap = lap + 0.5 * jnp.sum(jas.trap_psi_lap(cfg.a_ho, R))

    kin = 2.0 * lap + jnp.sum(F * F)
    kin = -0.5 * kin
    return kin + pot, kin, pot


def therm_energy(system: System, tables: Tables, paths_w):
    """Thermodynamic estimator over all links (ThermEnergy,
    sample_mod.f90:323-388).

    Sums Simpson-weighted potential (+F^2 on odd beads) over beads
    0..2*Nb-1, subtracts the spring terms rij^2/(2 dt^2) per link (with the
    reference's rcut gate under PBC, sample_mod.f90:377), and closes with
    E = 0.5*(E/Nb + d*N/dt).  Returns (E, Ec, Ep) with Ep the potential at
    the central bead.

    Accepts a single walker [M, N, D] (scalar outputs) or the whole ensemble
    [W, M, N, D] ([W] outputs).  The ensemble form feeds the pair sums as
    4-D [W, Nb, N, D] blocks — the shape the fused Pallas kernel
    (ops/pallas_kernels.pair_pot_pallas) consumes; this O(Np^2 * 2Nb) sweep
    is the single biggest FLOP block per MC step.
    """
    single = paths_w.ndim == 3
    if single:
        paths_w = paths_w[None]

    cfg = system.cfg
    Nb, dt = cfg.Nb, cfg.dt
    M = system.M
    dtype = paths_w.dtype

    # even beads 0,2,..,2Nb-2 need V only; odd beads 1,3,..,2Nb-1 need V+F2
    pot_even, _ = pair_pot(system, tables, paths_w[:, 0:M - 1:2], False)
    pot_odd, f2_odd = pair_pot(system, tables, paths_w[:, 1:M - 1:2], True)

    # Simpson weights, opt=1 (global_mod.f90:50-65); bead 2*Nb never enters
    # (the reference loop stops at 2*Nb-1, sample_mod.f90:344)
    w_even = jnp.full((Nb,), 2.0 / 3.0, dtype).at[0].set(1.0 / 3.0)
    E = jnp.sum(w_even * pot_even, axis=-1)
    E = E + jnp.sum(4.0 / 3.0 * (pot_odd + 0.5 * dt * dt * f2_odd), axis=-1)

    # central-bead potential: bead Nb sits in the even subset when Nb is
    # even, else in the odd subset (both at index Nb//2)
    Ep = pot_even[:, Nb // 2] if Nb % 2 == 0 else pot_odd[:, Nb // 2]

    # spring terms over links ib -> ib+1
    dx = paths_w[:, :-1] - paths_w[:, 1:]  # [W, M-1, N, D]
    if system.pbc:
        dx, rij2 = minimum_image(dx, system.geo.Lbox)
        spring = jnp.where(rij2 <= system.geo.rcut2, rij2, 0.0)
    else:
        spring = jnp.sum(dx * dx, axis=-1)
    E = E - 0.5 * jnp.sum(spring, axis=(-1, -2)) / (dt * dt)

    E = 0.5 * (E / Nb + cfg.dim * cfg.Np / dt)
    out = (E, E - Ep, Ep)
    if single:
        out = tuple(x[0] for x in out)
    return out


def pair_correlation(system: System, R):
    """g(r) histogram contribution of one configuration (PairCorrelation,
    sample_mod.f90:392-431): weight 2 per pair within rcut at the central
    bead.  Returns gr[Nbin].

    The histogram is a fused compare-and-reduce over (pairs x bins), not an
    XLA scatter-add — per-element scatters serialize on TPU (~120 ms/step at
    W=4096 for gr+sk before this change) while the broadcast compare fuses
    into a streaming reduction."""
    cfg, geo = system.cfg, system.geo
    m, r, _ = _pair_geometry(system, R)
    ibin = jnp.clip((r / geo.rbin).astype(jnp.int32), 0, cfg.Nbin - 1)
    # full N x N matrix double-counts each pair = the reference's weight 2
    contrib = jnp.where(m, jnp.ones((), R.dtype), 0.0).ravel()  # [P]
    onehot = ibin.ravel()[:, None] == jnp.arange(cfg.Nbin)      # [P, Nbin]
    return jnp.sum(contrib[:, None] * onehot, axis=0)


def structure_factor(system: System, Nk: int, R):
    """S(k) along each Cartesian axis at multiples of 2*pi/L
    (StructureFactor, sample_mod.f90:435-476).  Returns Sk[dim, Nk]."""
    cfg, geo = system.cfg, system.geo
    q = jnp.asarray(geo.qbin, R.dtype)[:, None] * jnp.arange(1, Nk + 1, dtype=R.dtype)[None, :]
    # qr[d, k, N] = q[d,k] * R[N,d]
    qr = q[:, :, None] * R.T[:, None, :]
    sc = jnp.sum(jnp.cos(qr), axis=-1)
    ss = jnp.sum(jnp.sin(qr), axis=-1)
    return sc * sc + ss * ss


def potential_energy(system: System, tables: Tables, R, with_force=False):
    """PotentialEnergy equivalent (sample_mod.f90:13-150)."""
    return pair_pot(system, tables, R, with_force)


def density_map(system: System, R):
    """2-D density map of one configuration R[N, D] (DensityProfile,
    sample_mod.f90:598-629 — commented-out in the reference; implemented
    here as a first-class estimator for trapped systems).

    Histograms the (x, y) coordinates on an Nbin x Nbin grid covering
    [-rcut/2, rcut/2)^2 with the reference's bin rule
    ibin = int((x + rcut/2)/rbin), rows/cols outside the grid dropped.
    Returns dens[Nbin, Nbin] with dens[i, j] counting particles in x-bin i,
    y-bin j (scatter-free: one-hot compare-reduce, MXU/VPU-friendly).
    1-D systems histogram x against a single y row.
    """
    cfg, geo = system.cfg, system.geo
    nb = cfg.Nbin
    x = R[:, 0]
    y = R[:, 1] if cfg.dim >= 2 else jnp.zeros_like(x)
    fx = (x + 0.5 * geo.rcut) / geo.rbin
    fy = (y + 0.5 * geo.rcut) / geo.rbin
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    ok = (ix >= 0) & (ix < nb) & (iy >= 0) & (iy < nb)
    ohx = ((ix[:, None] == jnp.arange(nb)) & ok[:, None]).astype(R.dtype)
    ohy = (iy[:, None] == jnp.arange(nb)).astype(R.dtype)
    return jnp.einsum("ni,nj->ij", ohx, ohy)
