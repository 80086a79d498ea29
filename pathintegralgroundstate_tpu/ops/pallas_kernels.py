"""Fused Pallas TPU kernels for the pair-interaction hot paths.

XLA materializes the [W, B, N]-shaped intermediates of the pair computation
between fusions, which makes the jnp path HBM-bound at a small fraction of
the chip's elementwise throughput.  These kernels keep the whole per-tile
computation — minimum image, r^2, cutoff/self masks, fused V+dV/dr (or the
Jastrow u), force accumulation, and BOTH the new and old sides — in
VMEM/registers, so the only HBM traffic is one read of the partner
positions R and the tiny per-row outputs.

Three kernels cover the reference's [HOT] pair loops (SURVEY.md §2):

  pair_delta_pallas  — UpdatePot   (vpi_mod.f90:2660-2841): per displaced
                       bead, (dPot, dF^2) against all partners.
  pair_u_pallas      — UpdateWf    (vpi_mod.f90:2534-2656): per displaced
                       bead, dLogPsi against all partners.
  pair_pot_pallas    — PotentialEnergy / the ThermEnergy O(Np^2 * 2Nb) sweep
                       (sample_mod.f90:13-150, 323-388): full all-pairs
                       potential (+ total |F|^2) of whole configurations.

Layout: rows = flattened (walker, bead) pairs on the lane axis; partners N
on sublanes; spatial dims D unrolled:

    R_t    [D, N, ROWS]   partner positions per row
    x_t    [D, ROWS]      displaced-particle positions (new and old)
    ip_row [1, ROWS]      moved-particle index per row (self-exclusion)

Grid tiles ROWS; each program computes its outputs for TILE rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512


def _min_image_terms(system, x_row, Rt_ref, notself, dtype):
    """Minimum-image (dx_k list, r2, masked rinv/r) of x[TILE] vs R[N, TILE]."""
    geo = system.geo
    D = system.cfg.dim
    r2 = None
    dxs = []
    for k in range(D):
        dx = x_row[k] - Rt_ref[k]
        if system.pbc:
            L = jnp.asarray(geo.Lbox[k], dtype)
            half = jnp.asarray(0.5 * geo.Lbox[k], dtype)
            dx = jnp.where(dx > half, dx - L, dx)
            dx = jnp.where(dx < -half, dx + L, dx)
        dxs.append(dx)
        r2 = dx * dx if r2 is None else r2 + dx * dx
    r2s = jnp.where(notself, r2, 1.0)
    rinv = jax.lax.rsqrt(r2s)
    r = r2s * rinv
    return dxs, r2, rinv, r


def _pair_mask(system, notself, r2, dtype):
    if system.pbc:
        rcut2 = jnp.asarray(system.geo.rcut2, dtype)
        return notself & (r2 <= rcut2)
    return notself


def _delta_kernel(system, with_force, Rt_ref, xn_ref, xo_ref, ip_ref,
                  dpot_ref, df2_ref):
    """(dPot, dF^2) per row — the UpdatePot equivalent."""
    D = system.cfg.dim
    N = Rt_ref.shape[1]
    dtype = Rt_ref.dtype

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, TILE), 0)
    notself = iota_n != ip_ref[0, :][None, :]

    def side(x_ref):
        x_row = [x_ref[k, :][None, :] for k in range(D)]
        dxs, r2, rinv, r = _min_image_terms(system, x_row, Rt_ref, notself,
                                            dtype)
        m = _pair_mask(system, notself, r2, dtype)
        if with_force:
            try:
                v, dv = system.potential.v_dv(r, rinv)
            except TypeError:
                v, dv = system.potential.v_dv(r)
            pot = jnp.sum(jnp.where(m, v, 0.0), axis=0)
            fr = jnp.where(m, dv * rinv, 0.0)
            f2 = jnp.zeros((TILE,), dtype)
            for k in range(D):
                Fk = jnp.sum(fr * dxs[k], axis=0)
                f2 = f2 + Fk * Fk
            return pot, f2
        v = system.potential.v(r)
        pot = jnp.sum(jnp.where(m, v, 0.0), axis=0)
        return pot, None

    pot_n, f2_n = side(xn_ref)
    pot_o, f2_o = side(xo_ref)
    dpot_ref[0, :] = pot_n - pot_o
    if with_force:
        df2_ref[0, :] = f2_n - f2_o
    else:
        df2_ref[0, :] = jnp.zeros((TILE,), dtype)


def _u_kernel(system, Rt_ref, xn_ref, xo_ref, ip_ref, dwf_ref):
    """dLogPsi per row — the UpdateWf equivalent (pair part)."""
    D = system.cfg.dim
    N = Rt_ref.shape[1]
    dtype = Rt_ref.dtype

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, TILE), 0)
    notself = iota_n != ip_ref[0, :][None, :]

    def side(x_ref):
        x_row = [x_ref[k, :][None, :] for k in range(D)]
        _, r2, _, r = _min_image_terms(system, x_row, Rt_ref, notself, dtype)
        m = _pair_mask(system, notself, r2, dtype)
        u = system.u(r)
        return jnp.sum(jnp.where(m, u, 0.0), axis=0)

    dwf_ref[0, :] = side(xn_ref) - side(xo_ref)


def _pot_kernel(system, with_force, Rt_ref, pot_ref, f2_ref):
    """All-pairs (Pot, sum_i |F_i|^2) per row — PotentialEnergy equivalent.

    Loops particles i = 0..N-1 (static unroll is too large; fori_loop keeps
    the program small); each iteration is the same [N, TILE] pair pass as
    the delta kernel with x := R[:, i, :].
    """
    D = system.cfg.dim
    N = Rt_ref.shape[1]
    dtype = Rt_ref.dtype
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, TILE), 0)

    def body(i, carry):
        pot_acc, f2_acc = carry
        notself = iota_n != i
        x_row = [Rt_ref[k, i, :][None, :] for k in range(D)]
        dxs, r2, rinv, r = _min_image_terms(system, x_row, Rt_ref, notself,
                                            dtype)
        m = _pair_mask(system, notself, r2, dtype)
        if with_force:
            try:
                v, dv = system.potential.v_dv(r, rinv)
            except TypeError:
                v, dv = system.potential.v_dv(r)
            pot_acc = pot_acc + jnp.sum(jnp.where(m, v, 0.0), axis=0)
            fr = jnp.where(m, dv * rinv, 0.0)
            f2_i = jnp.zeros((TILE,), dtype)
            for k in range(D):
                Fk = jnp.sum(fr * dxs[k], axis=0)
                f2_i = f2_i + Fk * Fk
            f2_acc = f2_acc + f2_i
        else:
            v = system.potential.v(r)
            pot_acc = pot_acc + jnp.sum(jnp.where(m, v, 0.0), axis=0)
        return pot_acc, f2_acc

    z = jnp.zeros((TILE,), dtype)
    pot, f2 = jax.lax.fori_loop(0, N, body, (z, z))
    pot_ref[0, :] = 0.5 * pot  # each unordered pair counted once
    f2_ref[0, :] = f2


# ---------------------------------------------------------------------------
# Both-sides fused window kernel (round 5 layout)
# ---------------------------------------------------------------------------
#
# The round-2 kernels above put flattened rows on the LANE axis, which
# requires transposing R [W, B, N, D] -> [D, N, rows] before every call —
# measured at ~3 ms per move at W=4096.  The round-3 attempt fed
# channel-split [rows, N] planes instead, but materializing D strided
# slices of R costs ~2x the window bytes in HBM copies before the kernel
# starts — slower than the jnp chain at flagship shapes.
#
# Round 5: ONE layout change per call — R reshaped to [rows, D, N] (a
# single minor-axes transpose, window-sized) — and the per-dim planes are
# taken INSIDE the kernel as R_ref[:, k, :], a free VMEM subview.  Rows
# ride sublanes, partners the lane axis.  One call evaluates BOTH
# Metropolis sides of a whole move window — potential, moved-particle
# force, and (optionally) the Jastrow log-sum — entirely in VMEM; HBM
# traffic is the transpose (r+w) plus one kernel read of the window,
# replacing the jnp chain's two big-fusion passes + 4-6 reduce kernels
# with their materialized [rows, N] intermediates.

TILE_R = 256


def _rows_kernel(system, need_wf, nd, Rt_ref, xn_ref, xo_ref, ip_ref,
                 *outs):
    """Per-row (dpot, df2[, du]) of xnew/xold vs partners — both sides fused.

    Rt_ref [TR, D*N] (dim-major planes, contiguous per k); xn/xo [TR, D];
    ip [TR, 1] (i32); outs: dpot, df2 (+ du) [TR, 1].
    """
    N = Rt_ref.shape[1] // nd
    dtype = Rt_ref.dtype
    geo = system.geo

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, N), 1)
    notself = iota_n != ip_ref[:, 0][:, None]

    def side(x_ref):
        r2 = None
        dxs = []
        for k in range(nd):
            dx = x_ref[:, k][:, None] - Rt_ref[:, k * N:(k + 1) * N]
            if system.pbc:
                L = jnp.asarray(geo.Lbox[k], dtype)
                half = jnp.asarray(0.5 * geo.Lbox[k], dtype)
                dx = jnp.where(dx > half, dx - L, dx)
                dx = jnp.where(dx < -half, dx + L, dx)
            dxs.append(dx)
            r2 = dx * dx if r2 is None else r2 + dx * dx
        r2s = jnp.where(notself, r2, 1.0)
        rinv = jax.lax.rsqrt(r2s)
        r = r2s * rinv
        m = notself & (r2 <= jnp.asarray(geo.rcut2, dtype)) \
            if system.pbc else notself
        mf = m & (r2 > 0.0)  # exact-coincidence guard (see delta_action_rows)
        try:
            v, dv = system.potential.v_dv(r, rinv)
        except TypeError:
            v, dv = system.potential.v_dv(r)
        pot = jnp.sum(jnp.where(m, v, 0.0), axis=1)           # [TR]
        fr = jnp.where(mf, dv * rinv, 0.0)
        f2 = jnp.zeros((TILE_R,), dtype)
        for k in range(nd):
            Fk = jnp.sum(fr * dxs[k], axis=1)
            f2 = f2 + Fk * Fk
        usum = None
        if need_wf:
            u = system.u(r)
            usum = jnp.sum(jnp.where(mf, u, 0.0), axis=1)
        return pot, f2, usum

    pot_n, f2_n, u_n = side(xn_ref)
    pot_o, f2_o, u_o = side(xo_ref)
    outs[0][:, 0] = pot_n - pot_o
    outs[1][:, 0] = f2_n - f2_o
    if need_wf:
        outs[2][:, 0] = u_n - u_o


def pallas_rows_ok(system, R) -> bool:
    """Whether the fused rows kernel applies (the delta_action_rows hot
    path): TPU backend, PBC, closed-form V and u, no tp partitioning."""
    cfg = system.cfg
    return (cfg.pallas_rows and system.pbc and not cfg.v_table
            and not cfg.wf_table and system.tp_mesh is None
            and R.ndim == 4 and _backend_ok())


@functools.partial(jax.jit, static_argnums=(0, 5))
def pair_rows_pallas(system, R, xnew, xold, ip, need_wf: bool):
    """Fused per-row (dpot, df2[, du]) for R [W, B, N, D], x [W, B, D].

    ip: scalar, [W], or [W, B].  Returns [W, B] arrays (du None unless
    need_wf)."""
    W, B, N, D = R.shape
    dtype = R.dtype
    rows = W * B
    rows_p = ((rows + TILE_R - 1) // TILE_R) * TILE_R
    pad = rows_p - rows

    Rt = jnp.swapaxes(R.reshape(rows, N, D), 1, 2).reshape(rows, D * N)
    x2 = jnp.concatenate([xnew.reshape(rows, D),
                          xold.reshape(rows, D)], axis=1)  # [rows, 2D]
    ip = jnp.asarray(ip, jnp.int32)
    if ip.ndim == 0:
        ip_rows = jnp.full((rows, 1), ip, jnp.int32)
    elif ip.ndim == 2:
        ip_rows = ip.reshape(rows, 1)
    else:
        ip_rows = jnp.broadcast_to(ip[:, None], (W, B)).reshape(rows, 1)
    if pad:
        Rt = jnp.pad(Rt, ((0, pad), (0, 0)))
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        ip_rows = jnp.pad(ip_rows, ((0, pad), (0, 0)))

    n_out = 3 if need_wf else 2
    spec_R = pl.BlockSpec((TILE_R, D * N), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_x = pl.BlockSpec((TILE_R, 2 * D), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_1 = pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    def kernel(Rt_ref, x2_ref, ip_ref, *outs):
        _rows_kernel(system, need_wf, D, Rt_ref, x2_ref[:, :D],
                     x2_ref[:, D:], ip_ref, *outs)

    outs = pl.pallas_call(
        kernel,
        grid=(rows_p // TILE_R,),
        in_specs=[spec_R, spec_x, spec_1],
        out_specs=[spec_1] * n_out,
        out_shape=[jax.ShapeDtypeStruct((rows_p, 1), dtype)] * n_out,
    )(Rt, x2, ip_rows)
    outs = [o[:rows, 0].reshape(W, B) for o in outs]
    if need_wf:
        return outs[0], outs[1], outs[2]
    return outs[0], outs[1], None


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _backend_ok() -> bool:
    return jax.default_backend() == "tpu"


def pallas_ok(system, R) -> bool:
    """Whether the fused delta/pot kernels apply to this configuration.

    Tensor-parallel runs (system.tp_mesh) use the jnp path: pallas_call is
    opaque to GSPMD, so only the jnp pair chain can be partitioned over the
    'tp' axis (ops/pairwise._tp_constrain)."""
    cfg = system.cfg
    return (cfg.use_pallas and system.pbc and not cfg.v_table
            and system.tp_mesh is None
            and R.ndim == 4 and R.shape[-2] % 8 == 0 and _backend_ok())


def pallas_ok_wf(system, R) -> bool:
    """Same, for the Jastrow kernel (needs the closed-form u)."""
    cfg = system.cfg
    return (cfg.use_pallas and system.pbc and not cfg.wf_table
            and system.tp_mesh is None
            and R.ndim == 4 and R.shape[-2] % 8 == 0 and _backend_ok())


def _rows_layout(R, *xs):
    """Flatten [W, B, ...] leading axes into padded lane rows."""
    W, B, N, D = R.shape
    rows = W * B
    rows_p = ((rows + TILE - 1) // TILE) * TILE
    Rt = jnp.transpose(R, (3, 2, 0, 1)).reshape(D, N, rows)
    outs = [Rt]
    for x in xs:
        outs.append(jnp.transpose(x, (2, 0, 1)).reshape(D, rows))
    if rows_p != rows:
        pad = rows_p - rows
        outs[0] = jnp.pad(outs[0], ((0, 0), (0, 0), (0, pad)))
        for i in range(1, len(outs)):
            outs[i] = jnp.pad(outs[i], ((0, 0), (0, pad)))
    return outs, rows, rows_p


def _ip_rows(ip, W, B, rows, rows_p):
    ip = jnp.asarray(ip, jnp.int32)
    if ip.ndim == 0:
        ip_row = jnp.full((1, rows), ip, jnp.int32)
    elif ip.ndim == 2:  # [W, B] per-row particle (fused multi-particle moves)
        ip_row = ip.reshape(1, rows)
    else:
        ip_row = jnp.broadcast_to(ip[:, None], (W, B)).reshape(1, rows)
    if rows_p != rows:
        ip_row = jnp.pad(ip_row, ((0, 0), (0, rows_p - rows)))
    return ip_row


def _row_spec(lead):
    """BlockSpec tiling the trailing row axis: block = lead + (TILE,)."""
    nlead = len(lead)
    return pl.BlockSpec(tuple(lead) + (TILE,),
                        lambda i, _n=nlead: (0,) * _n + (i,),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnums=(0, 5))
def pair_delta_pallas(system, R, xnew, xold, ip, with_force: bool):
    """Fused (dpot, df2) for R[W,B,N,D], xnew/xold[W,B,D], ip scalar|[W].

    Drop-in replacement for the pair part of ops.pairwise.delta_pot under
    PBC with closed-form potentials.
    """
    W, B, N, D = R.shape
    dtype = R.dtype
    (Rt, xn, xo), rows, rows_p = _rows_layout(R, xnew, xold)
    ip_row = _ip_rows(ip, W, B, rows, rows_p)

    kernel = functools.partial(_delta_kernel, system, with_force)
    dpot, df2 = pl.pallas_call(
        kernel,
        grid=(rows_p // TILE,),
        in_specs=[_row_spec((D, N)), _row_spec((D,)), _row_spec((D,)),
                  _row_spec((1,))],
        out_specs=[_row_spec((1,)), _row_spec((1,))],
        out_shape=[jax.ShapeDtypeStruct((1, rows_p), dtype),
                   jax.ShapeDtypeStruct((1, rows_p), dtype)],
    )(Rt, xn, xo, ip_row)
    return dpot[0, :rows].reshape(W, B), df2[0, :rows].reshape(W, B)


@functools.partial(jax.jit, static_argnums=(0,))
def pair_u_pallas(system, R, xnew, xold, ip):
    """Fused dLogPsi (pair part) for R[W,B,N,D] — UpdateWf's partner loop."""
    W, B, N, D = R.shape
    dtype = R.dtype
    (Rt, xn, xo), rows, rows_p = _rows_layout(R, xnew, xold)
    ip_row = _ip_rows(ip, W, B, rows, rows_p)

    kernel = functools.partial(_u_kernel, system)
    dwf = pl.pallas_call(
        kernel,
        grid=(rows_p // TILE,),
        in_specs=[_row_spec((D, N)), _row_spec((D,)), _row_spec((D,)),
                  _row_spec((1,))],
        out_specs=_row_spec((1,)),
        out_shape=jax.ShapeDtypeStruct((1, rows_p), dtype),
    )(Rt, xn, xo, ip_row)
    return dwf[0, :rows].reshape(W, B)


@functools.partial(jax.jit, static_argnums=(0, 2))
def pair_pot_pallas(system, R, with_force: bool):
    """Fused all-pairs (Pot, sum_i |F_i|^2) for R[W,B,N,D] configurations.

    The ThermEnergy / PotentialEnergy substrate (sample_mod.f90:13-150,
    323-388): one program evaluates N×N pairs for TILE (walker, bead) rows
    entirely in VMEM.  Trap one-body terms are added by the caller.
    """
    W, B, N, D = R.shape
    dtype = R.dtype
    (Rt,), rows, rows_p = _rows_layout(R)

    kernel = functools.partial(_pot_kernel, system, with_force)
    pot, f2 = pl.pallas_call(
        kernel,
        grid=(rows_p // TILE,),
        in_specs=[_row_spec((D, N))],
        out_specs=[_row_spec((1,)), _row_spec((1,))],
        out_shape=[jax.ShapeDtypeStruct((1, rows_p), dtype),
                   jax.ShapeDtypeStruct((1, rows_p), dtype)],
    )(Rt)
    return pot[0, :rows].reshape(W, B), f2[0, :rows].reshape(W, B)
