"""Fused Pallas TPU kernel for the pair-delta hot path.

XLA materializes the [W, B, N]-shaped intermediates of the pair computation
between fusions, which makes the jnp path HBM-bound at ~1/10 of the chip's
elementwise throughput (see bench notes in BENCH journal).  This kernel
keeps the whole per-tile computation — minimum image, r^2, cutoff/self
masks, fused V+dV/dr, force accumulation, and BOTH the new and old sides —
in VMEM/registers, so the only HBM traffic is one read of the partner
positions R and the tiny per-row outputs.

Layout: rows = flattened (walker, bead) pairs on the lane axis; partners N
on sublanes; spatial dims D unrolled:

    R_t    [D, N, ROWS]   partner positions per displaced-bead row
    x_t    [D, ROWS]      displaced-particle positions (new and old)
    ip_row [1, ROWS]      moved-particle index per row (self-exclusion)

Grid tiles ROWS; each program computes dpot/df2 for TILE rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512


def _kernel(system, with_force, Rt_ref, xn_ref, xo_ref, ip_ref,
            dpot_ref, df2_ref):
    geo = system.geo
    D = system.cfg.dim
    N = Rt_ref.shape[1]
    dtype = Rt_ref.dtype
    Ls = geo.Lbox
    rcut2 = jnp.asarray(geo.rcut2, dtype)

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (N, TILE), 0)
    notself = iota_n != ip_ref[0, :][None, :]

    def side(x_ref):
        r2 = jnp.zeros((N, TILE), dtype)
        dxs = []
        for k in range(D):
            dx = x_ref[k, :][None, :] - Rt_ref[k]
            L = jnp.asarray(Ls[k], dtype)
            half = jnp.asarray(0.5 * Ls[k], dtype)
            dx = jnp.where(dx > half, dx - L, dx)
            dx = jnp.where(dx < -half, dx + L, dx)
            dxs.append(dx)
            r2 = r2 + dx * dx
        m = notself & (r2 <= rcut2)
        r2s = jnp.where(notself, r2, 1.0)
        rinv = jax.lax.rsqrt(r2s)
        r = r2s * rinv
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


def pallas_ok(system, R) -> bool:
    """Whether the fused kernel applies to this configuration."""
    cfg = system.cfg
    return (cfg.use_pallas and system.pbc and not cfg.v_table
            and R.ndim == 4 and R.shape[-2] % 8 == 0
            and jax.default_backend() == "tpu")


@functools.partial(jax.jit, static_argnums=(0, 5))
def pair_delta_pallas(system, R, xnew, xold, ip, with_force: bool):
    """Fused (dpot, df2) for R[W,B,N,D], xnew/xold[W,B,D], ip scalar|[W].

    Drop-in replacement for the pair part of ops.pairwise.delta_pot under
    PBC with closed-form potentials.
    """
    W, B, N, D = R.shape
    dtype = R.dtype
    rows = W * B
    rows_p = ((rows + TILE - 1) // TILE) * TILE

    # rows on lanes: [D, N, rows]
    Rt = jnp.transpose(R, (3, 2, 0, 1)).reshape(D, N, rows)
    xn = jnp.transpose(xnew, (2, 0, 1)).reshape(D, rows)
    xo = jnp.transpose(xold, (2, 0, 1)).reshape(D, rows)
    ip = jnp.asarray(ip, jnp.int32)
    if ip.ndim == 0:
        ip_row = jnp.full((1, rows), ip, jnp.int32)
    else:
        ip_row = jnp.broadcast_to(ip[:, None], (W, B)).reshape(1, rows)

    if rows_p != rows:
        pad = rows_p - rows
        Rt = jnp.pad(Rt, ((0, 0), (0, 0), (0, pad)))
        xn = jnp.pad(xn, ((0, 0), (0, pad)))
        xo = jnp.pad(xo, ((0, 0), (0, pad)))
        ip_row = jnp.pad(ip_row, ((0, 0), (0, pad)))

    grid = (rows_p // TILE,)
    kernel = functools.partial(_kernel, system, with_force)
    dpot, df2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((D, N, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, rows_p), dtype),
            jax.ShapeDtypeStruct((1, rows_p), dtype),
        ],
    )(Rt, xn, xo, ip_row)
    dpot = dpot[0, :rows].reshape(W, B)
    df2 = df2[0, :rows].reshape(W, B)
    return dpot, df2
