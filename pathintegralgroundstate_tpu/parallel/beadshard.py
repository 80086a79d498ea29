"""Sequence-parallel (SP) bead-axis sharding with ring halo exchange.

The imaginary-time axis (beads 0..2*Nb) is the reference's "sequence"
(SURVEY.md §2.3 SP row, §5 long-context row): every sampling move is a
windowed stencil on it (Staging window vpi_mod.f90:498, bisection dyadic
window vpi_mod.f90:890-891).  For large bead counts M the axis is sharded
across an 'sp' mesh axis — the ring-attention communication pattern:

  * the M-1 links are split into S contiguous shards of Mloc links; shard k
    owns beads [k*Mloc, (k+1)*Mloc) and fetches ONE halo bead (the next
    shard's first bead) via `lax.ppermute` over the ring; the global last
    bead 2*Nb is carried replicated.
  * each shard regrows one staging window per move, with the window's
    interior strictly inside the shard's owned beads.  Windows on different
    shards touch DISJOINT coordinates whose Delta-S depends only on their
    own interior plus fixed endpoints, so the S simultaneous Metropolis
    decisions compose into a valid product kernel (detailed balance per
    factor).  Boundary beads (k*Mloc) are never moved by this kernel —
    ergodicity comes from the rest of the move set (CM translations, head /
    tail regrows), exactly as the reference mixes move classes.
  * Chin weights / end-WF terms use GLOBAL bead indices, reconstructed from
    `lax.axis_index('sp')`.

`sp_staging_sweep_ref` is the same composite kernel expressed unsharded
(vmap over an explicit shard axis) — the two are bitwise-equal on identical
keys (tests/test_beadshard.py), which is the SP correctness gate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.moves import metropolis, segment_regrow
from ..system import System, Tables


def make_sp_mesh(n_sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices[:n_sp]), axis_names=("sp",))


def _check_sp_geometry(Mm1: int, S: int, L: int):
    """_shard_move assumes start_parity=0, valid only when every shard
    offset k*Mloc is even — i.e. Mloc even (and the links divide evenly);
    an odd Mloc would silently swap Chin odd/even weights on odd shards."""
    if Mm1 % S:
        raise ValueError(f"M-1={Mm1} links must divide the sp axis S={S}")
    Mloc = Mm1 // S
    if Mloc % 2:
        raise ValueError(f"Mloc={Mloc} must be even (even-aligned windows)")
    if L % 2 or L > Mloc:
        raise ValueError(f"window L={L} must be even and <= Mloc={Mloc}")


def _shard_move(system: System, tables: Tables, key, paths_l, halo, ip,
                L: int, offset, shard_idx):
    """One staging move on this shard's local beads.

    paths_l [W, Mloc, N, D] owned beads; halo [W, N, D] the next boundary
    bead; offset = global index of local bead 0 (traced); shard_idx folds
    the RNG so every shard draws an independent window/proposal.
    """
    W, Mloc, N, D = paths_l.shape
    key = jax.random.fold_in(key, shard_idx)
    k_ii, k_reg, k_acc = jax.random.split(key, 3)

    ext = jnp.concatenate([paths_l, halo[:, None]], axis=1)  # [W, Mloc+1,N,D]
    # even-aligned local window start in [0, Mloc - L] (Mloc, L even)
    ii = 2 * jax.random.randint(k_ii, (), 0, (Mloc - L) // 2 + 1,
                                dtype=jnp.int32)
    R_seg = lax.dynamic_slice_in_dim(ext, ii, L + 1, axis=1)  # [W, L+1, N, D]
    seg = R_seg[:, :, ip, :]                                  # [W, L+1, D]
    ib_seg = (offset + ii + jnp.arange(L + 1))[None, :].astype(jnp.int32)
    ib_seg = jnp.broadcast_to(ib_seg, (W, L + 1))
    Ls = jnp.full((W,), L, jnp.int32)
    seg_new, dS = segment_regrow(
        system, tables, k_reg, seg, R_seg, ib_seg, ip, Ls, "fixed", 1.0,
        fixed_L=L)
    acc = metropolis(k_acc, dS)
    seg_fin = jnp.where(acc[:, None, None], seg_new, seg)
    # write interior beads back (indices ii+1 .. ii+L-1, all owned)
    chain_l = jnp.take(paths_l, jnp.asarray(ip), axis=2)   # [W, Mloc, D]
    chain_l = lax.dynamic_update_slice_in_dim(
        chain_l, seg_fin[:, 1:L], ii + 1, axis=1)
    paths_l = paths_l.at[:, :, ip, :].set(chain_l)
    return paths_l, acc


def sp_staging_sweep(system: System, tables: Tables, mesh: Mesh, L: int):
    """Build the SP-sharded staging sweep: (key, paths, last_bead, ip) ->
    (paths', accepted[S, W]).  paths [W, M-1, N, D] sharded on the bead axis
    over 'sp'; last_bead [W, N, D] replicated."""
    S = mesh.shape["sp"]

    def sweep(key, paths, last_bead, ip):
        Mm1 = paths.shape[1]
        _check_sp_geometry(Mm1, S, L)

        def shard_fn(key, paths_l, last_b):
            k = lax.axis_index("sp")
            Mloc = paths_l.shape[1]
            # ring halo: each shard sends its first owned bead to its LEFT
            # neighbor, i.e. receives the NEXT shard's boundary bead; shard
            # S-1's "next" bead is the (replicated) global last bead
            first = paths_l[:, 0]
            halo = lax.ppermute(first, "sp",
                                [(i, (i - 1) % S) for i in range(S)])
            halo = jnp.where(k == S - 1, last_b, halo)
            paths_l, acc = _shard_move(system, tables, key, paths_l, halo,
                                       ip, L, k * Mloc, k)
            return paths_l, acc[None]

        return jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(None, "sp"), P()),
            out_specs=(P(None, "sp"), P("sp")),
        )(key, paths, last_bead)

    return sweep


def sp_staging_sweep_ref(system: System, tables: Tables, S: int, L: int):
    """Unsharded reference of the same composite kernel (explicit shard axis
    + vmap) — bitwise-equal to sp_staging_sweep on identical keys."""

    def sweep(key, paths, last_bead, ip):
        W, Mm1, N, D = paths.shape
        _check_sp_geometry(Mm1, S, L)
        Mloc = Mm1 // S
        blocks = paths.reshape(W, S, Mloc, N, D).swapaxes(0, 1)  # [S,W,Mloc..]
        halos = jnp.concatenate(
            [blocks[1:, :, 0], last_bead[None]], axis=0)         # [S, W, N, D]

        def per_shard(k, paths_l, halo):
            return _shard_move(system, tables, key, paths_l, halo, ip, L,
                               k * Mloc, k)

        new_blocks, acc = jax.vmap(per_shard)(jnp.arange(S), blocks, halos)
        out = new_blocks.swapaxes(0, 1).reshape(W, Mm1, N, D)
        return out, acc

    return sweep
