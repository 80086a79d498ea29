"""Pair-tile (tensor-parallel) sharding of the O(N^2) interaction kernels.

For large particle counts the pair sums — the estimator sweeps
(PotentialEnergy, sample_mod.f90:13-150) and the partner loops inside the
move kernels — dominate.  Here the *partner* axis is sharded over the
mesh's 'tp' axis with `shard_map`: each device holds the full bead slice R
(replicated, it is small) but evaluates only its N/tp partner columns, and
the partial potential/force sums are `psum`-reduced over ICI
(SURVEY.md §2.3, axis 'TP').

This module provides drop-in sharded versions of the full-configuration
pair ops; the walker axis composes orthogonally on 'dp'.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import jastrow as jas
from ..system import System, Tables
from ..utils.pbc import minimum_image
from ..ops.pairwise import _dv_of_r, _v_of_r


def pair_pot_tp(system: System, tables: Tables, mesh: Mesh):
    """Returns fn(R[..., N, D]) -> (Pot, F2) with the partner axis sharded
    over mesh axis 'tp'.  R is replicated; each shard computes its partner
    tile and partial sums are psum'ed."""
    cfg, geo = system.cfg, system.geo
    ntp = mesh.shape["tp"]
    N = cfg.Np
    assert N % ntp == 0, f"Np={N} must divide tp={ntp}"

    def shard_fn(R):
        # R: full [N, D] (replicated); this shard's partner tile:
        tp_idx = jax.lax.axis_index("tp")
        nloc = N // ntp
        j0 = tp_idx * nloc
        Rj = jax.lax.dynamic_slice_in_dim(R, j0, nloc, axis=0)
        xij = R[:, None, :] - Rj[None, :, :]             # [N, nloc, D]
        if system.pbc:
            xij, rij2 = minimum_image(xij, geo.Lbox)
        else:
            rij2 = jnp.sum(xij * xij, axis=-1)
        jglob = j0 + jnp.arange(nloc)
        notself = jnp.arange(N)[:, None] != jglob[None, :]
        m = notself & (rij2 <= geo.rcut2) if system.pbc else notself
        r = jnp.sqrt(jnp.where(notself, rij2, 1.0))
        v = jnp.where(m, _v_of_r(system, tables, r), 0.0)
        pot = 0.5 * jax.lax.psum(jnp.sum(v), "tp")
        fr = jnp.where(m, _dv_of_r(system, tables, r) / r, 0.0)
        # F_i = sum over ALL partners j -> psum of this shard's partial
        F = jax.lax.psum(jnp.sum(fr[..., None] * xij, axis=1), "tp")  # [N, D]
        if cfg.trap:
            F = F + jas.trap_pot_grad(cfg.a_ho, R)
            pot = pot + jnp.sum(jas.trap_pot(cfg.a_ho, R))
        f2 = jnp.sum(F * F)
        return pot, f2

    smapped = shard_map(shard_fn, mesh=mesh, in_specs=P(),
                        out_specs=(P(), P()), check_vma=False)

    def fn(R):
        # vmap over any leading batch axes (beads, walkers)
        lead = R.shape[:-2]
        flat = R.reshape((-1,) + R.shape[-2:])
        pot, f2 = jax.vmap(smapped)(flat)
        return pot.reshape(lead), f2.reshape(lead)

    return fn
