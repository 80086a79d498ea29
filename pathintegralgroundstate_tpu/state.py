"""Walker-ensemble Monte Carlo state.

The reference holds ONE configuration: `Path(dim, Np, 0:2*Nb)` plus worm ends
`xend(dim, 2)` and the scalar flags `isopen`, `iworm` (vpi.f90:134-142).
Here the same state is batched over W independent walkers — the fundamental
parallelism axis of the TPU engine (SURVEY.md §2.3) — and the worm flags
become per-walker masks so open and diagonal walkers coexist in one batch.

Layout: `paths[W, M, N, D]` with M = 2*Nb+1 beads (imaginary-time axis),
N particles, D spatial dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .system import System


class MCState(NamedTuple):
    paths: jnp.ndarray    # [W, M, N, D]
    xend: jnp.ndarray     # [W, 2, D]  worm head/tail positions of bead Nb
    isopen: jnp.ndarray   # [W] bool   off-diagonal (worm) sector flag
    iworm: jnp.ndarray    # [W] int32  worm particle index
    key: jnp.ndarray      # PRNG key (threefry), split per step/move/walker
    # permutation-cycle tracking (sample_mod.f90:530-594)
    in_cycle: jnp.ndarray  # [W, N] bool particles in the current cycle
    iperm: jnp.ndarray     # [W] int32   current cycle length
    step: jnp.ndarray      # [] int32    global MC step counter

    @property
    def n_walkers(self) -> int:
        return self.paths.shape[0]


def init_state(system: System, key=None, init_positions=None) -> MCState:
    """Fresh ensemble init, mirroring the reference's `init`
    (vpi_mod.f90:149-259): particles placed uniformly in the box (PBC),
    uniformly in [-a_ho, a_ho] (trap), or from given crystal positions; the
    single time-slice configuration replicated to every bead (classical
    start, vpi_mod.f90:242-248); xend seeded from the central bead.

    init_positions: optional [N, D] (crystal / reference `config_ini.in`)
    or [W, N, D] per-walker array.
    """
    cfg, geo = system.cfg, system.geo
    W, M, N, D = cfg.n_walkers, cfg.M, cfg.Np, cfg.dim
    dtype = system.dtype
    if key is None:
        key = jax.random.key(cfg.seed)  # typed threefry key (checkpointable)
    key, sub = jax.random.split(key)

    if init_positions is not None:
        R = jnp.asarray(init_positions, dtype)
        if R.ndim == 2:
            R = jnp.broadcast_to(R, (W, N, D))
    elif cfg.trap:
        a = jnp.asarray(cfg.a_ho, dtype)
        R = 2.0 * a * (jax.random.uniform(sub, (W, N, D), dtype) - 0.5)
    else:
        L = jnp.asarray(geo.Lbox, dtype)
        R = L * (jax.random.uniform(sub, (W, N, D), dtype) - 0.5)

    paths = jnp.broadcast_to(R[:, None, :, :], (W, M, N, D)).astype(dtype)
    xend = jnp.broadcast_to(paths[:, cfg.Nb, N - 1, :][:, None, :], (W, 2, D)).astype(dtype)
    return MCState(
        paths=paths,
        xend=xend,
        isopen=jnp.zeros((W,), bool),
        iworm=jnp.zeros((W,), jnp.int32),
        key=key,
        in_cycle=jnp.zeros((W, N), bool),
        iperm=jnp.ones((W,), jnp.int32),
        step=jnp.zeros((), jnp.int32),
    )
