"""Device-mesh sharding of the walker ensemble.

The reference is one process / one walker (SURVEY.md §2.3); here the walker
axis W is data-parallel across a `jax.sharding.Mesh`:

  * every `MCState` array is sharded on its leading walker axis
    (PartitionSpec('dp', ...)); the PRNG key and step counter replicate;
  * the whole block (Nstep sweeps) jit-compiles into a single SPMD program —
    walker updates are embarrassingly parallel, and the only collectives XLA
    inserts are the all-reduces of the block statistics (energy sums,
    histograms), riding ICI once per block;
  * a second mesh axis 'tp' is reserved for pair-tile (partner-axis)
    parallelism for large Np (ops/pairwise._tp_constrain).

Multi-host: call `jax.distributed.initialize()` before building the mesh;
everything below is expressed in global arrays so the same code runs on a
pod slice unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..state import MCState
from ..sweep import Sweeper, run_block, zero_stats
from ..system import System, Tables


def make_mesh(n_dp: int | None = None, n_tp: int = 1, devices=None) -> Mesh:
    """Build a ('dp', 'tp') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_dp is None:
        n_dp = len(devices) // n_tp
    devs = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devs, axis_names=("dp", "tp"))


def state_shardings(mesh: Mesh) -> MCState:
    """NamedSharding pytree for MCState: walker axis on 'dp', key replicated."""
    dp = lambda *rest: NamedSharding(mesh, P("dp", *rest))
    rep = NamedSharding(mesh, P())
    return MCState(
        paths=dp(), xend=dp(), isopen=dp(), iworm=dp(), key=rep,
        in_cycle=dp(), iperm=dp(), step=rep,
    )


def shard_state(state: MCState, mesh: Mesh) -> MCState:
    sh = state_shardings(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(jax.device_put, state, sh)

    # multi-process: every process computed the identical GLOBAL state
    # (same seed), so each one serves its addressable shards from its full
    # local copy.  Typed PRNG keys go through key_data/wrap_key_data (the
    # extended dtype cannot ride make_array_from_callback directly).
    def put(x, s):
        is_key = jnp.issubdtype(x.dtype, jax.dtypes.prng_key)
        data = np.asarray(jax.random.key_data(x) if is_key else x)
        arr = jax.make_array_from_callback(
            data.shape, s, lambda idx: data[idx])
        return jax.random.wrap_key_data(arr) if is_key else arr

    return jax.tree.map(put, state, sh)


def sharded_block_fn(system: System, tables: Tables, sweeper: Sweeper,
                     nstep: int, mesh: Mesh):
    """jit-compiled block runner with walker-sharded state in/out.

    Block statistics come out replicated (XLA all-reduces the walker sums).
    """
    sh = state_shardings(mesh)
    rep = NamedSharding(mesh, P())
    stats_sh = jax.tree.map(lambda _: rep, zero_stats(system))

    def block(state):
        return run_block(system, tables, sweeper, state, nstep)

    return jax.jit(block, in_shardings=(sh,), out_shardings=(sh, stats_sh))
