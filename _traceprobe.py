import time, glob, jax, numpy as np
from pathintegralgroundstate_tpu.state import init_state
from pathintegralgroundstate_tpu.sweep import Sweeper, run_block
from pathintegralgroundstate_tpu.system import make_system, make_tables
from __graft_entry__ import _flagship_cfg

cfg = _flagship_cfg(n_walkers=512)
system = make_system(cfg); tables = make_tables(system)
sweeper = Sweeper(system, tables)
state = init_state(system)
block = jax.jit(lambda st: run_block(system, tables, sweeper, st, 2))
state, stats = block(state); np.asarray(stats.counters)  # compile

jax.profiler.start_trace("/tmp/jxtrace")
state, stats = block(state); np.asarray(stats.counters)
jax.profiler.stop_trace()
print("trace captured")
