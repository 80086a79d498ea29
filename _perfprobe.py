import time, jax, numpy as np
from pathintegralgroundstate_tpu.state import init_state
from pathintegralgroundstate_tpu.sweep import Sweeper, run_block
from pathintegralgroundstate_tpu.system import make_system, make_tables
from __graft_entry__ import _flagship_cfg

def bench_cfg(tag, cfg, nstep=5):
    system = make_system(cfg)
    tables = make_tables(system)
    sweeper = Sweeper(system, tables)
    state = init_state(system)
    block = jax.jit(lambda st: run_block(system, tables, sweeper, st, nstep))
    t0=time.time(); state, stats = block(state); np.asarray(stats.counters); tc=time.time()-t0
    t0=time.time(); state, stats = block(state); np.asarray(stats.counters); t=time.time()-t0
    W=cfg.n_walkers
    bu = nstep*W*cfg.Np*((2*cfg.Nb+1)//max(cfg.CMFreq,1) + 3*cfg.Nstag*(2**cfg.Nlev))
    print(f"{tag:28s} W={W:5d} compile={tc:5.0f}s run/step={t/nstep:7.3f}s  {bu/t/1e6:9.2f} M bead-upd/s", flush=True)

bench_cfg("full W512", _flagship_cfg(n_walkers=512))
bench_cfg("full W2048", _flagship_cfg(n_walkers=2048))
