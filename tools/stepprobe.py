"""Component-level timing of one flagship MC step at W=4096."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np
from pathintegralgroundstate_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from pathintegralgroundstate_tpu.state import init_state
from pathintegralgroundstate_tpu.system import make_system, make_tables
from pathintegralgroundstate_tpu.ops import estimators as est
from pathintegralgroundstate_tpu.ops import moves as mv
from pathintegralgroundstate_tpu.ops import bisection as bis
from pathintegralgroundstate_tpu.ops import worm as wm
from __graft_entry__ import _flagship_cfg

W = 4096
cfg = _flagship_cfg(n_walkers=W)
system = make_system(cfg)
tables = make_tables(system)
state = init_state(system)
paths = state.paths
key = jax.random.key(0)
active = jnp.ones((W,), bool)

def timeit(name, f, *args, n=10):
    g = jax.jit(f)
    r = g(*args); np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    t0 = time.time()
    for _ in range(n):
        r = g(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[0]
    dt = (time.time() - t0) / n
    print(f"{name:24s} {dt*1e3:9.3f} ms")
    return dt

t = {}
t['therm'] = timeit("therm_energy", lambda p: est.therm_energy(system, tables, p), paths)
t['local'] = timeit("local_energy x2", lambda p: (
    jax.vmap(lambda x: est.local_energy(system, tables, x))(p[:, 0]),
    jax.vmap(lambda x: est.local_energy(system, tables, x))(p[:, -1])), paths)
t['gr'] = timeit("gr+sk", lambda p: (
    jax.vmap(lambda x: est.pair_correlation(system, x))(p[:, cfg.Nb]),
    jax.vmap(lambda x: est.structure_factor(system, cfg.Nk, x))(p[:, cfg.Nb])), paths)
t['cm'] = timeit("translate_chain", lambda k, p: mv.translate_chain(
    system, tables, k, p, 3, active, system.geo.delta_cm), key, paths)
t['bis'] = timeit("bisection", lambda k, p: bis.bisection(
    system, tables, k, p, 3, active, cfg.Nlev), key, paths)
t['headb'] = timeit("head_bisection", lambda k, p: bis.move_head_bisection(
    system, tables, k, p, 3, active, cfg.Nlev), key, paths)
t['tailb'] = timeit("tail_bisection", lambda k, p: bis.move_tail_bisection(
    system, tables, k, p, 3, active, cfg.Nlev), key, paths)
xend = state.xend
iworm = state.iworm
t['th'] = timeit("translate_half", lambda k, p: mv.translate_half_chain(
    system, tables, k, p, xend, iworm, 1, active, system.geo.delta_cm), key, paths)
t['hh'] = timeit("head_half", lambda k, p: mv.move_head_half_chain(
    system, tables, k, p, xend, iworm, 1, active, cfg.Lstag), key, paths)
t['sh'] = timeit("staging_half", lambda k, p: mv.staging_half_chain(
    system, tables, k, p, xend, iworm, 1, active, cfg.Lstag), key, paths)
t['swap'] = timeit("swap", lambda k, p: wm.swap_move(
    system, tables, k, p, xend, iworm, active, cfg.Lstag), key, paths)
t['open'] = timeit("open_chain", lambda k, p: wm.open_chain(
    system, tables, k, p, xend, iworm, active, cfg.Lstag), key, paths)

step = (cfg.Np * t['cm']
        + cfg.Nstag * cfg.Np * (t['bis'] + t['headb'] + t['tailb'])
        + cfg.Nobdm * (2*t['th'] + 2*(t['hh']*2 + t['sh']) + t['swap'])
        + t['therm'] + t['local'] + t['gr'] + t['open'])
print(f"\nreconstructed step: {step*1e3:.0f} ms  (measured ~2470 ms)")
print(f"  CM total       {cfg.Np*t['cm']*1e3:8.0f} ms")
print(f"  bis sweeps     {cfg.Nstag*cfg.Np*(t['bis']+t['headb']+t['tailb'])*1e3:8.0f} ms")
print(f"  worm updates   {cfg.Nobdm*(2*t['th']+2*(2*t['hh']+t['sh'])+t['swap'])*1e3:8.0f} ms")
print(f"  estimators     {(t['therm']+t['local']+t['gr'])*1e3:8.0f} ms")
