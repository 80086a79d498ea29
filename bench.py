#!/usr/bin/env python
"""Benchmark: bead-updates/s/chip on the reference's shipped He-4 workload
(vpi.in:1-33 — N=64, Nb=32, bisection Nlev=4, Nstag=5, worm on) batched over
a walker ensemble.  Prints ONE JSON line.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is reported
against the serial-Fortran cost model estimate of ~2e6 bead-updates/s for
one CPU core (derived cost model, SURVEY.md §6), i.e. the factor by which
the TPU ensemble engine out-runs the reference's single walker.
"""

import json
import time

import jax

from pathintegralgroundstate_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

REF_BEAD_UPDATES_PER_S = 2.0e6  # serial-CPU cost-model estimate (BASELINE.md)


def main():
    from pathintegralgroundstate_tpu.state import init_state
    from pathintegralgroundstate_tpu.sweep import Sweeper, run_block
    from pathintegralgroundstate_tpu.system import make_system, make_tables
    from __graft_entry__ import _flagship_cfg

    on_tpu = jax.devices()[0].platform != "cpu"
    W = 512 if on_tpu else 8
    cfg = _flagship_cfg(n_walkers=W)
    if not on_tpu:  # CPU smoke fallback: shrink the workload
        cfg = cfg.replace(Nb=8, Np=16, Nstag=1, Nobdm=2)
    system = make_system(cfg)
    tables = make_tables(system)
    sweeper = Sweeper(system, tables)
    state = init_state(system)

    nstep = 5
    block = jax.jit(lambda st: run_block(system, tables, sweeper, st, nstep))
    import numpy as np
    state, stats = block(state)          # compile + warmup
    np.asarray(stats.counters)           # force a real device sync/readback
    t0 = time.time()
    state, stats = block(state)
    np.asarray(stats.counters)           # sync: block_until_ready alone does
    dt = time.time() - t0                # not drain the axon relay queue

    # bead updates attempted per step (displaced beads across all moves)
    M = cfg.M
    window = 2 ** cfg.Nlev if cfg.sampling == "bis" else cfg.Lstag
    per_step = cfg.Np * (M // max(cfg.CMFreq, 1)          # CM: all beads
                         + cfg.Nstag * 3 * window)        # head/tail/staging
    if cfg.CWorm > 0:
        per_step += cfg.Nobdm * (2 * (cfg.Nb + 1) + 2 * 3 * cfg.Lstag)
    total = per_step * nstep * W
    rate = total / dt
    print(json.dumps({
        "metric": "bead_updates_per_s_per_chip",
        "value": rate,
        "unit": "bead-updates/s/chip",
        "vs_baseline": rate / REF_BEAD_UPDATES_PER_S,
    }))


if __name__ == "__main__":
    main()
