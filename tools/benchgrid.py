"""Step-time grid over engine configurations (flagship He-4 workload).

Times one jit-compiled block of NSTEP full MC steps for each variant and
prints bead-updates/s — the tool behind the default choices recorded in
docs/VALIDATION.md.  Run on the real chip.

Usage: python tools/benchgrid.py [W ...]     (default: 2048 4096 8192)
       PIGS_GRID=full python tools/benchgrid.py 4096   (all variants)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathintegralgroundstate_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from bench import NSTEP, _bead_updates_per_step, _run  # noqa: E402
from __graft_entry__ import _flagship_cfg  # noqa: E402


def run_one(name, cfg, W):
    per = _bead_updates_per_step(cfg)
    try:
        reps = _run(cfg, nreps=3)
    except Exception as e:  # noqa: BLE001
        print(f"W={W:6d} {name:28s} FAILED: {e}")
        return
    dt = float(np.median(reps))
    rate = per * NSTEP * W / dt
    print(f"W={W:6d} {name:28s} {dt/NSTEP*1e3:8.1f} ms/step   "
          f"{rate:.3g} bead-updates/s", flush=True)


def main():
    ws = [int(a) for a in sys.argv[1:]] or [512, 4096, 8192]
    full = os.environ.get("PIGS_GRID", "") == "full"
    for W in ws:
        base = _flagship_cfg(n_walkers=W)
        variants = [("default", base)]
        if full:
            variants += [
                ("exact_f2 (cached)", base.replace(exact_f2=True)),
                ("pallas rows deltas", base.replace(pallas_rows=True)),
                ("no pallas at all", base.replace(use_pallas=False)),
                ("sta ends", base.replace(end_regrow="sta")),
                ("unfused (reference order)", base.replace(fused_sweep=False)),
                ("measure_every=5", base.replace(measure_every=5)),
            ]
        for name, cfg in variants:
            run_one(name, cfg, W)


if __name__ == "__main__":
    main()
