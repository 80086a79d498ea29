"""Step-time grid over engine configurations (flagship He-4 workload).

Times one jit-compiled block of NSTEP full MC steps for each variant and
prints bead-updates/s — the tool behind the default choices recorded in
docs/VALIDATION.md.  Run on the real chip.
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


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    base = _flagship_cfg(n_walkers=W)
    variants = [
        ("fused+pallas (default)", base),
        ("fused, no pallas", base.replace(use_pallas=False)),
        ("unfused (reference order)", base.replace(fused_sweep=False)),
        ("fused, sta ends", base.replace(end_regrow="sta")),
        ("fused+pallas, exact_f2", base.replace(exact_f2=True)),
    ]
    per = _bead_updates_per_step(base)
    for name, cfg in variants:
        try:
            reps = _run(cfg, nreps=3)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED: {e}")
            continue
        dt = float(np.median(reps))
        rate = per * NSTEP * W / dt
        print(f"{name:28s} {dt/NSTEP*1e3:8.1f} ms/step   "
              f"{rate:.3g} bead-updates/s", flush=True)


if __name__ == "__main__":
    main()
