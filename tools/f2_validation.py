"""Quantify the reference's partial-dF2 measure distortion on He-4.

Runs the flagship diagonal workload twice — cfg.exact_f2 False (reference
semantics: moved-particle |F_ip|^2 only, vpi_mod.f90:2825) and True (exact
Chin F^2 field difference) — and reports mixed/thermo energies.  The exact
form must close the mixed-vs-thermo gap and land the tail-corrected E/N in
the literature band (-7.17 +/- 0.1 K).

Usage: python tools/f2_validation.py [outdir] [Nb] [nblocks]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathintegralgroundstate_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from pathintegralgroundstate_tpu.driver import Driver  # noqa: E402
from tools.tau_ladder import KELVIN, rung_cfg, tail_correction  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/f2_validation"
    Nb = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    nblocks = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    os.makedirs(outdir, exist_ok=True)
    rows = []
    for exact in (False, True):
        cfg = rung_cfg(Nb, 5e-3).replace(
            exact_f2=exact, n_walkers=256, Nblock=nblocks)
        rdir = os.path.join(outdir, f"exact{int(exact)}_Nb{Nb}")
        t0 = time.time()
        drv = Driver(cfg, out_dir=rdir, verbose=False)
        drv.run_burnin(6)
        drv.run(nblocks)
        dv = tail_correction(cfg.density, drv.system.geo.rcut)
        f = drv.final
        row = dict(exact_f2=exact, Nb=Nb,
                   E=f["E"], dE=f["VarE"], Et=f["Et"], dEt=f["VarEt"],
                   E_K=(f["E"] + dv) * KELVIN, dE_K=f["VarE"] * KELVIN,
                   Et_K=(f["Et"] + dv) * KELVIN, dEt_K=f["VarEt"] * KELVIN,
                   V_K=f["V"] * KELVIN, K_K=f["K"] * KELVIN,
                   wall_s=round(time.time() - t0, 1))
        rows.append(row)
        with open(os.path.join(outdir, "f2_validation.jsonl"), "a") as fh:
            fh.write(json.dumps(row) + "\n")
        print(f"exact_f2={exact}: E/N = {row['E_K']:+.3f}({row['dE_K']:.3f})"
              f" K   Et/N = {row['Et_K']:+.3f}({row['dEt_K']:.3f}) K"
              f"   [{row['wall_s']}s]", flush=True)


if __name__ == "__main__":
    main()
