"""He-4 projection-time (tau = Nb*dt) convergence ladder.

Runs the reference's shipped diagonal workload (vpi.in:1-33 — N=64,
rho=0.365 sigma^-3, Chin action, bisection Nlev=4, Nstag=5) at increasing
bead counts and records the mixed/thermodynamic energies per rung, plus the
standard potential tail correction

    dV/N = 2 pi rho * int_rcut^inf V(r) r^2 dr        (g(r) ~ 1 beyond rcut)

which the literature values (Sarsa 2000, Boninsegni 2006: E/N ~ -7.17 K at
equilibrium density) include but the reference does not apply (it truncates
V at rcut = L/2 with no correction, vpi.f90:122, vpi_mod.f90:2719).

Usage: python tools/tau_ladder.py [outdir]    (runs on the default backend;
point JAX at the TPU).  Appends one JSON line per rung to
<outdir>/tau_ladder.jsonl and prints a summary table.
"""

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathintegralgroundstate_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from pathintegralgroundstate_tpu.config import SimConfig  # noqa: E402
from pathintegralgroundstate_tpu.driver import Driver  # noqa: E402

KELVIN = 1.85505  # reference unit scale (system_mod.f90:163)

# (Nb, dt) rungs; (64, 2.5e-3) repeats tau=0.16 at half the time step as the
# dt-error cross-check
LADDER = [(16, 5e-3), (32, 5e-3), (64, 5e-3), (96, 5e-3), (128, 5e-3),
          (64, 2.5e-3)]
W = 512
NSTEP = 50
BURNIN = 8
NBLOCK = 24


def tail_correction(density: float, rcut: float) -> float:
    """dV/N in configuration units: 2 pi rho int_rcut^inf V(r) r^2 dr."""
    from pathintegralgroundstate_tpu.models.potentials import get_potential
    import jax
    v = get_potential("aziz2").v
    # integrate to 10*rcut on a fine log grid (V ~ -C6/r^6 tail)
    r = np.geomspace(rcut, 10.0 * rcut, 4001)
    with jax.default_device(jax.devices("cpu")[0]):
        vr = np.asarray(v(r), dtype=np.float64)
    return 2.0 * math.pi * density * np.trapezoid(vr * r * r, r)


def rung_cfg(Nb: int, dt: float, jastrow: str = "mcmillan_c1") -> SimConfig:
    return SimConfig(
        dim=3, Np=64, density=0.365, trap=False,
        dt=dt, Nb=Nb, sampling="bis", Lstag=32, Nlev=4, Nstag=5,
        CMFreq=1, delta_cm=0.12, Rm=1.2,
        swapping=False, CWorm=0.0, Nobdm=0, Npw=0,
        n_walkers=W, dtype="float32", potential="aziz2", jastrow=jastrow,
        Nstep=NSTEP, Nblock=NBLOCK, seed=1982 + Nb,
    )


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tau_ladder"
    os.makedirs(outdir, exist_ok=True)
    log = os.path.join(outdir, "tau_ladder.jsonl")
    rows = []
    for Nb, dt in LADDER:
        cfg = rung_cfg(Nb, dt)
        rdir = os.path.join(outdir, f"Nb{Nb}_dt{dt:g}")
        t0 = time.time()
        drv = Driver(cfg, out_dir=rdir, verbose=False)
        drv.run_burnin(BURNIN)
        drv.run(NBLOCK)
        dv = tail_correction(cfg.density, drv.system.geo.rcut)
        f = drv.final
        row = dict(Nb=Nb, dt=dt, tau=Nb * dt,
                   E=f["E"], dE=f["VarE"], Et=f["Et"], dEt=f["VarEt"],
                   V=f["V"], K=f["K"], tail=dv,
                   E_K=(f["E"] + dv) * KELVIN, dE_K=f["VarE"] * KELVIN,
                   Et_K=(f["Et"] + dv) * KELVIN, dEt_K=f["VarEt"] * KELVIN,
                   wall_s=round(time.time() - t0, 1))
        rows.append(row)
        with open(log, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        print(f"Nb={Nb:4d} dt={dt:g} tau={Nb*dt:.3f}  "
              f"E/N={row['E_K']:+.3f}({row['dE_K']:.3f}) K  "
              f"Et/N={row['Et_K']:+.3f}({row['dEt_K']:.3f}) K  "
              f"tail={dv*KELVIN:+.3f} K  [{row['wall_s']}s]", flush=True)

    print("\n# tau-convergence (tail-corrected, Kelvin/atom; "
          "literature -7.17 +/- 0.02 K):")
    for r in rows:
        print(f"  tau={r['tau']:.3f} (Nb={r['Nb']}, dt={r['dt']:g}): "
              f"mixed {r['E_K']:+.3f} +/- {r['dE_K']:.3f}   "
              f"thermo {r['Et_K']:+.3f} +/- {r['dEt_K']:.3f}")


if __name__ == "__main__":
    main()
