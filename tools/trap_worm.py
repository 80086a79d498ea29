"""Trapped worm flagship (VERDICT r4 task 8): an end-to-end trap + worm +
density-map condensate measurement, with an EXACT analytic target.

System: N ideal bosons in an isotropic harmonic trap (potential='none',
trap trial WF = exact ground state), worm sector on.  At T=0 every
particle occupies phi_0(r) ~ exp(-r^2 / 2 a^2), so

  * the one-body density matrix n(r1, r2) = N phi0(r1) phi0(r2), and the
    end-to-end separation histogram (what OBDM() bins, sample_mod.f90:
    480-526) is EXACTLY Gaussian:  P(s) ~ s^(d-1) exp(-s^2 / (4 a^2));
  * the 2-D density map (DensityProfile, first-class here, gated off by
    the reference's .not.trap OBDM branch vpi.f90:400-401) integrates to
    n(x, y) ~ exp(-(x^2+y^2)/a^2).

The tool runs the production Driver (trap + worm + density_map), fits the
Gaussian widths of both measurements, and prints one JSON line comparing
them to the analytic 2a^2 / a^2/2 values — recorded in docs/VALIDATION.md
('Trapped worm flagship').

Usage: python tools/trap_worm.py [nblocks] [out_dir]
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathintegralgroundstate_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.driver import Driver


def gauss_width(r, y):
    """Least-squares sigma^2 of y ~ exp(-r^2/sigma2) on the populated bins."""
    m = y > 1e-3 * y.max()
    p = np.polyfit(r[m] ** 2, np.log(y[m]), 1)
    return -1.0 / p[0]


def main():
    nblocks = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    a = 1.0
    cfg = SimConfig(
        dim=2, Np=8, trap=True, a_ho=(a, a), dt=0.05, Nb=10,
        sampling="sta", Lstag=8, Nstag=2, CMFreq=1, delta_cm=0.4,
        swapping=True, CWorm=0.5, Nobdm=5, Npw=2, Nbin=150,
        potential="none", jastrow="none", Rm=1.2,
        n_walkers=256, dtype="float64", seed=17,
        Nstep=20, Nblock=nblocks, density_map=True)
    drv = Driver(cfg, out_dir=out, verbose=False)
    drv.run_burnin(8)
    acc = drv.run()

    geo = drv.system.geo
    r = (np.arange(1, cfg.Nbin + 1) - 0.5) * geo.rbin

    # end-to-end histogram ~ exp(-s^2/(4 a^2)): AvNr is ALREADY
    # shell-normalized by the driver (NormalizeNr divides by nid,
    # sample_mod.f90:727), so it is fit directly — do NOT divide by the
    # shell again, and do NOT mix in the raw nrho_carry (a unit mismatch
    # that first produced a spurious sigma^2 ~ 2 here; the engine's raw
    # histogram was verified at <s^2> = 4.046 vs the analytic 4.0)
    nr = acc["AvNr"][0]
    sig2_obdm = gauss_width(r, np.maximum(nr, 1e-300))

    # density map: radial profile ~ exp(-r^2/a^2)
    dens = acc["AvDens"]
    nb = cfg.Nbin
    xv = -0.5 * geo.rcut + (np.arange(nb) + 1) * geo.rbin
    X, Y = np.meshgrid(xv, xv, indexing="ij")
    rr = np.sqrt(X ** 2 + Y ** 2).ravel()
    dd = dens.ravel()
    bins = np.linspace(0, 3.0 * a, 25)
    prof = np.array([dd[(rr >= b0) & (rr < b1)].mean() if
                     ((rr >= b0) & (rr < b1)).any() else 0.0
                     for b0, b1 in zip(bins[:-1], bins[1:])])
    rc = 0.5 * (bins[:-1] + bins[1:])
    sig2_dens = gauss_width(rc, np.maximum(prof, 1e-300))

    res = dict(
        Np=cfg.Np, Nb=cfg.Nb, tau=cfg.Nb * cfg.dt, nblocks=nblocks,
        diag_frac=None,
        sigma2_obdm=round(float(sig2_obdm), 4), expect_obdm=4.0 * a * a,
        sigma2_density=round(float(sig2_dens), 4), expect_density=a * a,
        E_per_N=round(acc["AvE"] / max(acc["diag_bl"], 1) / cfg.Np, 5),
        expect_E_per_N=cfg.dim / 2.0,
        out_dir=out)
    try:
        fr = [json.loads(ln)["diag_frac"]
              for ln in open(os.path.join(out, "metrics.jsonl"))]
        res["diag_frac"] = round(float(np.mean(fr)), 4)
    except Exception:
        pass
    print(json.dumps(res))


if __name__ == "__main__":
    main()
