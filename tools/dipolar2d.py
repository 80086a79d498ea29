"""2-D dipolar Bose gas, N=256 — BASELINE.json stretch config #5.

Exercises the TENSOR-PARALLEL pair axis at the particle count it exists
for: the O(Np^2) = 65k-pair kernels are GSPMD-partitioned over the mesh's
'tp' axis (ops/pairwise._tp_constrain) while walkers shard over 'dp'.
Run on the fake 8-device CPU mesh (default) or a real slice:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/dipolar2d.py [outdir] [nblocks]

Checks performed (recorded in docs/VALIDATION.md):
  * the (dp=4, tp=2) sharded run produces FINITE energies with healthy
    acceptances, and matches an unsharded run of the same seed/config;
  * g(r) shows the dipolar correlation hole (g ~ 0 at small r) and
    approaches 1 at large r;
  * the energy is positive (purely repulsive 1/r^3 gas).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# default to the fake 8-device CPU mesh (the ambient environment pins
# JAX_PLATFORMS=axon -> 1 TPU chip, too few for the dp x tp mesh);
# PIGS_TOOL_TPU=1 runs on the real devices instead
_FORCE_CPU = os.environ.get("PIGS_TOOL_TPU", "") in ("", "0")
if _FORCE_CPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if _FORCE_CPU:
    # the environment registers the TPU plugin at interpreter start; the
    # config update (before any backend touch) still wins (tests/conftest)
    jax.config.update("jax_platforms", "cpu")

from pathintegralgroundstate_tpu.config import SimConfig  # noqa: E402
from pathintegralgroundstate_tpu.driver import Driver  # noqa: E402


def build_cfg(**kw):
    base = dict(
        dim=2, Np=256, density=0.25, trap=False,
        dt=1e-3, Nb=8, sampling="bis", Lstag=8, Nlev=2, Nstag=1,
        CMFreq=1, delta_cm=0.12, Rm=1.0,
        # the zero-energy 1/r^3 two-body Jastrow: |grad u|^2 cancels the
        # dipolar core in the local energy (models/jastrow.dipolar_u);
        # the He-4 McMillan form leaves the mixed estimator unbounded here
        potential="dipolar", jastrow="dipolar2d",
        n_walkers=8, dtype="float64", seed=11,
        Nstep=5, Nblock=3, Nbin=50, Nk=20,
        use_pallas=False,
    )
    base.update(kw)
    return SimConfig(**base)


def run(cfg, outdir, burnin=3):
    drv = Driver(cfg, out_dir=outdir, verbose=False)
    drv.run_burnin(burnin)
    acc = drv.run()
    return drv, acc


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dipolar2d"
    nblocks = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    t0 = time.time()
    cfg = build_cfg(Nblock=nblocks, mesh_walkers=4, mesh_pairs=2)
    drv, acc = run(cfg, outdir + "/tp")
    nb = acc["diag_bl"]
    E = acc["AvE"] / nb / cfg.Np
    Et = acc["AvEt"] / nb / cfg.Np
    gr = acc["AvGr"] / nb
    print(f"(dp=4, tp=2)  E/N = {E:.6f}   Et/N = {Et:.6f}   "
          f"[{time.time() - t0:.0f}s]")
    assert np.isfinite(E) and np.isfinite(Et)
    assert E > 0 and Et > 0, \
        "repulsive dipolar gas must have positive energy"
    # correlation hole + long-range normalization (measured at these
    # settings: g = [0.011, 0.215, 0.582, 0.850, 0.946, ...] -> ~1)
    assert gr[0] < 0.05 and gr[1] < 0.5, \
        f"no dipolar correlation hole: {gr[:5]}"
    assert abs(np.mean(gr[-10:]) - 1.0) < 0.35, f"g(r) tail: {gr[-10:]}"

    t1 = time.time()
    cfg1 = build_cfg(Nblock=nblocks)
    drv1, acc1 = run(cfg1, outdir + "/single")
    E1 = acc1["AvE"] / acc1["diag_bl"] / cfg.Np
    print(f"unsharded     E/N = {E1:.6f}                      "
          f"[{time.time() - t1:.0f}s]")
    np.testing.assert_allclose(E, E1, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(acc["AvGr"]),
                               np.asarray(acc1["AvGr"]), rtol=1e-8)
    print("OK: tp-sharded == unsharded; dipolar correlation hole present;"
          " E/N > 0")
    print("g(r) first bins:", np.round(gr[:8], 4))
    print("g(r) last bins: ", np.round(gr[-8:], 4))


if __name__ == "__main__":
    main()
