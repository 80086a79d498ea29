"""Gradient-based trial-wavefunction optimization over Rm (the variational
north star, SURVEY.md §7; VERDICT r4 task 5).

Optimizes the McMillan parameter Rm of psi_T = exp(sum u(r; Rm)) for He-4
at the flagship density by stochastic gradient descent on the VARIATIONAL
energy E_V(Rm) = <E_L>_{|psi_Rm|^2} — the tau -> 0 limit of the PIGS mixed
estimator — using jax.grad through the reweighted batch estimator
(ops/variational.vmc_energy):

    dE/dRm = 2 <dlogpsi/dRm (E_L - E)> + <dE_L/dRm>

The reference bakes Rm into a module global and tunes it by hand
(system_mod.f90:38-66); here the derivative is exact autodiff through the
same closed forms the sampler uses.  Literature optimum for the bare
McMillan form at rho = 0.365 sigma^-3: Rm ~ 1.2 sigma (McMillan 1965;
the shipped vpi.in uses 1.20).

Usage: python tools/optimize_rm.py [Np] [nsteps]
Writes one JSON line per iteration and a final summary, recorded in
docs/VALIDATION.md ('Variational optimization').
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathintegralgroundstate_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.ops import variational as var
from pathintegralgroundstate_tpu.state import init_state
from pathintegralgroundstate_tpu.system import make_system


def main():
    Np = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    niter = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    W = 256
    cfg = SimConfig(dim=3, Np=Np, density=0.365, dt=5e-3, Nb=4,
                    sampling="sta", Lstag=4, Nstag=1, n_walkers=W,
                    dtype="float64", potential="aziz2",
                    jastrow="mcmillan_c1", seed=7)
    system = make_system(cfg)
    st = init_state(system)
    Rs = st.paths[:, 0]                       # [W, N, D] slice ensemble
    key = jax.random.key(11)

    sweep = jax.jit(lambda k, Rs, rm: var.vmc_sweep(
        system, k, Rs, rm, 0.35, nsweeps=10))
    e_and_g = jax.jit(jax.value_and_grad(
        lambda rm, Rs: var.vmc_energy(system, Rs, rm)))

    # burn-in from the uniform placement
    Rm = 1.05  # start deliberately off-optimum
    for _ in range(12):
        key, k2 = jax.random.split(key)
        Rs, acc = sweep(k2, Rs, jnp.asarray(Rm))

    # Adam on Rm
    m = v = 0.0
    lr, b1, b2, eps = 0.02, 0.9, 0.999, 1e-8
    hist = []
    for it in range(1, niter + 1):
        key, k2 = jax.random.split(key)
        Rs, acc = sweep(k2, Rs, jnp.asarray(Rm))
        E, g = e_and_g(jnp.asarray(Rm), Rs)
        E, g = float(E), float(g)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** it)
        vh = v / (1 - b2 ** it)
        Rm = float(np.clip(Rm - lr * mh / (np.sqrt(vh) + eps), 0.8, 1.8))
        rec = dict(iter=it, Rm=round(Rm, 5), E_per_N=round(E / Np, 5),
                   dE_dRm_per_N=round(g / Np, 4), acc=round(float(acc), 3))
        hist.append(rec)
        print(json.dumps(rec), flush=True)

    tail = hist[-10:]
    Rm_mean = float(np.mean([h["Rm"] for h in tail]))
    g_mean = float(np.mean([h["dE_dRm_per_N"] for h in tail]))
    print(json.dumps(dict(
        summary=True, Np=Np, W=W, Rm_opt=round(Rm_mean, 4),
        dE_dRm_per_N_at_opt=round(g_mean, 4),
        E_per_N_at_opt=round(float(np.mean([h["E_per_N"] for h in tail])), 4),
        literature="Rm ~ 1.2 sigma (McMillan form, rho=0.365)")))

    # independent check: a fresh-sampled E(Rm) grid (no reweighting, same
    # seed stream per point) bracketing the optimum
    if os.environ.get("PIGS_RM_SCAN", "") not in ("", "0"):
        for rm in (1.00, 1.10, 1.15, 1.20, 1.25, 1.35):
            k = jax.random.key(99)
            Rs2, _ = sweep(k, st.paths[:, 0], jnp.asarray(rm))
            for _ in range(15):
                k, k2 = jax.random.split(k)
                Rs2, _ = sweep(k2, Rs2, jnp.asarray(rm))
            es = []
            for _ in range(12):
                k, k2 = jax.random.split(k)
                Rs2, _ = sweep(k2, Rs2, jnp.asarray(rm))
                es.append(float(var.vmc_energy(system, Rs2,
                                               jnp.asarray(rm))) / Np)
            print(json.dumps(dict(scan_Rm=rm,
                                  E_per_N=round(float(np.mean(es)), 4),
                                  err=round(float(np.std(es))
                                            / np.sqrt(len(es)), 4))))


if __name__ == "__main__":
    main()
