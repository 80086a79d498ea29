"""Independent baseline denominator (VERDICT r4 task 6): a plain-numpy,
single-walker, single-CPU-core transcription of the reference's serial
Monte Carlo loop at the shipped vpi.in workload.

This is NOT the engine: no JAX, no ensembles, no fused kernels — one
worldline, Python/numpy control flow mirroring the reference's diagonal
sweep (vpi.f90:406-439): per step, a rigid CM translation per particle
(TranslateChain, vpi_mod.f90:313-379), then Nstag sweeps of
MoveHeadBisection / MoveTailBisection / Bisection per particle
(vpi_mod.f90:864-1372) with the per-level Metropolis early exit, plus the
mixed + thermodynamic energy estimators (sample_mod.f90:154-388).  The
partner loop is numpy-vectorized (length-Np arrays), which makes this
FASTER than the literal scalar Fortran — a conservative (generous)
denominator.

Physics pieces (Aziz-II, McMillan u, Chin opt=0 weights) follow the same
closed forms as the engine's models; semantics citations:
system_mod.f90:136-182 (potential), global_mod.f90:33-46 (weights),
vpi_mod.f90:2491-2530 (UpdateAction placement rules).

Prints one JSON line: {"numpy_1walker_bead_updates_per_s": ...}.
bead-update accounting = the engine's (sweep.bead_updates_per_step on the
same config with CWorm=0): CM charges M beads per particle, each
bisection-class move charges its full 2**Nlev window.
"""

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---- workload: vpi.in (reference shipped config), worm off ----
DIM, NP, DENSITY = 3, 64, 0.365
NB, DT = 32, 5.0e-3
NLEV, NSTAG, CMFREQ = 4, 5, 1
DELTA_CM, RM = 0.12, 1.20
M = 2 * NB + 1
L = (NP / DENSITY) ** (1.0 / 3.0)
RCUT = 0.5 * L
RCUT2 = RCUT * RCUT

rng = np.random.default_rng(1982)

# ---- Aziz-II HFD-B(HE) (system_mod.f90:136-182 constants) ----
_EPS = 10.948
_A, _ALPHA, _BETA = 1.8443101e5, 10.43329537, -2.27965105
_C6, _C8, _C10 = 1.36745214, 0.42123807, 0.17473318
_D = 1.4826
_RMA = 2.963
_V0 = _EPS / 1.8550499998251727  # unit scale, system_mod.f90:163
_RS = 2.556 / _RMA               # r -> r * 2.556/rm


def aziz(r):
    x = r * _RS
    damp = np.where(x < _D, np.exp(-np.where(x < _D, (_D / np.maximum(x, 1e-12) - 1.0), 0.0) ** 2), 1.0)
    x2 = x * x
    disp = (_C6 / x2 ** 3 + _C8 / x2 ** 4 + _C10 / x2 ** 5) * damp
    return _V0 * (_A * np.exp(_ALPHA * (-x) + _BETA * x2) - disp)


def daziz(r):
    h = 1e-6
    return (aziz(r + h) - aziz(r - h)) / (2 * h)


def u_mcm(r):
    # McMillan with the engine's C1-matched truncation (system.py:u)
    u = -0.5 * (RM / r) ** 5
    uc = -0.5 * (RM / RCUT) ** 5
    duc = 2.5 * (RM / RCUT) ** 5 / RCUT
    return u - uc - duc * (r - RCUT)


def du_mcm(r):
    return 2.5 * (RM / r) ** 5 / r - 2.5 * (RM / RCUT) ** 5 / RCUT


def d2u_mcm(r):
    return -15.0 * (RM / r) ** 5 / r ** 2


def mi(dx):
    return dx - L * np.rint(dx / L)


def pair_r(path_b, ip, x):
    """Distances of position x to all partners at one bead slice."""
    d = mi(x[None, :] - path_b)               # [NP, 3]
    r2 = np.sum(d * d, axis=1)
    r2[ip] = 1e30
    return np.sqrt(r2), d, r2


def delta_action(path, ip, ib, xnew, xold):
    """UpdateAction (vpi_mod.f90:2491-2530): wv*dPot + wf*dF2 - end dLogPsi."""
    rn, dn, r2n = pair_r(path[ib], ip, xnew)
    ro, do_, r2o = pair_r(path[ib], ip, xold)
    mn = r2n <= RCUT2
    mo = r2o <= RCUT2
    dpot = np.sum(aziz(rn[mn])) - np.sum(aziz(ro[mo]))
    interior = 0 < ib < M - 1
    odd = interior and ib % 2 == 1
    wv = (4.0 * DT / 3.0) if odd else (2.0 * DT / 3.0) if interior else DT / 3.0
    dS = wv * dpot
    if odd:  # moved-particle dF2 (vpi_mod.f90:2825)
        Fn = np.sum((daziz(rn) / rn)[mn, None] * dn[mn], axis=0)
        Fo = np.sum((daziz(ro) / ro)[mo, None] * do_[mo], axis=0)
        dS += (4.0 * DT / 3.0) * DT * DT / 6.0 * (Fn @ Fn - Fo @ Fo)
    if not interior:
        dwf = np.sum(u_mcm(rn[mn])) - np.sum(u_mcm(ro[mo]))
        dS -= dwf
    return dS


def metro(dS):
    return dS < 0 or rng.random() < math.exp(-dS)


def translate_chain(path, ip):
    dx = DELTA_CM / DENSITY ** (1 / 3) * (2 * rng.random(3) - 1)
    s = 0.0
    xs = np.empty((M, 3))
    for ib in range(M):
        xs[ib] = mi(path[ib, ip] + dx)
        s += delta_action(path, ip, ib, xs[ib], path[ib, ip])
    if metro(s):
        path[:, ip] = xs
        return True
    return False


def bisection(path, ip, lo, end):
    """Multilevel bisection of the window [lo, lo+2**NLEV] (vpi_mod.f90:
    864-998); end=+-1 adds the gaussian terminal guess (head/tail variant,
    vpi_mod.f90:1002-1372).  Per-level Metropolis with early exit."""
    Lw = 2 ** NLEV
    seg0 = path[lo: lo + Lw + 1, ip].copy()
    if end:
        j0 = 0 if end == 1 else Lw          # terminal bead within window
        ja = Lw if end == 1 else 0          # anchor
        xold = path[lo + j0, ip]
        g = rng.standard_normal(3)
        xm = xold - mi(xold - path[lo + ja, ip])
        xnew = mi(xm + math.sqrt(Lw * DT) * g)
        if not metro(delta_action(path, ip, lo + j0, xnew, xold)):
            return False
        path[lo + j0, ip] = xnew
    for ilev in range(1, NLEV + 1):
        delta = 2 ** (NLEV - ilev + 1)
        sigma = math.sqrt(0.25 * delta * DT)
        s = 0.0
        news = []
        for j in range(delta // 2, Lw, delta):
            xold = path[lo + j, ip]
            xp = path[lo + j - delta // 2, ip]
            xn_ = path[lo + j + delta // 2, ip]
            xm = 0.5 * ((xold + mi(xp - xold)) + (xold - mi(xold - xn_)))
            xnew = mi(xm + sigma * rng.standard_normal(3))
            s += delta_action(path, ip, lo + j, xnew, xold)
            news.append((j, xnew))
        if not metro(s):
            path[lo: lo + Lw + 1, ip] = seg0  # early exit (restore)
            return False
        for j, xnew in news:
            path[lo + j, ip] = xnew
    return True


def local_energy(Rb):
    d = mi(Rb[:, None, :] - Rb[None, :, :])
    r2 = np.sum(d * d, axis=-1)
    np.fill_diagonal(r2, 1e30)
    r = np.sqrt(r2)
    m = r2 <= RCUT2
    dudr = np.where(m, du_mcm(r), 0.0)
    lap = 0.5 * np.sum((DIM - 1.0) * dudr / r + np.where(m, d2u_mcm(r), 0.0))
    pot = 0.5 * np.sum(np.where(m, aziz(r), 0.0))
    F = np.sum((dudr / r)[:, :, None] * d, axis=1)
    kin = -0.5 * (2.0 * lap + np.sum(F * F))
    return kin + pot


def therm_energy(path):
    E = 0.0
    for ib in range(M - 1):
        d = mi(path[ib][:, None, :] - path[ib][None, :, :])
        r2 = np.sum(d * d, axis=-1)
        np.fill_diagonal(r2, 1e30)
        m = r2 <= RCUT2
        pot = 0.5 * np.sum(np.where(m, aziz(np.sqrt(r2)), 0.0))
        w = 1.0 / 3.0 if ib == 0 else (4.0 / 3.0 if ib % 2 else 2.0 / 3.0)
        E += w * pot
        dx = mi(path[ib + 1] - path[ib])
        sp = np.sum(dx * dx, axis=1)
        E -= 0.5 * np.sum(sp[sp <= RCUT2]) / (DT * DT)
    return 0.5 * (E / NB + DIM * NP / DT)


def step(path):
    Lw = 2 ** NLEV
    for ip in range(NP):
        translate_chain(path, ip)
    for _ in range(NSTAG):
        for ip in range(NP):
            bisection(path, ip, 0, end=1)
            bisection(path, ip, M - 1 - Lw, end=2)
            lo = 2 * rng.integers(0, (M - 1 - Lw) // 2 + 1)
            bisection(path, ip, lo, end=0)
    e = 0.5 * (local_energy(path[0]) + local_energy(path[-1]))
    et = therm_energy(path)
    return e, et


def main():
    nstep = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    R = L * (rng.random((NP, 3)) - 0.5)
    path = np.tile(R[None], (M, 1, 1))
    e, et = step(path)  # warm numpy caches / equilibrate a touch
    t0 = time.time()
    for _ in range(nstep):
        e, et = step(path)
    dt_ = (time.time() - t0) / nstep

    from pathintegralgroundstate_tpu.sweep import bead_updates_per_step
    from pathintegralgroundstate_tpu.config import SimConfig
    cfg = SimConfig(dim=DIM, Np=NP, density=DENSITY, dt=DT, Nb=NB,
                    sampling="bis", Nlev=NLEV, Nstag=NSTAG, CMFreq=CMFREQ,
                    delta_cm=DELTA_CM, Rm=RM, CWorm=0.0, n_walkers=1,
                    fused_sweep=False)
    per = bead_updates_per_step(cfg)
    print(json.dumps({
        "numpy_1walker_bead_updates_per_s": per / dt_,
        "sec_per_step": dt_, "bead_updates_per_step": per,
        "E_per_N": e / NP, "Et_per_N": et / NP,
        "workload": "vpi.in diagonal (He-4 N=64 Nb=32 bisection Nlev=4)",
    }))


if __name__ == "__main__":
    main()
