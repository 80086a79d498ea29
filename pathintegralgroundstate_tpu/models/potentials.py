"""Pair potentials (vectorized, differentiable).

Re-implements every potential the reference ships — active or left as a
swap-in comment — as elementwise jnp functions with *analytic* radial
derivatives (the reference's `Force` body is dead code, system_mod.f90:186-209;
its production force path is a finite-difference table derivative,
vpi_mod.f90:2736.  We provide the exact analytic dV/dr instead, plus the
table path for parity).

  aziz2   — Aziz II HFD-B(HE) He-He potential    (system_mod.f90:136-182)
  aziz1   — Aziz I HFDHE2 He-He potential        (system_mod.f90:87-132, commented)
  soft    — soft-sphere V0*(1/r^6-1)/r^6 toy     (system_mod.f90:70-83, commented)
  dipolar — 1/r^3 dipolar gas (2-D stretch config in BASELINE.json)
  none    — ideal gas (V=0)

Units follow the reference: energies in Kelvin scaled by V0 = E0/1.85505...,
lengths in units of sigma = 2.556 Angstrom (system_mod.f90:163,169).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

# Aziz II HFD-B(HE) parameters (system_mod.f90:153-163)
_AZIZ2 = dict(
    E0=10.948, rm=2.963, A=1.8443101e5, alpha=10.43329537, beta=-2.27965105,
    C6=1.36745214, C8=0.42123807, C10=0.17473318, D=1.4826,
)
# Aziz I HFDHE2 parameters (system_mod.f90:104-113)
_AZIZ1 = dict(
    E0=10.8, rm=2.9673, A=0.54485046e6, alpha=13.353384, beta=0.0,
    C6=1.3732412, C8=0.4253785, C10=0.1781, D=1.241314,
)
_UNIT_DENOM = 1.85505153154686  # system_mod.f90:163
_SIGMA = 2.556                  # Angstrom; system_mod.f90:169


def _aziz_factory(p):
    V0 = p["E0"] / _UNIT_DENOM
    s = _SIGMA / p["rm"]
    A, alpha, beta = p["A"], p["alpha"], p["beta"]
    C6, C8, C10, D = p["C6"], p["C8"], p["C10"], p["D"]
    s_inv = 1.0 / s

    # Hard-core floor: below d ~ 1e-3 (r ~ 1e-3 sigma) the damped-dispersion
    # product underflows to 0 * inf = NaN in float32; the clamped wall keeps
    # V ~ V0*A (enormous, always rejected) and the kernels NaN-free.  The
    # reference relies on float64 underflow for the same region.
    D_MIN = 1.0e-3

    def v(r):
        d = jnp.maximum(s * r, D_MIN)
        d2 = d * d
        rep = A * jnp.exp(-alpha * d + beta * d2)
        H = jnp.where(d <= D, jnp.exp(-jnp.square(D / d - 1.0)), 1.0)
        W = C6 + C8 / d2 + C10 / (d2 * d2)
        return V0 * (rep - W * H / (d2 * d2 * d2))

    def dvdr(r):
        d = jnp.maximum(s * r, D_MIN)
        d2 = d * d
        rep = A * jnp.exp(-alpha * d + beta * d2)
        drep = rep * (-alpha + 2.0 * beta * d)
        H = jnp.where(d <= D, jnp.exp(-jnp.square(D / d - 1.0)), 1.0)
        dH = jnp.where(d <= D, H * 2.0 * (D / d - 1.0) * D / d2, 0.0)
        W = C6 + C8 / d2 + C10 / (d2 * d2)
        dW = -2.0 * C8 / (d2 * d) - 4.0 * C10 / (d2 * d2 * d)
        d6 = d2 * d2 * d2
        dG = (dW * H + W * dH) / d6 - 6.0 * W * H / (d6 * d)
        return V0 * s * (drep - dG)

    def v_dv(r, rinv=None):
        # fused value+derivative on the hot path: reciprocal-based (a single
        # rsqrt-derived 1/r, no divides) and one pass over the shared
        # transcendental subexpressions — the TPU VPU cost is dominated by
        # exp/divide, so this form is ~2-3x the naive one.
        if rinv is None:
            rinv = 1.0 / r
        d = jnp.maximum(s * r, D_MIN)
        di = jnp.minimum(s_inv * rinv, 1.0 / D_MIN)
        d2i = di * di
        rep = A * jnp.exp(-alpha * d + beta * (d * d))
        t = D * di - 1.0
        core = d <= D
        H = jnp.where(core, jnp.exp(-t * t), 1.0)
        dH = jnp.where(core, H * 2.0 * t * D * d2i, 0.0)
        W = C6 + d2i * (C8 + C10 * d2i)
        dW = -d2i * di * (2.0 * C8 + 4.0 * C10 * d2i)
        d6i = d2i * d2i * d2i
        WH6 = W * H * d6i
        val = V0 * (rep - WH6)
        drep = rep * (-alpha + 2.0 * beta * d)
        dG = (dW * H + W * dH) * d6i - 6.0 * WH6 * di
        return val, V0 * s * (drep - dG)

    return v, dvdr, v_dv


def _soft_factory(V0=22.0228):
    # system_mod.f90:70-83 (commented swap-in variant)
    def v(r):
        r6 = r ** 6
        return V0 * (1.0 / r6 - 1.0) / r6

    def dvdr(r):
        return V0 * (-12.0 / r ** 13 + 6.0 / r ** 7)

    return v, dvdr, lambda r: (v(r), dvdr(r))


def _dipolar_factory(Cdd=1.0):
    def v(r):
        return Cdd / r ** 3

    def dvdr(r):
        return -3.0 * Cdd / r ** 4

    return v, dvdr, lambda r: (v(r), dvdr(r))


def _none_factory():
    z = lambda r: jnp.zeros_like(r)
    return z, z, lambda r: (z(r), z(r))


@dataclasses.dataclass(frozen=True)
class Potential:
    name: str
    v: Callable     # V(r), elementwise
    dvdr: Callable  # dV/dr(r), elementwise (analytic)
    v_dv: Callable  # fused (V, dV/dr) sharing subexpressions


_REGISTRY = {}


def register(name: str, v, dvdr, v_dv=None):
    _REGISTRY[name] = Potential(name, v, dvdr, v_dv or (lambda r: (v(r), dvdr(r))))


register("aziz2", *_aziz_factory(_AZIZ2))
register("aziz1", *_aziz_factory(_AZIZ1))
register("soft", *_soft_factory())
register("dipolar", *_dipolar_factory())
register("none", *_none_factory())


def get_potential(name: str) -> Potential:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown potential {name!r}; known: {sorted(_REGISTRY)}")
