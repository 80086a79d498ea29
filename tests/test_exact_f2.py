"""The Chin-action F^2 term: reference semantics vs exact field difference.

The reference's UpdatePot returns dF2 = |F_ip^new|^2 - |F_ip^old|^2 for the
MOVED particle only (vpi_mod.f90:2825-2836), omitting the partners' force
changes.  That Delta-S is NOT the difference of any configuration function:
summing it around a closed cycle of single-particle moves does not return
to zero, so the Metropolis chain samples a move-mix-dependent distortion of
the nominal 4th-order measure.  cfg.exact_f2 switches delta_pot to the
exact field difference F^2(R') - F^2(R) with F^2 = sum_i |F_i|^2 — a
conservative Delta-S by construction.

These tests pin both facts quantitatively.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.ops.pairwise import delta_pot, pair_pot
from pathintegralgroundstate_tpu.system import make_system, make_tables


def _mk(Np=8, exact=True, seed=0):
    cfg = SimConfig(dim=3, Np=Np, density=0.3, dt=5e-3, Nb=4, Rm=1.2,
                    dtype="float64", potential="aziz2", n_walkers=1,
                    exact_f2=exact)
    system = make_system(cfg)
    tables = make_tables(system)
    L = system.geo.Lbox[0]
    key = jax.random.key(seed)
    # spread-out configuration (no hard-core overlap): jittered lattice
    n = int(np.ceil(Np ** (1 / 3)))
    grid = (np.stack(np.meshgrid(*[np.arange(n)] * 3), -1)
            .reshape(-1, 3)[:Np] + 0.5) / n * L - L / 2
    R = jnp.asarray(grid) + 0.05 * jax.random.normal(key, (Np, 3))
    return system, tables, R[None, None]  # [W=1, B=1, N, D]


def _df2(system, tables, R, xnew, xold, ip):
    _, df2 = delta_pot(system, tables, R, xnew, xold, ip, with_force=True)
    return float(df2[0, 0])


def test_exact_f2_equals_field_difference():
    """cfg.exact_f2 reproduces the brute-force F^2(R') - F^2(R)."""
    system, tables, R = _mk(exact=True)
    xold = R[:, :, 3]
    xnew = xold + 0.11
    got = _df2(system, tables, R, xnew, xold, 3)
    Rp = R.at[:, :, 3].set(xnew)
    _, f2n = pair_pot(system, tables, Rp, with_force=True)
    _, f2o = pair_pot(system, tables, R, with_force=True)
    np.testing.assert_allclose(got, float((f2n - f2o)[0, 0]), rtol=1e-10)


def test_exact_f2_n2_is_twice_partial():
    """N=2, pure pair forces: F_2 = -F_1 (Newton's third law), so the exact
    Delta(sum_i |F_i|^2) is exactly TWICE the reference's moved-particle
    delta — the minimal case where the omission is visible."""
    sys_p, tab_p, R = _mk(Np=2, exact=False)
    sys_e, tab_e, _ = _mk(Np=2, exact=True)
    xold = R[:, :, 0]
    xnew = xold + 0.07
    d_partial = _df2(sys_p, tab_p, R, xnew, xold, 0)
    d_exact = _df2(sys_e, tab_e, R, xnew, xold, 0)
    assert abs(d_partial) > 1e-12
    np.testing.assert_allclose(d_exact, 2.0 * d_partial, rtol=1e-10)


def test_partial_f2_is_not_conservative_exact_is():
    """Sum Delta-F^2 around a closed 3-leg cycle of single-particle moves
    (particle 0 then particle 1 then both back).  The exact form returns to
    zero; the reference's partial form does not — the defect that biases
    its sampled measure."""
    system_p, tables_p, R0 = _mk(exact=False, seed=2)
    system_e, tables_e, _ = _mk(exact=True, seed=2)
    d0 = jnp.asarray([0.09, -0.04, 0.06])
    d1 = jnp.asarray([-0.05, 0.08, 0.03])

    def cycle(system, tables):
        total = 0.0
        R = R0
        # leg 1: move particle 0 by d0
        x0 = R[:, :, 0]
        total += _df2(system, tables, R, x0 + d0, x0, 0)
        R = R.at[:, :, 0].set(x0 + d0)
        # leg 2: move particle 1 by d1
        x1 = R[:, :, 1]
        total += _df2(system, tables, R, x1 + d1, x1, 1)
        R = R.at[:, :, 1].set(x1 + d1)
        # legs 3+4: undo both
        x0 = R[:, :, 0]
        total += _df2(system, tables, R, x0 - d0, x0, 0)
        R = R.at[:, :, 0].set(x0 - d0)
        x1 = R[:, :, 1]
        total += _df2(system, tables, R, x1 - d1, x1, 1)
        return total

    loop_exact = cycle(system_e, tables_e)
    loop_partial = cycle(system_p, tables_p)
    assert abs(loop_exact) < 1e-9, loop_exact
    assert abs(loop_partial) > 1e-6, (
        "expected the reference's partial dF2 to be path-dependent; "
        f"got cycle sum {loop_partial}")
