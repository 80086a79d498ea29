"""Fused Pallas pair-delta kernel vs the reference jnp path (interpret mode
on CPU; the real kernel runs on TPU via cfg.use_pallas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.ops.pairwise import delta_pot
from pathintegralgroundstate_tpu.ops.pallas_kernels import pair_delta_pallas
from pathintegralgroundstate_tpu.system import make_system, make_tables


@pytest.mark.parametrize("with_force", [True, False])
def test_pallas_matches_jnp(with_force):
    cfg = SimConfig(dim=3, Np=16, density=0.365, Nb=4, dt=5e-3, Rm=1.2,
                    dtype="float32", potential="aziz2", n_walkers=4)
    system = make_system(cfg)
    tables = make_tables(system)
    key = jax.random.key(0)
    W, B, N, D = 4, 5, cfg.Np, cfg.dim
    L = system.geo.Lbox[0]
    R = (jax.random.uniform(key, (W, B, N, D), jnp.float32) - 0.5) * L
    ip = jnp.array([0, 3, 7, 15], jnp.int32)
    xold = jnp.take_along_axis(R, ip[:, None, None, None], axis=2)[:, :, 0]
    xnew = xold + 0.05 * jax.random.normal(jax.random.key(1), xold.shape,
                                           jnp.float32)

    ref_dpot, ref_df2 = delta_pot(system, tables, R, xnew, xold, ip,
                                  with_force=with_force)
    with pltpu.force_tpu_interpret_mode():
        got_dpot, got_df2 = pair_delta_pallas(system, R, xnew, xold, ip,
                                              with_force)
    np.testing.assert_allclose(np.asarray(got_dpot), np.asarray(ref_dpot),
                               rtol=2e-4, atol=1e-4)
    if with_force:
        np.testing.assert_allclose(np.asarray(got_df2), np.asarray(ref_df2),
                                   rtol=2e-4, atol=1e-3)


def test_pallas_scalar_ip():
    cfg = SimConfig(dim=3, Np=8, density=0.365, Nb=2, dt=5e-3, Rm=1.2,
                    dtype="float32", potential="aziz2", n_walkers=2)
    system = make_system(cfg)
    tables = make_tables(system)
    key = jax.random.key(2)
    W, B, N, D = 2, 3, cfg.Np, cfg.dim
    L = system.geo.Lbox[0]
    R = (jax.random.uniform(key, (W, B, N, D), jnp.float32) - 0.5) * L
    ip = 2
    xold = R[:, :, ip]
    xnew = xold + 0.03
    ref = delta_pot(system, tables, R, xnew, xold, ip, with_force=True)
    with pltpu.force_tpu_interpret_mode():
        got = pair_delta_pallas(system, R, xnew, xold, ip, True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=2e-4, atol=1e-3)


def _mk(W=4, B=5, Np=16, seed=0):
    cfg = SimConfig(dim=3, Np=Np, density=0.365, Nb=4, dt=5e-3, Rm=1.2,
                    dtype="float32", potential="aziz2", n_walkers=W)
    system = make_system(cfg)
    tables = make_tables(system)
    L = system.geo.Lbox[0]
    key = jax.random.key(seed)
    R = (jax.random.uniform(key, (W, B, Np, cfg.dim), jnp.float32) - 0.5) * L
    return system, tables, R


def test_pallas_u_matches_jnp():
    """pair_u_pallas == delta_wf's jnp path (UpdateWf partner loop)."""
    from pathintegralgroundstate_tpu.ops.pairwise import delta_wf
    from pathintegralgroundstate_tpu.ops.pallas_kernels import pair_u_pallas

    system, tables, R = _mk()
    W, B = R.shape[:2]
    ip = jnp.array([0, 3, 7, 15], jnp.int32)
    xold = jnp.take_along_axis(R, ip[:, None, None, None], axis=2)[:, :, 0]
    xnew = xold + 0.05 * jax.random.normal(jax.random.key(1), xold.shape,
                                           jnp.float32)
    ref = delta_wf(system, tables, R, xnew, xold, ip)
    with pltpu.force_tpu_interpret_mode():
        got = pair_u_pallas(system, R, xnew, xold, ip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("with_force", [True, False])
def test_pallas_pair_pot_matches_jnp(with_force):
    """pair_pot_pallas == the jnp all-pairs pot/F2 (ThermEnergy substrate)."""
    from pathintegralgroundstate_tpu.ops.pairwise import pair_pot
    from pathintegralgroundstate_tpu.ops.pallas_kernels import pair_pot_pallas

    system, tables, R = _mk(W=3, B=4, Np=16, seed=3)
    ref_pot, ref_f2 = pair_pot(system, tables, R, with_force=with_force)
    with pltpu.force_tpu_interpret_mode():
        got_pot, got_f2 = pair_pot_pallas(system, R, with_force)
    np.testing.assert_allclose(np.asarray(got_pot), np.asarray(ref_pot),
                               rtol=2e-4, atol=1e-3)
    if with_force:
        np.testing.assert_allclose(np.asarray(got_f2), np.asarray(ref_f2),
                                   rtol=2e-4, atol=1e-2)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-kernel parity needs a real TPU")
def test_pallas_compiled_on_tpu_matches_jnp():
    """The COMPILED kernels (not interpret mode) match the jnp path on the
    actual chip — the numerics gate for enabling use_pallas in production."""
    from pathintegralgroundstate_tpu.ops.pairwise import (
        delta_pot, delta_wf, pair_pot)
    from pathintegralgroundstate_tpu.ops.pallas_kernels import (
        pair_delta_pallas, pair_pot_pallas, pair_u_pallas)

    system, tables, R = _mk(W=4, B=5, Np=16, seed=7)
    ip = jnp.array([0, 3, 7, 15], jnp.int32)
    xold = jnp.take_along_axis(R, ip[:, None, None, None], axis=2)[:, :, 0]
    xnew = xold + 0.05 * jax.random.normal(jax.random.key(1), xold.shape,
                                           jnp.float32)

    ref_dpot, ref_df2 = delta_pot(system, tables, R, xnew, xold, ip, True)
    got_dpot, got_df2 = pair_delta_pallas(system, R, xnew, xold, ip, True)
    np.testing.assert_allclose(np.asarray(got_dpot), np.asarray(ref_dpot),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_df2), np.asarray(ref_df2),
                               rtol=2e-4, atol=1e-3)

    ref_u = delta_wf(system, tables, R, xnew, xold, ip)
    got_u = pair_u_pallas(system, R, xnew, xold, ip)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u),
                               rtol=2e-4, atol=1e-4)

    ref_pot, ref_f2 = pair_pot(system, tables, R, with_force=True)
    got_pot, got_f2 = pair_pot_pallas(system, R, True)
    np.testing.assert_allclose(np.asarray(got_pot), np.asarray(ref_pot),
                               rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_f2), np.asarray(ref_f2),
                               rtol=2e-4, atol=1e-2)
