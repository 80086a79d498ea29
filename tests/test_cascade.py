"""Cascade composite kernels (ops/cascade_kernels): invariance of the jnp
twin on the exactly-known HO path measure, window hygiene on He-4, and the
TPU kernel-vs-twin equivalence gate (same packed randoms)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.ops.cascade_kernels import (
    cascade_jnp, cascade_pallas, fused_ends_cascade, interior_cascade,
    rigid_cascade, use_cascade_kernel)
from pathintegralgroundstate_tpu.system import make_system, make_tables

from test_invariance import (_cfg, _check_invariant, _exact_samples,
                             _iterate, _precision_matrix, NB, DT, W)

ACTIVE = None  # set per test


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg(Nlev=2)
    system = make_system(cfg)
    tables = make_tables(system)
    M = system.M
    x = _exact_samples(M, DT, W, seed=17)
    paths0 = jnp.asarray(x)[:, :, None, None]
    Sigma = np.linalg.inv(_precision_matrix(M, DT))
    return system, tables, paths0, Sigma


def test_ends_cascade_invariance(setup):
    system, tables, paths0, Sigma = setup
    act = jnp.ones((W,), bool)

    def move(k, p):
        p, a, b = fused_ends_cascade(system, tables, k, p, 0, act, 2)
        return p, a

    x = _iterate(move, paths0, jax.random.key(21))
    M = system.M
    _check_invariant(x, Sigma, [0, 1, 2, 3, M - 4, M - 2, M - 1])


def test_interior_cascade_invariance(setup):
    system, tables, paths0, Sigma = setup
    act = jnp.ones((W,), bool)

    def move(k, p):
        p, a = interior_cascade(system, tables, k, p, [0], act, 2)
        return p, a

    x = _iterate(move, paths0, jax.random.key(22))
    M = system.M
    _check_invariant(x, Sigma, [M // 2 - 1, M // 2, M // 2 + 1])


def test_rigid_cascade_invariance(setup):
    system, tables, paths0, Sigma = setup
    act = jnp.ones((W,), bool)

    def move(k, p):
        return rigid_cascade(system, tables, k, p, 0, act, 0.6)

    x = _iterate(move, paths0, jax.random.key(23))
    _check_invariant(x, Sigma, [0, NB, 2 * NB])


def _he4(**kw):
    base = dict(dim=3, Np=8, density=0.3, dt=5e-3, Nb=8, sampling="bis",
                Nlev=2, Rm=1.2, n_walkers=16, dtype="float64",
                potential="aziz2", seed=4)
    base.update(kw)
    return SimConfig(**base)


def test_cascade_he4_window_hygiene():
    """Only the intended particle/beads move; acceptances are sane."""
    cfg = _he4()
    system = make_system(cfg)
    tables = make_tables(system)
    key = jax.random.key(9)
    W_, N = cfg.n_walkers, cfg.Np
    M = system.M
    paths = jnp.asarray(system.geo.Lbox) * (
        jax.random.uniform(key, (W_, M, N, 3), jnp.float64) - 0.5)
    act = jnp.ones((W_,), bool)

    p2, ah, at = fused_ends_cascade(system, tables, jax.random.key(1),
                                    paths, 3, act, 2)
    d = np.abs(np.asarray(p2 - paths))
    L = 4
    assert d[:, L + 1: M - 1 - L].max() == 0.0       # interior untouched
    assert (d[:, :, :3].max() == 0.0) and (d[:, :, 4:].max() == 0.0)
    assert 0 < int(np.asarray(ah).sum()) <= W_

    p3, acc = interior_cascade(system, tables, jax.random.key(2), paths,
                               [1, 5, 7], act, 2)
    d = np.abs(np.asarray(p3 - paths))
    assert d[:, :, [0, 2, 3, 4, 6]].max() == 0.0      # other particles fixed
    assert d[:, 0].max() == 0.0 and d[:, -1].max() == 0.0
    assert int(np.asarray(acc).sum()) > 0

    p4, accr = rigid_cascade(system, tables, jax.random.key(3), paths, 2,
                             act, 0.05)
    d = np.abs(np.asarray(p4 - paths))
    assert (d[:, :, :2].max() == 0.0) and (d[:, :, 3:].max() == 0.0)
    # the whole worldline moves rigidly for accepted walkers
    moved = np.asarray(accr)
    assert 0 < moved.sum() <= W_


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="kernel path is TPU-only")
def test_cascade_kernel_matches_twin():
    """The Pallas cascade must equal the jnp twin on the SAME randoms."""
    cfg = _he4(Np=16, n_walkers=64, dtype="float32")
    system = make_system(cfg)
    tables = make_tables(system)
    assert use_cascade_kernel(system)
    key = jax.random.key(5)
    W_, N, M = cfg.n_walkers, cfg.Np, system.M
    paths = jnp.asarray(system.geo.Lbox, jnp.float32) * (
        jax.random.uniform(key, (W_, M, N, 3), jnp.float32) - 0.5)
    L = 4
    for mode, S, Lw, nlev in (("ends", 2, L, 2), ("interior", 3, L, 2)):
        kg, ku = jax.random.split(jax.random.fold_in(key, hash(mode) % 97))
        if mode == "ends":
            Rwin = jnp.stack([paths[:, :Lw + 1],
                              paths[:, M - 1 - Lw:][:, ::-1]], axis=1)
            ips = jnp.asarray([3, 3], jnp.int32)
        else:
            Rwin = jnp.stack([paths[:, k * Lw: (k + 1) * Lw + 1]
                              for k in range(3)], axis=1)
            ips = jnp.asarray([1, 5, 7], jnp.int32)
        G = nlev + (1 if mode == "ends" else 0)
        rg = jax.random.normal(kg, (W_, S, Lw + 1, 3), jnp.float32)
        ru = jax.random.uniform(ku, (W_, S, G), jnp.float32)
        act = jnp.ones((W_, S), bool)
        sa, aa = cascade_pallas(system, mode, Rwin, rg, ru, ips, nlev, act)
        sb, ab = cascade_jnp(system, tables, mode, Rwin, rg, ru, ips,
                             nlev, act)
        aa, ab = np.asarray(aa), np.asarray(ab)
        sa, sb = np.asarray(sa), np.asarray(sb)
        # f32 reassociation can flip knife-edge accepts; demand near-total
        # agreement and positional equality where the decisions agree
        agree = aa == ab
        assert agree.mean() > 0.95, (mode, agree.mean())
        np.testing.assert_allclose(sa[agree], sb[agree], rtol=2e-4,
                                   atol=2e-5, err_msg=mode)
