"""Detailed-balance / distribution-invariance tests, one per move class
(SURVEY.md §4 test plan; VERDICT r1 item 4).

System: 1-D harmonic trap, Np=1, no pair potential, exact trial WF.  The
engine's Chin-action path measure is then an exactly known multivariate
GAUSSIAN over the bead coordinates (springs + Simpson-weighted quadratic
trap potential + quadratic F^2 terms + Gaussian end caps), so we can

  1. sample the stationary distribution EXACTLY (Cholesky of the precision
     matrix built from the same weights as ops/action.py),
  2. run ONE move class alone for many iterations,
  3. KS-test that bead marginals are unchanged.

This certifies each move's Markov kernel leaves the action measure
invariant — in particular the two deliberate deviations from the
reference's proposal mix: even-aligned shared windows
(ops/moves.py:113-128 vs vpi_mod.f90:498) and fixed-depth end bisection
(ops/bisection.py vs vpi_mod.f90:1023).

A broken acceptance rule (sign flip in exp(-dS), wrong Chin weight, wrong
staging sigma) inflates or deflates the bead variance within a few sweeps
and fails the KS gate decisively (checked by construction: flipping the
dS sign in metropolis() fails every test here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.ops import bisection as bis
from pathintegralgroundstate_tpu.ops import moves as mv
from pathintegralgroundstate_tpu.system import make_system, make_tables

W = 4096          # independent walkers = independent KS samples
NB = 8            # M = 17 beads
DT = 0.2
NITER = 64        # move applications per class
ALPHA = 1e-3      # per-test KS significance (failure modes are gross)


def _cfg(**kw):
    base = dict(dim=1, Np=1, trap=True, a_ho=(1.0,), potential="none",
                dt=DT, Nb=NB, n_walkers=W, dtype="float64",
                sampling="sta", Lstag=8, Nlev=2, seed=11)
    base.update(kw)
    return SimConfig(**base)


def _precision_matrix(M, dt):
    """Exact precision matrix of the engine's Gaussian path measure.

    S(x) = x0^2/2 + xM^2/2                      (end caps, -log psi, a=1)
         + sum_links (x_i - x_{i+1})^2 / (2 dt)  (free-particle springs)
         + sum_i w_i * x_i^2/2                   (Chin V weights, opt=0)
         + sum_odd (2 dt^3/9) * x_i^2            (Chin F^2 term, F = x)
    with w = dt/3 (ends), 2dt/3 (even interior), 4dt/3 (odd).
    Returns Q with S = x^T Q x / 2.
    """
    Q = np.zeros((M, M))
    for i in range(M - 1):  # springs
        Q[i, i] += 1.0 / dt
        Q[i + 1, i + 1] += 1.0 / dt
        Q[i, i + 1] -= 1.0 / dt
        Q[i + 1, i] -= 1.0 / dt
    for i in range(M):      # Chin-weighted trap potential V = x^2/2
        interior = 0 < i < M - 1
        odd = interior and i % 2 == 1
        w = (4.0 * dt / 3.0) if odd else (2.0 * dt / 3.0 if interior
                                          else dt / 3.0)
        Q[i, i] += w
        if odd:             # F^2 = x^2 with weight 2 dt^3/9
            Q[i, i] += 2.0 * (2.0 * dt ** 3 / 9.0)
    Q[0, 0] += 1.0          # end caps
    Q[M - 1, M - 1] += 1.0
    return Q


def _exact_samples(M, dt, n, seed):
    Q = _precision_matrix(M, dt)
    L = np.linalg.cholesky(Q)
    z = np.random.default_rng(seed).standard_normal((M, n))
    x = np.linalg.solve(L.T, z)  # cov = Q^{-1}
    return x.T  # [n, M]


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    system = make_system(cfg)
    tables = make_tables(system)
    M = system.M
    x = _exact_samples(M, DT, W, seed=7)          # [W, M]
    paths0 = jnp.asarray(x)[:, :, None, None]     # [W, M, N=1, D=1]
    Sigma = np.linalg.inv(_precision_matrix(M, DT))
    return system, tables, paths0, Sigma


def _iterate(move_fn, paths0, key):
    """Apply one move class NITER times (jit-compiled scan)."""
    def body(paths, k):
        paths, _ = move_fn(k, paths)
        return paths, None

    keys = jax.random.split(key, NITER)
    run = jax.jit(lambda p: jax.lax.scan(body, p, keys)[0])
    return np.asarray(run(paths0))[:, :, 0, 0]    # [W, M]


def _check_invariant(x_fin, Sigma, beads):
    """KS-test bead marginals against the exact N(0, Sigma_bb) laws."""
    for b in beads:
        sd = np.sqrt(Sigma[b, b])
        d, p = sps.kstest(x_fin[:, b] / sd, "norm")
        assert p > ALPHA, (
            f"bead {b}: KS p={p:.2e} (D={d:.4f}); "
            f"sample sd={x_fin[:, b].std():.4f} vs exact {sd:.4f}")


ACTIVE = jnp.ones((W,), bool)


def test_exact_sampler_is_calibrated(setup):
    """The Cholesky start itself passes the KS gate (null calibration)."""
    system, tables, paths0, Sigma = setup
    x0 = np.asarray(paths0)[:, :, 0, 0]
    _check_invariant(x0, Sigma, beads=[0, NB, 2 * NB])


def test_translate_chain_invariance(setup):
    system, tables, paths0, Sigma = setup
    fn = lambda k, p: mv.translate_chain(system, tables, k, p, 0, ACTIVE, 0.5)
    x = _iterate(fn, paths0, jax.random.key(100))
    _check_invariant(x, Sigma, beads=[0, NB, 2 * NB])


def test_staging_invariance(setup):
    system, tables, paths0, Sigma = setup
    fn = lambda k, p: mv.staging_move(system, tables, k, p, 0, ACTIVE, 8)
    x = _iterate(fn, paths0, jax.random.key(101))
    _check_invariant(x, Sigma, beads=[2, NB, 2 * NB - 2])


def test_move_head_invariance(setup):
    system, tables, paths0, Sigma = setup
    fn = lambda k, p: mv.move_head(system, tables, k, p, 0, ACTIVE, 8)
    x = _iterate(fn, paths0, jax.random.key(102))
    _check_invariant(x, Sigma, beads=[0, 2, 6])


def test_move_tail_invariance(setup):
    system, tables, paths0, Sigma = setup
    fn = lambda k, p: mv.move_tail(system, tables, k, p, 0, ACTIVE, 8)
    x = _iterate(fn, paths0, jax.random.key(103))
    _check_invariant(x, Sigma, beads=[2 * NB, 2 * NB - 2, 2 * NB - 6])


def test_bisection_invariance(setup):
    system, tables, paths0, Sigma = setup
    fn = lambda k, p: bis.bisection(system, tables, k, p, 0, ACTIVE, 2)
    x = _iterate(fn, paths0, jax.random.key(104))
    _check_invariant(x, Sigma, beads=[2, NB, 2 * NB - 2])


def test_head_bisection_invariance(setup):
    system, tables, paths0, Sigma = setup
    fn = lambda k, p: bis.move_head_bisection(system, tables, k, p, 0,
                                              ACTIVE, 2)
    x = _iterate(fn, paths0, jax.random.key(105))
    _check_invariant(x, Sigma, beads=[0, 2, NB])


def test_tail_bisection_invariance(setup):
    system, tables, paths0, Sigma = setup
    fn = lambda k, p: bis.move_tail_bisection(system, tables, k, p, 0,
                                              ACTIVE, 2)
    x = _iterate(fn, paths0, jax.random.key(106))
    _check_invariant(x, Sigma, beads=[2 * NB, 2 * NB - 2, NB])


def test_fused_end_bisections_invariance(setup):
    """Composite head+tail bisection (ops/bisection.fused_end_bisections):
    the two end windows are disjoint and non-adjacent, so the merged
    product kernel must preserve the path measure exactly like the
    sequential pair of moves."""
    system, tables, paths0, Sigma = setup
    fn = lambda k, p: bis.fused_end_bisections(
        system, tables, k, p, 0, ACTIVE, 2)[:2]
    x = _iterate(fn, paths0, jax.random.key(108))
    _check_invariant(x, Sigma, beads=[0, 2, NB, 2 * NB - 2, 2 * NB])


def test_fused_end_stagings_invariance(setup):
    """Composite head+tail staging (ops/moves.fused_end_stagings): one
    ensemble-doubled bridge regrow of both disjoint end windows."""
    system, tables, paths0, Sigma = setup
    fn = lambda k, p: mv.fused_end_stagings(
        system, tables, k, p, 0, ACTIVE, 8)[:2]
    x = _iterate(fn, paths0, jax.random.key(110))
    _check_invariant(x, Sigma, beads=[0, 2, NB, 2 * NB - 2, 2 * NB])


def test_bisection_multi_invariance():
    """Composite K-particle interior bisection (bisection_multi): three
    non-interacting particles (jastrow='none', no pair potential) moved in
    disjoint window slots at once; each particle's Gaussian path measure
    must remain invariant."""
    cfg = _cfg(Np=3, jastrow="none")
    system = make_system(cfg)
    tables = make_tables(system)
    M = system.M
    rng_seeds = [71, 72, 73]
    x = np.stack([_exact_samples(M, DT, W, seed=sd) for sd in rng_seeds],
                 axis=2)                                   # [W, M, 3]
    paths0 = jnp.asarray(x)[:, :, :, None]                 # [W, M, 3, 1]
    Sigma = np.linalg.inv(_precision_matrix(M, DT))

    def fn(k, p):
        p, acc = bis.bisection_multi(system, tables, k, p, [0, 1, 2],
                                     ACTIVE, 2)
        return p, acc

    def body(paths, k):
        paths, _ = fn(k, paths)
        return paths, None

    keys = jax.random.split(jax.random.key(109), NITER)
    run = jax.jit(lambda p: jax.lax.scan(body, p, keys)[0])
    x_fin = np.asarray(run(paths0))[:, :, :, 0]            # [W, M, 3]
    for n in range(3):
        _check_invariant(x_fin[:, :, n], Sigma, beads=[2, NB, 2 * NB - 2])


def test_mala_invariance(setup):
    """Smart-MC (ops/smartmc.py): the gradient-drifted MALA kernel targets
    exp(-total_action) — exactly the Gaussian measure above — and must leave
    it invariant, with a healthy acceptance rate."""
    from pathintegralgroundstate_tpu.ops.smartmc import mala_move

    system, tables, paths0, Sigma = setup
    accs = []

    def fn(k, p):
        p, acc = mala_move(system, tables, k, p, ACTIVE, 0.05)
        return p, acc

    x = _iterate(fn, paths0, jax.random.key(107))
    _check_invariant(x, Sigma, beads=[0, 2, NB, 2 * NB])

    # acceptance sanity (single application)
    _, acc = jax.jit(fn)(jax.random.key(9), paths0)
    rate = float(jnp.mean(acc))
    assert 0.2 < rate <= 1.0, f"MALA acceptance {rate}"


def _mk_rand(key, nlev, start=False, dtype=jnp.float64):
    """Pre-drawn randoms tuple for the batched-randoms move path
    (sweep.Sweeper batch_rand; ops/moves.metropolis_u)."""
    g = jax.random.normal(jax.random.fold_in(key, 0),
                          (W, 2 ** nlev, 1), dtype)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (W, nlev + 1), dtype)
    s = jax.random.uniform(jax.random.fold_in(key, 2), (), dtype) \
        if start else None
    return (s, g, u)


def test_bisection_rand_path_invariance(setup):
    """The batched-randoms (pre-drawn) bisection kernels must preserve the
    exact Gaussian path measure exactly like the key-driven ones — this is
    the production hot path for W <= 512."""
    system, tables, paths0, Sigma = setup
    fn = lambda k, p: bis.bisection(system, tables, k, p, 0, ACTIVE, 2,
                                    rand=_mk_rand(k, 2, start=True))
    x = _iterate(fn, paths0, jax.random.key(204))
    _check_invariant(x, Sigma, beads=[1, NB - 1, NB, NB + 1])


def test_end_bisection_rand_path_invariance(setup):
    system, tables, paths0, Sigma = setup
    fn = lambda k, p: bis.move_head_bisection(
        system, tables, k, p, 0, ACTIVE, 2, rand=_mk_rand(k, 2))
    x = _iterate(fn, paths0, jax.random.key(205))
    _check_invariant(x, Sigma, beads=[0, 1, 2, 3])
    fn = lambda k, p: bis.move_tail_bisection(
        system, tables, k, p, 0, ACTIVE, 2, rand=_mk_rand(k, 2))
    x = _iterate(fn, paths0, jax.random.key(206))
    _check_invariant(x, Sigma, beads=[2 * NB, 2 * NB - 1, 2 * NB - 3])


def test_fused_end_bisections_rand_path_invariance(setup):
    """Composite head+tail bisection on the batched-randoms path (the
    automatic W <= 512 latency lever for fused_sweep users)."""
    system, tables, paths0, Sigma = setup

    def mk2(key):
        g = jax.random.normal(jax.random.fold_in(key, 0), (W, 2, 4, 1),
                              jnp.float64)
        u = jax.random.uniform(jax.random.fold_in(key, 1), (W, 2, 3),
                               jnp.float64)
        return (None, g, u)

    fn = lambda k, p: bis.fused_end_bisections(
        system, tables, k, p, 0, ACTIVE, 2, rand=mk2(k))[:2]
    x = _iterate(fn, paths0, jax.random.key(208))
    _check_invariant(x, Sigma, beads=[0, 2, NB, 2 * NB - 2, 2 * NB])


def test_bisection_multi_rand_path_invariance():
    cfg = _cfg(Np=3, jastrow="none")
    system = make_system(cfg)
    tables = make_tables(system)
    M = system.M
    x = np.stack([_exact_samples(M, DT, W, seed=sd) for sd in (81, 82, 83)],
                 axis=2)
    paths0 = jnp.asarray(x)[:, :, :, None]
    Sigma = np.linalg.inv(_precision_matrix(M, DT))

    def mkK(key):
        g = jax.random.normal(jax.random.fold_in(key, 0), (W, 3, 4, 1),
                              jnp.float64)
        u = jax.random.uniform(jax.random.fold_in(key, 1), (W, 3, 3),
                               jnp.float64)
        s = jax.random.uniform(jax.random.fold_in(key, 2), (), jnp.float64)
        return (s, g, u)

    def body(paths, k):
        paths, _ = bis.bisection_multi(system, tables, k, paths, [0, 1, 2],
                                       ACTIVE, 2, rand=mkK(k))
        return paths, None

    keys = jax.random.split(jax.random.key(209), NITER)
    run = jax.jit(lambda p: jax.lax.scan(body, p, keys)[0])
    x_fin = np.asarray(run(paths0))[:, :, :, 0]
    for n in range(3):
        _check_invariant(x_fin[:, :, n], Sigma, beads=[2, NB, 2 * NB - 2])
