"""Reference checkpoint.dat round-trip (utils/compat.py)."""

import numpy as np

from pathintegralgroundstate_tpu.config import SimConfig
from pathintegralgroundstate_tpu.state import init_state
from pathintegralgroundstate_tpu.system import make_system
from pathintegralgroundstate_tpu.utils.compat import (
    read_reference_checkpoint, reference_checkpoint_to_state,
    write_reference_checkpoint)


def test_reference_checkpoint_roundtrip(tmp_path):
    cfg = SimConfig(dim=3, Np=4, Nb=2, density=0.365, n_walkers=3,
                    dtype="float64", potential="aziz2")
    system = make_system(cfg)
    state = init_state(system)
    p = str(tmp_path / "checkpoint.dat")
    write_reference_checkpoint(system, state, p, walker=1)

    raw = read_reference_checkpoint(p)
    assert raw["trap"] is False
    assert raw["isopen"] is False
    assert raw["body"].shape == (cfg.Np * cfg.M, cfg.dim)

    state2 = reference_checkpoint_to_state(system, p)
    assert state2.paths.shape == (3, cfg.M, cfg.Np, cfg.dim)
    np.testing.assert_allclose(np.asarray(state2.paths[0]),
                               np.asarray(state.paths[1]), rtol=1e-15)
    np.testing.assert_allclose(np.asarray(state2.paths[2]),
                               np.asarray(state.paths[1]), rtol=1e-15)
    np.testing.assert_allclose(np.asarray(state2.xend[0]),
                               np.asarray(state.xend[1]), rtol=1e-15)


def test_crystal_file_roundtrip(tmp_path):
    from pathintegralgroundstate_tpu.config import read_crystal_file
    p = tmp_path / "config_ini.in"
    p.write_text(" 4\n 5.0 5.0 5.0\n 0.365\n"
                 " 0.0 0.0 0.0\n 2.5 0.0 0.0\n 0.0 2.5 0.0\n 0.0 0.0 2.5\n")
    Np, Lbox, density, R = read_crystal_file(str(p))
    assert Np == 4 and Lbox == (5.0, 5.0, 5.0) and density == 0.365
    assert R.shape == (4, 3) and R[1, 0] == 2.5


def test_namelist_echo_covers_reference_keys(capsys):
    """Startup namelist echo (vpi_mod.f90:64-75): every reference namelist
    key appears in the echoed groups, in Fortran namelist-output style."""
    from pathintegralgroundstate_tpu.config import SimConfig, echo_namelists

    cfg = SimConfig(trap=True, a_ho=(1.0, 1.0, 1.0))
    echo_namelists(cfg)
    out = capsys.readouterr().out
    for grp in ("&SYSTEM", "&SAMP", "&OBDM", "&WAVEFUN", "&JASTROW",
                "&EXTPOT", "&TPU"):
        assert grp in out, grp
    for key in ("DIM", "NP", "DENSITY", "CRYSTAL", "TRAP", "RESUME", "DT",
                "NB", "SEED", "DELTA_CM", "CMFREQ", "SAMPLING", "LSTAG",
                "NLEV", "NSTAG", "NBLOCK", "NSTEP", "NBIN", "NK",
                "SWAPPING", "CWORM", "NOBDM", "NPW", "NMAX", "WF_TABLE",
                "V_TABLE", "RM", "A_HO", "N_WALKERS"):
        assert f" {key}=" in out, key
    assert out.count(" /") >= 7


def test_crystal_start_end_to_end(tmp_path):
    """The reference's crystal start (config_ini.in + crystal=T,
    vpi.f90:101-107, vpi_mod.f90:218-228) drives the CLI end to end: the
    given lattice positions seed every bead of every walker and the box
    comes from the file's Lbox line."""
    import os
    import subprocess
    import sys

    import numpy as np

    Np, L = 4, 3.0
    R = (np.stack(np.meshgrid([0.25, 0.75], [0.25, 0.75]), -1)
         .reshape(-1, 2) - 0.5) * L
    lines = [f"{Np}", f"{L} {L}", "0.444"]
    lines += [f"{x} {y}" for x, y in R]
    (tmp_path / "config_ini.in").write_text("\n".join(lines) + "\n")
    (tmp_path / "run.in").write_text("""
&system
 dim = 2, Np = 4, crystal = T, trap = F /
&samp
 dt = 1.d-2, Nb = 4, sampling = 'sta', Lstag = 4, Nstag = 1, CMFreq = 1,
 delta_cm = 0.1d0, Nblock = 1, Nstep = 2, Nbin = 10, Nk = 5 /
&obdm
 swapping = F, CWorm = 0.d0, Nobdm = 0, Npw = 0 /
&wavefun
 Nmax = 500, wf_table = F, v_table = F /
&jastrow
 Rm = 1.0d0 /
&tpu
 n_walkers = 4, dtype = 'float64', potential = 'soft' /
""")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "pathintegralgroundstate_tpu",
         str(tmp_path / "run.in"), "-o", str(tmp_path / "out")],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, (out.stdout[-600:], out.stderr[-600:])
    assert "crystal start" in out.stdout
    z = np.load(str(tmp_path / "out" / "checkpoint.npz"))
    # paths evolved FROM the lattice: the box is the file's, shapes match
    assert z["paths"].shape == (4, 9, 4, 2)
    assert np.all(np.abs(z["paths"]) <= L / 2 + 1e-9)


def test_drift_z_statistic():
    """Equilibration monitor (VERDICT r4 task 7): the first-vs-second-half
    drift statistic flags a relaxing series and passes a stationary one."""
    import numpy as np

    from pathintegralgroundstate_tpu.driver import drift_z

    rng = np.random.default_rng(0)
    drifting = np.exp(-np.arange(24) / 6.0) + 0.01 * rng.normal(size=24)
    stationary = 0.5 + 0.05 * rng.normal(size=24)
    assert abs(drift_z(drifting)) > 3.0
    assert abs(drift_z(stationary)) < 3.0
    assert drift_z(stationary[:4]) == 0.0  # too few blocks -> silent


def test_driver_burnin_warning(tmp_path, capsys):
    """An under-burned dense He-4 run must trigger the non-stationarity
    warning; the same run after proper burn-in must not."""
    import json

    from pathintegralgroundstate_tpu.config import SimConfig
    from pathintegralgroundstate_tpu.driver import Driver

    cfg = SimConfig(dim=3, Np=6, density=0.365, dt=5e-3, Nb=2,
                    sampling="sta", Lstag=2, Nstag=2, CMFreq=1,
                    delta_cm=0.12, Rm=1.2, n_walkers=64, dtype="float64",
                    potential="aziz2", jastrow="mcmillan_c1", seed=9,
                    Nstep=5, Nblock=16)
    # under-burned: fresh uniform placement relaxes through the first blocks
    drv = Driver(cfg, out_dir=str(tmp_path / "cold"), verbose=True)
    drv.run()
    out = capsys.readouterr().out
    assert "non-stationary" in out, "under-burned run did not warn"
    zs = [json.loads(ln)["drift_zE"]
          for ln in open(str(tmp_path / "cold" / "metrics.jsonl"))]
    assert max(abs(z) for z in zs) > 3.0

    # burned-in: same chain continued after discarding the relaxation
    drv2 = Driver(cfg, out_dir=str(tmp_path / "warm"), verbose=True)
    drv2.run_burnin(20)
    capsys.readouterr()
    drv2.run()
    out2 = capsys.readouterr().out
    assert "non-stationary" not in out2, "converged run warned spuriously"
