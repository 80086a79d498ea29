"""Command-line driver: `python -m pathintegralgroundstate_tpu <vpi.in>`.

Accepts the reference's namelist input files unchanged (vpi.in:1-37) plus an
optional `&tpu` namelist group / command-line overrides for the TPU-native
keys (n_walkers, dtype, mesh, ...).  Mirrors the reference's startup banner
(vpi.f90:161-194).
"""

from __future__ import annotations

import argparse
import sys

from .config import SimConfig, echo_namelists, load_namelist_config
from .driver import Driver
from .utils.cache import enable_compilation_cache


def _parse_scalar(val: str):
    for cast in (int, float):
        try:
            return cast(val)
        except ValueError:
            pass
    if val.lower() in ("true", "t"):
        return True
    if val.lower() in ("false", "f"):
        return False
    return val


def _parse_override(kv: str):
    key, val = kv.split("=", 1)
    if "," in val:  # tuple values, e.g. --set a_ho=1.0,1.0,2.0
        return key, tuple(_parse_scalar(v) for v in val.split(",") if v)
    return key, _parse_scalar(val)


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="pathintegralgroundstate_tpu",
        description="TPU-native PIGS/VPI quantum Monte Carlo")
    ap.add_argument("input", nargs="?", help="namelist input file (vpi.in format)")
    ap.add_argument("-o", "--out-dir", default=".", help="output directory")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                    help="config override (repeatable), e.g. --set n_walkers=1024")
    ap.add_argument("--blocks", type=int, default=None,
                    help="override number of blocks")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of one block into DIR")
    ap.add_argument("--burnin", type=int, default=0,
                    help="equilibration blocks discarded from global averages")
    args = ap.parse_args(argv)
    # honor JAX_PLATFORMS even when the interpreter's sitecustomize
    # re-exports its own value after the user's (observed in the managed
    # TPU image: `JAX_PLATFORMS=cpu python -m ...` silently ran on the
    # TPU).  jax.config wins over the env var as long as no backend has
    # been touched yet.  CAVEAT: on a managed image whose sitecustomize
    # OVERWRITES os.environ['JAX_PLATFORMS'] itself, re-reading it here
    # would apply the sitecustomize's value, not the user's — PIGS_PLATFORM
    # is the authoritative override for such images (nothing else writes
    # it), which is why it is consulted first.
    import os as _os
    want = _os.environ.get("PIGS_PLATFORM") or _os.environ.get(
        "JAX_PLATFORMS")
    if want:
        import jax
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass  # backend already initialized; leave as-is
    enable_compilation_cache()

    overrides = dict(_parse_override(kv) for kv in args.set)
    if args.input:
        cfg = load_namelist_config(args.input, **overrides)
    else:
        cfg = SimConfig(**overrides)

    # echo every namelist back to stdout for self-contained run provenance
    # (the reference does write(*,nml=...) after each read, vpi_mod.f90:64-75)
    echo_namelists(cfg)
    print("==============================================================")
    print("                  VPI Monte Carlo (TPU-native)                ")
    print("==============================================================")
    algo = "STAGING" if cfg.sampling == "sta" else "BISECTION"
    print(f"# Sampling algorithm  : {algo}")
    print(f"# Swap updates        : {cfg.swapping}")
    print("# Simulation parameters:")
    print(f"  > Dimensions          : {cfg.dim}")
    print(f"  > Number of particles : {cfg.Np}")
    print(f"  > Walker ensemble     : {cfg.n_walkers}")
    if cfg.trap:
        print(f"  > Trapping length     : {cfg.a_ho}")
    else:
        print(f"  > Density             : {cfg.density}")
    print(f"  > Number of beads     : {cfg.Nb}")
    print(f"  > Time step           : {cfg.dt}")
    print(f"  > Number of blocks    : {cfg.Nblock}")
    print(f"  > MC steps per block  : {cfg.Nstep}")

    init_positions = None
    if cfg.crystal:
        # reference crystal start: config_ini.in in the input file's dir
        from .config import read_crystal_file
        import os as _os
        base = _os.path.dirname(_os.path.abspath(args.input)) if args.input else "."
        cpath = _os.path.join(base, cfg.crystal_positions_file)
        Np, Lbox, density, R = read_crystal_file(cpath)
        cfg = cfg.replace(Np=Np, density=density, crystal_Lbox=Lbox)
        init_positions = R
        print(f"# crystal start from {cpath}: Np={Np}, Lbox={Lbox}")

    drv = Driver(cfg, out_dir=args.out_dir, init_positions=init_positions)
    if not cfg.trap:
        print(f"  > Size of the box     : {drv.system.geo.Lbox}")
    if args.burnin:
        drv.run_burnin(args.burnin)
    if args.profile:
        # tracing/profiling subsystem (SURVEY.md §5): one warm block under
        # jax.profiler; inspect with tensorboard or xprof tooling
        import jax
        drv.run(1)  # compile + warm
        with jax.profiler.trace(args.profile):
            drv.run(1)
        print(f"# profiler trace written to {args.profile}")
        remaining = (args.blocks - 2) if args.blocks else None
        if remaining and remaining > 0:
            drv.run(remaining)
    else:
        drv.run(args.blocks)
    return 0


if __name__ == "__main__":
    sys.exit(main())
