"""TPU-native Path Integral Ground State (PIGS/VPI) engine.

A brand-new JAX/XLA framework with the full capabilities of the reference
Fortran PIGS code (amaciarey/PathIntegralGroundState, see SURVEY.md): the
4th-order Chin short-time action, McMillan-Jastrow trial wave functions,
Aziz He-He / soft-sphere / dipolar pair potentials, harmonic traps,
staging / bisection / center-of-mass Monte Carlo updates, the worm algorithm
(open/close/swap) for OBDM and permutation-cycle sampling, and the full
estimator suite (mixed + thermodynamic energy, g(r), S(k), OBDM) with block
statistics and checkpoint/resume.

Unlike the serial single-walker reference, this engine propagates a batched
ensemble of W independent walker worldlines `paths[W, M, N, D]`
(M = 2*Nb + 1 imaginary-time beads, N particles, D spatial dims), expresses
every Monte Carlo move as a masked, vectorized kernel, keeps the action
differentiable for smart-MC / variational optimization, and shards the walker
axis across TPU meshes with collective estimator reductions.
"""

__version__ = "0.1.0"

from .config import SimConfig, Geometry, geometry, load_namelist_config

__all__ = [
    "SimConfig",
    "Geometry",
    "geometry",
    "load_namelist_config",
]
