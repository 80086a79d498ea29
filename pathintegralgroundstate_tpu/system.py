"""System bundle: config + derived geometry + model selection.

A frozen (hashable) object closed over by every jit-compiled kernel, playing
the role of the reference's global state module (global_mod.f90:5-13) and
model module (system_mod.f90) — but immutable and explicit instead of
mutable COMMON-style globals.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from .config import Geometry, SimConfig, geometry
from .models.potentials import Potential, get_potential
from .utils.interpolate import build_table
from .models import jastrow as jas


class Tables(NamedTuple):
    """Optional lookup tables (parity mode; vpi_mod.f90:84-145).

    logwf: [Nmax+2] tabulated log-Jastrow (JastrowTable equivalent)
    vtab:  [Nmax+2] tabulated potential (PotentialTable equivalent)
    Either may be None (closed-form fast path).
    """
    logwf: Optional[jnp.ndarray]
    vtab: Optional[jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class System:
    cfg: SimConfig
    geo: Geometry
    # device mesh carrying a 'tp' axis when cfg.mesh_pairs > 1: the pair
    # kernels annotate their partner-axis intermediates with
    # with_sharding_constraint so GSPMD partitions the O(N) partner loops /
    # O(N^2) pair sums across 'tp' and inserts the psum collectives
    # (SURVEY.md §2.3 TP row; ops/pairwise._tp_constrain).  None = no TP.
    tp_mesh: object = None

    @property
    def dtype(self):
        return jnp.dtype(self.cfg.dtype)

    @property
    def M(self) -> int:
        return self.cfg.M

    @property
    def potential(self) -> Potential:
        return get_potential(self.cfg.potential)

    @property
    def pbc(self) -> bool:
        return not self.cfg.trap

    def u(self, r):
        """Two-body log-Jastrow u(r).  cfg.jastrow selects the family:

        'mcmillan'    — the reference's bare form (system_mod.f90:44-46).
                        NOTE: with the rcut truncation every pair kernel
                        applies (vpi_mod.f90:2619-2645), psi_T has a jump
                        in u and u' at rcut whose delta-shell Laplacian
                        terms the LocalEnergy estimator omits (the
                        reference omits them too, sample_mod.f90:154-319)
                        — a tau-independent ~-0.5 K/atom bias of the MIXED
                        estimator on the He-4 flagship (docs/VALIDATION.md).
        'mcmillan_c1' — C1-matched truncation: u - u(rc) - u'(rc)(r - rc),
                        so u and u' vanish continuously at rcut and the
                        mixed estimator is unbiased.  Same ground state
                        (PIGS projects any trial), cleaner estimator.
        'dipolar2d'   — zero-energy 1/r^3 two-body solution
                        u = -2 sqrt(Rm/r), C1-matched at rcut under PBC
                        (models/jastrow.dipolar_u; the right family for
                        the dipolar stretch config — McMillan leaves the
                        mixed estimator unbounded for a 1/r^3 core).
        'none'        — u == 0 (ideal Bose gas; the analytic-limit switch
                        the reference keeps in comments, system_mod.f90:63).
        """
        if self.cfg.jastrow == "none":
            return jnp.zeros_like(r)
        if self.cfg.jastrow == "dipolar2d":
            u = jas.dipolar_u(self.cfg.Rm, r)
            if self.pbc:
                rc = self.geo.rcut
                u = u - jas.dipolar_u(self.cfg.Rm, rc) \
                    - jas.dipolar_du(self.cfg.Rm, rc) * (r - rc)
            return u
        u = jas.mcmillan_u(self.cfg.Rm, r)
        if self.cfg.jastrow == "mcmillan_c1" and self.pbc:
            rc = self.geo.rcut
            u = u - jas.mcmillan_u(self.cfg.Rm, rc) \
                - jas.mcmillan_du(self.cfg.Rm, rc) * (r - rc)
        return u

    def du(self, r):
        if self.cfg.jastrow == "none":
            return jnp.zeros_like(r)
        if self.cfg.jastrow == "dipolar2d":
            du = jas.dipolar_du(self.cfg.Rm, r)
            if self.pbc:
                du = du - jas.dipolar_du(self.cfg.Rm, self.geo.rcut)
            return du
        du = jas.mcmillan_du(self.cfg.Rm, r)
        if self.cfg.jastrow == "mcmillan_c1" and self.pbc:
            du = du - jas.mcmillan_du(self.cfg.Rm, self.geo.rcut)
        return du

    def d2u(self, r):
        if self.cfg.jastrow == "none":
            return jnp.zeros_like(r)
        if self.cfg.jastrow == "dipolar2d":
            return jas.dipolar_d2u(self.cfg.Rm, r)
        return jas.mcmillan_d2u(self.cfg.Rm, r)


def make_system(cfg: SimConfig, tp_mesh=None) -> System:
    return System(cfg=cfg, geo=geometry(cfg), tp_mesh=tp_mesh)


def make_tables(system: System, dtype=None) -> Tables:
    """Build the optional Jastrow / potential tables on the reference grid.

    Mirrors JastrowTable (vpi_mod.f90:84-112) and PotentialTable
    (vpi_mod.f90:116-145): Nmax points on [0, rcut], ghost cells at both ends.
    """
    cfg, geo = system.cfg, system.geo
    dtype = dtype or system.dtype
    logwf = vtab = None
    if cfg.wf_table:
        logwf, _ = build_table(lambda r: system.u(r), geo.rcut, cfg.Nmax, dtype)
    if cfg.v_table:
        vtab, _ = build_table(system.potential.v, geo.rcut, cfg.Nmax, dtype)
    return Tables(logwf=logwf, vtab=vtab)
