"""Reference-format I/O: migrate to/from the Fortran code's files.

The reference checkpoints to a text `checkpoint.dat` (CheckPoint,
vpi_mod.f90:263-309): trap/isopen flags, the worm particle index, the full
worldline Path(dim, Np, 0:2*Nb) (particle-major, bead-minor), and the two
worm ends.  These readers/writers let a reference user resume their run in
this engine (the single configuration seeds every walker of the ensemble)
and export any walker back into a file the reference can resume from.
"""

from __future__ import annotations

import numpy as np

from ..config import SimConfig
from ..state import MCState
from ..system import System


def _parse_logical(tok: str) -> bool:
    return tok.strip().lower() in (".true.", "t", "true")


def read_reference_checkpoint(path: str):
    """Parse a reference checkpoint.dat.

    Returns dict(trap, isopen, iworm, path[M, N, D], xend[2, D]).
    The file stores Path particle-major ((ip, ib) loops, vpi_mod.f90:289-295)
    with 1-based iworm.
    """
    with open(path) as f:
        tokens = f.read().split("\n")
    lines = [ln for ln in tokens if ln.strip()]
    trap = _parse_logical(lines[0])
    isopen = _parse_logical(lines[1])
    iworm = int(lines[2]) - 1  # Fortran 1-based -> 0-based
    rows = [np.fromstring(ln, sep=" ") for ln in lines[3:]]
    rows = [r for r in rows if r.size]
    dim = rows[0].size
    xend = np.stack(rows[-2:])                      # last two rows
    body = np.stack(rows[:-2])                      # [Np*(2Nb+1), dim]
    # infer Np, M from the row count is ambiguous; caller supplies shapes
    return dict(trap=trap, isopen=isopen, iworm=max(iworm, 0),
                body=body, xend=xend, dim=dim)


def reference_checkpoint_to_state(system: System, path: str,
                                  key=None) -> MCState:
    """Seed a full walker ensemble from a reference checkpoint.dat.

    Every walker starts from the reference's configuration (they decorrelate
    over the first blocks, exactly like the reference's own resume).
    """
    import jax
    import jax.numpy as jnp

    cfg = system.cfg
    raw = read_reference_checkpoint(path)
    M, N, D, W = cfg.M, cfg.Np, cfg.dim, cfg.n_walkers
    if raw["body"].shape != (N * M, D):
        raise ValueError(
            f"checkpoint shape {raw['body'].shape} does not match "
            f"Np={N}, M={M}, dim={D}")
    # particle-major -> [N, M, D] -> beads-major [M, N, D]
    path_arr = raw["body"].reshape(N, M, D).transpose(1, 0, 2)
    dtype = system.dtype
    paths = jnp.broadcast_to(jnp.asarray(path_arr, dtype), (W, M, N, D))
    xend = jnp.broadcast_to(jnp.asarray(raw["xend"], dtype), (W, 2, D))
    if key is None:
        key = jax.random.key(cfg.seed)
    return MCState(
        paths=jnp.array(paths), xend=jnp.array(xend),
        isopen=jnp.full((W,), raw["isopen"], bool),
        iworm=jnp.full((W,), raw["iworm"], jnp.int32),
        key=key,
        in_cycle=jnp.zeros((W, N), bool),
        iperm=jnp.ones((W,), jnp.int32),
        step=jnp.zeros((), jnp.int32),
    )


def write_reference_checkpoint(system: System, state: MCState, path: str,
                               walker: int = 0):
    """Export one walker in the reference's checkpoint.dat format, so the
    Fortran code can resume from it (CheckPoint layout,
    vpi_mod.f90:273-304)."""
    cfg = system.cfg
    p = np.asarray(state.paths[walker])             # [M, N, D]
    xend = np.asarray(state.xend[walker])
    isopen = bool(np.asarray(state.isopen[walker]))
    iworm = int(np.asarray(state.iworm[walker])) + 1
    with open(path, "w") as f:
        f.write(" .True.\n" if cfg.trap else " .False.\n")
        f.write(" .True.\n" if isopen else " .False.\n")
        f.write(f" {iworm}\n")
        for ip in range(cfg.Np):
            for ib in range(cfg.M):
                f.write(" " + " ".join(f"{x: .17E}" for x in p[ib, ip]) + "\n")
        f.write("\n\n")
        for j in range(2):
            f.write(" " + " ".join(f"{x: .17E}" for x in xend[j]) + "\n")
