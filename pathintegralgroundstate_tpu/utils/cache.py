"""Persistent XLA compilation cache setup.

The flagship block program (a jit-compiled scan of full MC sweeps — moves,
worm updates, estimators) is large; first compilation can take minutes on a
remote TPU.  The reference has no analogue (a Fortran binary is its own
compile cache).  Enabling JAX's persistent compilation cache makes every
subsequent process start (CLI runs, bench.py, resumed simulations) reuse the
compiled executable as long as shapes/config are unchanged.
"""

from __future__ import annotations

import os


def _default_cache_dir() -> str:
    """Prefer a repo-local cache in a source checkout (three dirname hops up
    from this file); fall back to ~/.cache/pigs_tpu/jax_cache when the
    package is installed into a (possibly read-only) site-packages tree."""
    checkout = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    if os.access(checkout, os.W_OK) and "site-packages" not in checkout:
        return os.path.join(checkout, ".jax_cache")
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "pigs_tpu", "jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Idempotently point JAX at an on-disk compilation cache."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("PIGS_TPU_CACHE", _default_cache_dir())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything, however small/fast to compile
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # older jax or read-only fs: run uncached
        import warnings
        warnings.warn(f"persistent compilation cache disabled: {e!r}")
