"""Module-level runtime flags.

Parity: reference `curobo/_src/runtime.py:1-81`. CUDA-specific switches map
to their XLA analogs: CUDA graphs ~= jit (always on), NVRTC cache ~= the
XLA/Mosaic compilation cache, streams ~= XLA async scheduling. The flags
kept here are the ones that change behavior in this framework.
"""

import os

# Use the fused B-last path in solvers when the problem shape supports it.
use_blast: bool = os.environ.get("CUROBO_TPU_BLAST", "1") == "1"

# Use Pallas mega-kernels (falls back to blast when unsupported).
use_pallas: bool = os.environ.get("CUROBO_TPU_PALLAS", "1") == "1"

# Run Pallas kernels in interpreter mode (CPU debugging).
pallas_interpret: bool = os.environ.get("CUROBO_TPU_INTERPRET", "0") == "1"

# Force the Pallas solver paths even off-TPU. Tests use this (usually with
# a mocked/interpret-mode kernel) so the solver-side Pallas glue — kernel
# cache lifecycle, mark-broken fallback — executes under the CPU suite
# instead of hiding behind `default_backend() == "tpu"` guards.
pallas_force: bool = os.environ.get("CUROBO_TPU_PALLAS_FORCE", "0") == "1"


def pallas_backend_ok() -> bool:
    """True when Pallas solver kernels should be used on this backend."""
    import jax

    return pallas_force or jax.default_backend() == "tpu"

# Extra NaN checking in solvers (disables some fusion-friendly rewrites).
debug_nan: bool = os.environ.get("CUROBO_TPU_DEBUG_NAN", "0") == "1"

# Persistent XLA compilation cache directory ('' disables).
cache_dir: str = os.environ.get("CUROBO_TPU_CACHE_DIR", "")


def enable_compilation_cache(path: str = "~/.cache/curobo_tpu_xla") -> None:
    """Persistent compile cache across processes (NVRTC-cache analog)."""
    import jax

    p = os.path.expanduser(cache_dir or path)
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
