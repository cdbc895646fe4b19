"""Central JAX runtime configuration.

Performance rules learned the hard way (VERDICT r2 measured ~210s of
harness overhead around a 1.29s EM):

* NO global x64. TPUs emulate float64, and `jax_enable_x64` also widens
  weakly-typed integers to i64, poisoning the index math of every kernel
  (the conprb pass slowed >10x under it). The few accumulators that need
  more than f32 precision use double-float pairs (ops/ddsum) instead.
  ``ensure_x64`` remains only for explicitly opted-in host tooling.

* ``ensure_compilation_cache()`` — cold XLA compiles cost tens of
  seconds; the persistent cache makes every run after the first hit disk
  instead of the compiler. Cache dir: $RSEM_TPU_XLA_CACHE (default
  ~/.cache/rsem_tpu/xla; "off" disables).

* Transfers: never move float64 across the link — fetch f32 with
  ``jax.device_get`` and widen on host (measured 0.46s vs 54.8s for a
  10MB array on the same link). ``fetch64`` wraps that rule.

* Timing: on remote-execution platforms (axon) ``block_until_ready``
  returns at dispatch, not completion — ``sync()`` forces real execution
  by fetching a scalar.

``configure()`` is idempotent and called by engine entry points.
"""

from __future__ import annotations

import os

import numpy as np

_done = {"x64": False, "cache": False}


def ensure_x64() -> None:
    """Explicit opt-in only (host-side tooling); the engine never calls
    this — see module docstring."""
    if _done["x64"]:
        return
    import jax

    jax.config.update("jax_enable_x64", True)
    _done["x64"] = True


def ensure_compilation_cache() -> None:
    if _done["cache"]:
        return
    import jax

    cache_dir = os.environ.get(
        "RSEM_TPU_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "rsem_tpu", "xla"),
    )
    if cache_dir and cache_dir.lower() != "off":
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass  # cache is an optimization; never fail the run for it
    _done["cache"] = True


def configure() -> None:
    ensure_compilation_cache()


def fetch64(x) -> np.ndarray:
    """Device array -> host float64, via the fast f32 transfer path."""
    import jax

    return np.asarray(jax.device_get(x)).astype(np.float64, copy=False)


def fetch(x) -> np.ndarray:
    """Device array -> host, native dtype (no on-link conversion)."""
    import jax

    return np.asarray(jax.device_get(x))


def sync(*arrays) -> None:
    """Force completion of the computations producing `arrays`.

    jax.block_until_ready only waits for dispatch on remote-execution
    platforms (axon tunnel); fetching a scalar element round-trips the
    data dependency, so returning implies the whole computation ran.
    Use this (not block_until_ready) around timed sections.
    """
    import jax

    for a in jax.tree.leaves(arrays):
        if hasattr(a, "addressable_shards"):
            np.asarray(jax.device_get(a.reshape(-1)[:1]))
