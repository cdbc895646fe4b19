"""Multi-host (multi-process) execution entry.

The reference is single-node pthreads only (SURVEY §2.6); the BASELINE
requires efficiency at N >= 2 hosts. TPU-native design: every process
joins a jax.distributed cluster, `make_mesh` then spans the GLOBAL device
set, reads are data-parallel sharded across it (parallel/fast_sharded),
and the per-round [M+1] count psum rides ICI within a host and DCN across
hosts — the tiny payload (80KB at M=20k) makes DCN latency irrelevant at
EM round granularity.

Bring-up is env-triggered so single-host users never pay for it:

  RSEM_TPU_COORDINATOR=host:port   coordinator address (process 0's host)
  RSEM_TPU_NUM_PROCESSES=N
  RSEM_TPU_PROCESS_ID=i
or
  RSEM_TPU_AUTO_DISTRIBUTED=1      TPU-pod auto-detection
                                   (jax.distributed.initialize() no-args)

Call `maybe_initialize()` before any other JAX API touches the backend.
The pipeline driver (pipeline/calculate_expression.py) calls it at entry.
tests/test_distributed.py exercises a real 2-process CPU cluster.
"""

from __future__ import annotations

import os
from typing import Optional


_initialized = False


def is_distributed() -> bool:
    import jax

    return jax.process_count() > 1


def maybe_initialize() -> bool:
    """Join a jax.distributed cluster if the environment asks for one.

    Returns True when running multi-process after the call. Idempotent;
    must run before the first backend touch (jax.devices()).
    """
    global _initialized
    if _initialized:
        return is_distributed()

    coord = os.environ.get("RSEM_TPU_COORDINATOR")
    auto = os.environ.get("RSEM_TPU_AUTO_DISTRIBUTED") == "1"
    if not coord and not auto:
        _initialized = True
        return False

    import jax

    # multi-process CPU backends need cross-host collectives explicitly
    # (gloo); harmless on TPU where the platform filter skips it
    platforms = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in str(platforms):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass

    if coord:
        num = int(os.environ["RSEM_TPU_NUM_PROCESSES"])
        pid = int(os.environ["RSEM_TPU_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=num, process_id=pid
        )
    else:
        jax.distributed.initialize()
    _initialized = True
    return is_distributed()


def process_read_bounds(n_reads_or_offsets, n_processes: Optional[int] = None,
                        hit_balanced: bool = True):
    """Which contiguous read range each PROCESS should parse/own.

    Multi-host ingestion contract: every host parses only its slice of the
    input (by read index; callers translate to BAM virtual offsets), so no
    host ever materializes the full dataset. With plain `n_reads` the split
    is uniform; with the full read_offsets vector it is hit-balanced like
    the reference's thread partition (EM.cpp:135-157)."""
    import numpy as np

    import jax

    np_ = n_processes or jax.process_count()
    if np.ndim(n_reads_or_offsets) == 0:
        n = int(n_reads_or_offsets)
        cuts = (np.arange(np_ + 1) * n) // np_
        return cuts.astype(np.int64)
    from .fast_sharded import partition_reads_by_hits

    if not hit_balanced:
        n = len(n_reads_or_offsets) - 1
        return ((np.arange(np_ + 1) * n) // np_).astype(np.int64)
    return partition_reads_by_hits(n_reads_or_offsets, np_)
