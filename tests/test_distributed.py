"""Multi-host (multi-process) execution tests.

Spawns a REAL 2-process jax.distributed CPU cluster (2 local devices per
process -> 4 global devices), runs the read-sharded EM while_loop over the
global mesh, and checks both processes converge to the single-process
result. This is the N>=2-hosts requirement of BASELINE.md exercised the
only way it can be without TPU pod hardware (SURVEY §2.6 distributed rows;
reference equivalent: none — RSEM is single-node pthreads, EM.cpp:373-389).
"""

import os
import socket
import subprocess
import sys
import tempfile
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np

    # the ambient sitecustomize imports jax before this script runs, so the
    # platform must be forced via config, not env
    import jax
    jax.config.update("jax_platforms", "cpu")

    from rsem_tpu.parallel.distributed import maybe_initialize, is_distributed
    assert maybe_initialize(), "distributed bring-up failed"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    from rsem_tpu.parallel.fast_sharded import (
        build_fast_data_sharded, place_fast_sharded, run_fast_em_loop_sharded)
    from rsem_tpu.parallel.mesh import make_mesh
    from rsem_tpu.testing import synthetic_arrays_fast

    # identical deterministic problem on both processes
    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=3000, M=200, read_len=50, tx_len=500,
        paired=False, has_qual=True, mean_extra_hits=1.5, seed=3)
    rng = np.random.default_rng(7)
    lcp = rng.normal(-20, 3, bundle.hits.n_hits)
    lnp = rng.normal(-25, 3, bundle.hits.n_reads)

    mesh = make_mesh()
    sd = place_fast_sharded(
        mesh,
        build_fast_data_sharded(bundle.hits, lcp, lnp, ref.M, 5.0, 4))
    import jax.numpy as jnp
    theta0 = jnp.full((ref.M + 1,), 1.0 / (ref.M + 1), dtype=jnp.float32)
    theta, counts, rounds = run_fast_em_loop_sharded(theta0, sd, mesh)
    out = np.asarray(jax.device_get(theta))
    np.save(sys.argv[1], out)
    print("rounds", int(jax.device_get(rounds)))
""")


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    port = _free_port()
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)

    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"theta_{pid}.npy"
        outs.append(out)
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            RSEM_TPU_COORDINATOR=f"localhost:{port}",
            RSEM_TPU_NUM_PROCESSES="2",
            RSEM_TPU_PROCESS_ID=str(pid),
            RSEM_TPU_XLA_CACHE="off",
            PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        assert p.returncode == 0, stdout.decode()[-4000:]

    # single-process expected value on the same problem
    from rsem_tpu.ops.fast_estep import build_fast_data, run_fast_em_loop
    from rsem_tpu.testing import synthetic_arrays_fast
    import jax
    import jax.numpy as jnp

    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=3000, M=200, read_len=50, tx_len=500,
        paired=False, has_qual=True, mean_extra_hits=1.5, seed=3)
    rng = np.random.default_rng(7)
    lcp = rng.normal(-20, 3, bundle.hits.n_hits)
    lnp = rng.normal(-25, 3, bundle.hits.n_reads)
    fdata = build_fast_data(bundle.hits, lcp, lnp, ref.M, 5.0)
    theta0 = jnp.full((ref.M + 1,), 1.0 / (ref.M + 1), dtype=jnp.float32)
    theta, _, _, _ = jax.jit(lambda t: run_fast_em_loop(t, fdata))(theta0)
    expected = np.asarray(jax.device_get(theta))

    for out in outs:
        got = np.load(out)
        np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-3)
    np.testing.assert_array_equal(np.load(outs[0]), np.load(outs[1]))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_process_read_bounds():
    from rsem_tpu.parallel.distributed import process_read_bounds

    cuts = process_read_bounds(100, n_processes=3)
    assert cuts[0] == 0 and cuts[-1] == 100 and len(cuts) == 4

    offs = np.array([0, 1, 2, 3, 103, 104, 105, 106], dtype=np.int64)
    cuts = process_read_bounds(offs, n_processes=2)
    assert cuts[0] == 0 and cuts[-1] == 7
    # hit-balanced: the indivisible heavy read (100 hits) lands alone-ish
    # on one side; the cut cannot do better than putting it whole
    h = np.diff(offs[cuts])
    assert abs(int(h[0]) - int(h[1])) <= 100
    assert h.min() >= 3
