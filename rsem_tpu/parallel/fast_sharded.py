"""Read-sharded theta-only EM loop over a device mesh.

The reference parallelizes exactly this loop — the cached-conprb E-step
rounds that dominate EM wall clock — with pthreads over read shards and a
serial reduction (EM.cpp:135-157,373-398). TPU-native equivalent: the
bucketed dense hit tiles (ops/fast_estep) are built per read shard with
identical shapes on every device, the whole lax.while_loop runs inside one
shard_map, and each round psums the [M+1] partial counts + noise mass so
theta and the convergence decision stay replicated.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..constants import MAX_ROUND, MIN_ROUND
from ..ops.fast_estep import (
    BLOCK,
    RSLICE,
    FastEStepData,
    _bucket_sizes,
    build_fast_data,
    fast_final_fracs,
    natural_rows,
    run_fast_em_loop,
)


class _HitsView(NamedTuple):
    """The slice of HitArrays one read shard sees (offsets rebased)."""

    n_hits: int
    n_reads: int
    sid: np.ndarray
    read_offsets: np.ndarray


class FastShardLeaves(NamedTuple):
    """Device arrays of the per-shard fast E-step data, stacked [D, ...].
    The bucket tiles stay per-bucket tuples (ragged K); the sid-sorted hit
    chunks are single [D, C, L] arrays (fast_estep stacks chunks)."""

    sid_b: Tuple[jnp.ndarray, ...]
    cps_b: Tuple[jnp.ndarray, ...]
    ncs_b: Tuple[jnp.ndarray, ...]
    cps_c: jnp.ndarray
    rloc_c: jnp.ndarray
    sid_starts_c: jnp.ndarray


class ShardedFastData:
    """Host container: stacked device leaves + static config + the per-shard
    restore info needed for the final posterior-weight pass."""

    def __init__(self, leaves: FastShardLeaves, M: int, n0: float,
                 bounds: np.ndarray, hit_bounds: np.ndarray,
                 restore: List[Tuple[np.ndarray, tuple]], n_chunks: int):
        self.leaves = leaves
        self.M = M
        self.n0 = n0
        self.bounds = bounds  # [D+1] read partition
        self.hit_bounds = hit_bounds  # [D+1] hit partition
        self.restore = restore  # per shard (restore_hit, restore_read_b)
        self.n_chunks = n_chunks

    @property
    def n_shards(self) -> int:
        return len(self.bounds) - 1


def partition_reads_by_hits(offsets: np.ndarray, n_shards: int) -> np.ndarray:
    """Contiguous read partition balanced by cumulative hit count — the
    reference's thread partitioning strategy (EM.cpp:135-157)."""
    n_reads = len(offsets) - 1
    total = int(offsets[-1])
    targets = (np.arange(1, n_shards) * total) // n_shards
    cuts = np.searchsorted(offsets[1:], targets, side="left") + 1
    cuts = np.minimum(cuts, n_reads)
    return np.concatenate([[0], cuts, [n_reads]]).astype(np.int64)


def build_fast_data_chunks(
    hits, log_conprb: np.ndarray, log_ncp: np.ndarray, M: int, n0: float,
    n_shards: int,
) -> Tuple[List[FastEStepData], np.ndarray, np.ndarray]:
    """Identically-shaped per-read-shard fast layouts with NUMPY leaves —
    the unit of both the shard_map path (stacked across devices) and the
    streamed bounded-HBM loop (fast_estep.run_fast_em_loop_streamed).
    Returns (chunks, read bounds, hit bounds)."""
    offs = hits.read_offsets.astype(np.int64)
    bounds = partition_reads_by_hits(offs, n_shards)
    hit_bounds = offs[bounds]
    nh = np.diff(offs)

    # identical bucket layout on every shard: global widths, per-bucket rows
    # = max natural rows over shards
    sizes = _bucket_sizes(int(nh.max()) if len(nh) else 1)
    forced = None
    for d in range(n_shards):
        r = natural_rows(nh[bounds[d]:bounds[d + 1]], sizes)
        forced = r if forced is None else [max(a, b) for a, b in zip(forced, r)]

    shards: List[FastEStepData] = []
    for d in range(n_shards):
        lo, hi = bounds[d], bounds[d + 1]
        hlo, hhi = hit_bounds[d], hit_bounds[d + 1]
        view = _HitsView(
            n_hits=int(hhi - hlo),
            n_reads=int(hi - lo),
            sid=hits.sid[hlo:hhi],
            read_offsets=(offs[lo:hi + 1] - hlo),
        )
        shards.append(
            build_fast_data(view, log_conprb[hlo:hhi], log_ncp[lo:hi], M,
                            n0, sizes=sizes, forced_rows=forced,
                            device_put=False)
        )
    # common chunk length across shards: ONE jit signature for the
    # streamed loop, no-op pad for the stacked shard_map path (padding is
    # cps 0 / rloc 0, past every real segment boundary)
    L = max(s.cps_c.shape[1] for s in shards)
    shards = [
        s._replace(
            cps_c=np.pad(s.cps_c, ((0, 0), (0, L - s.cps_c.shape[1]))),
            rloc_c=np.pad(s.rloc_c, ((0, 0), (0, L - s.rloc_c.shape[1]))),
        ) if s.cps_c.shape[1] != L else s
        for s in shards
    ]
    return shards, bounds, hit_bounds


def build_fast_data_sharded(
    hits, log_conprb: np.ndarray, log_ncp: np.ndarray, M: int, n0: float,
    n_shards: int,
) -> ShardedFastData:
    shards, bounds, hit_bounds = build_fast_data_chunks(
        hits, log_conprb, log_ncp, M, n0, n_shards
    )

    # identical rows per bucket across shards => identical chunk count;
    # pad the per-shard chunk stacks to a common L before stacking
    # (padding is cps 0 / rloc 0, which lands in no real segment)
    L = max(s.cps_c.shape[1] for s in shards)
    assert len({s.cps_c.shape[0] for s in shards}) == 1

    def padL(x: np.ndarray) -> np.ndarray:
        if x.shape[1] == L:
            return x
        return np.pad(x, ((0, 0), (0, L - x.shape[1])))

    def stack_tiles(field: str) -> Tuple[jnp.ndarray, ...]:
        tuples = [getattr(s, field) for s in shards]
        return tuple(
            jnp.stack([t[i] for t in tuples]) for i in range(len(tuples[0]))
        )

    leaves = FastShardLeaves(
        sid_b=stack_tiles("sid_b"), cps_b=stack_tiles("cps_b"),
        ncs_b=stack_tiles("ncs_b"),
        cps_c=jnp.stack([padL(s.cps_c) for s in shards]),
        rloc_c=jnp.stack([padL(s.rloc_c) for s in shards]),
        sid_starts_c=jnp.stack([s.sid_starts_c for s in shards]),
    )
    restore = [(s.restore_hit, s.restore_read_b) for s in shards]
    return ShardedFastData(leaves, M, float(n0), bounds, hit_bounds, restore,
                           n_chunks=int(shards[0].cps_c.shape[0]))


def _local_data(leaves: FastShardLeaves, M: int, n0: float,
                n_chunks: int) -> FastEStepData:
    """Reassemble a FastEStepData view inside the shard_map body (leading
    device axis of size 1 squeezed away)."""
    sq = lambda tt: tuple(x[0] for x in tt)
    return FastEStepData(
        sid_b=sq(leaves.sid_b), cps_b=sq(leaves.cps_b), ncs_b=sq(leaves.ncs_b),
        cps_c=leaves.cps_c[0], rloc_c=leaves.rloc_c[0],
        sid_starts_c=leaves.sid_starts_c[0],
        rows_pad=n_chunks * RSLICE, restore_hit=None, restore_read_b=(),
        n_reads=0, M=M, n0=n0,
    )


def place_fast_sharded(mesh: Mesh, sd: ShardedFastData) -> ShardedFastData:
    """Shard the stacked leaves over the mesh's 'dp' axis."""
    put = lambda x: jax.device_put(
        x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
    )
    sd.leaves = jax.tree.map(put, sd.leaves)
    return sd


def run_fast_em_loop_sharded(
    theta0: jnp.ndarray,
    sd: ShardedFastData,
    mesh: Mesh,
    min_round: int = MIN_ROUND,
    max_round: int = MAX_ROUND,
    start_round: int = 0,
    segment: int = 64,
):
    """The on-device EM while_loop, read-sharded over the mesh, dispatched
    in SEG-bounded segments (r5: a single dispatch spanning hundreds of
    rounds trips the remote TPU worker's watchdog at scale — same fix the
    single-device path got in r4). Returns (theta, counts, rounds) —
    replicated."""

    def local(theta0, start_round, min_r, max_r, leaves):
        data = _local_data(leaves, sd.M, sd.n0, sd.n_chunks)
        return run_fast_em_loop(
            theta0, data, min_round=min_r, max_round=max_r,
            start_round=start_round, axis_name="dp",
        )

    specs_data = jax.tree.map(lambda _: P("dp"), sd.leaves)
    fn = jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P(), P(), specs_data),
        out_specs=(P(), P(), P(), P()), check_vma=False,
    ))
    theta = theta0
    counts = jnp.zeros_like(theta0)
    r, tot = start_round, 1
    while r < min_round or (tot > 0 and r < max_round):
        target = min(r + segment, max_round)
        theta, counts, rr, td = fn(
            theta, jnp.asarray(r, jnp.int32),
            jnp.asarray(min(min_round, target), jnp.int32),
            jnp.asarray(target, jnp.int32), sd.leaves,
        )
        r, tot = int(rr), int(td)
    return theta, counts, r


def fast_final_fracs_sharded(theta: jnp.ndarray, sd: ShardedFastData):
    """Final posterior responsibilities (EM.cpp:460-478) from the sharded
    layout, merged to the ORIGINAL global hit/read order on host. One pass,
    executed shard-by-shard (theta is replicated)."""
    H = int(sd.hit_bounds[-1])
    N = int(sd.bounds[-1])
    frac = np.empty(H, dtype=np.float64)
    frac_noise = np.empty(N, dtype=np.float64)
    for d in range(sd.n_shards):
        restore_hit, restore_read_b = sd.restore[d]
        data = FastEStepData(
            sid_b=tuple(t[d] for t in sd.leaves.sid_b),
            cps_b=tuple(t[d] for t in sd.leaves.cps_b),
            ncs_b=tuple(t[d] for t in sd.leaves.ncs_b),
            cps_c=sd.leaves.cps_c[d],
            rloc_c=sd.leaves.rloc_c[d],
            sid_starts_c=sd.leaves.sid_starts_c[d],
            rows_pad=sd.n_chunks * RSLICE, restore_hit=restore_hit,
            restore_read_b=restore_read_b,
            n_reads=int(sd.bounds[d + 1] - sd.bounds[d]), M=sd.M, n0=sd.n0,
        )
        # data as ARGUMENT: a closure would serialize the layout into the
        # remote compile request (HTTP 413 at scale, r4)
        f, fn_ = jax.jit(fast_final_fracs)(theta, data)
        frac[sd.hit_bounds[d]:sd.hit_bounds[d + 1]] = np.asarray(
            f, dtype=np.float64)[: data.restore_hit.shape[0]]
        frac_noise[sd.bounds[d]:sd.bounds[d + 1]] = np.asarray(
            fn_, dtype=np.float64)[: data.n_reads]
    return frac, frac_noise
