"""Break the conprb pass into components on the real TPU (sync-timed)."""
import time
from functools import partial

import numpy as np

def main():
    import jax, jax.numpy as jnp
    from rsem_tpu.utils.jaxinit import configure, sync
    configure()
    print("device:", jax.devices()[0], flush=True)
    from rsem_tpu.ops import (HitsDevice, KernelConfig, ReadsDevice, RefDevice,
                              compute_log_conprb)
    from rsem_tpu.ops.conprb import CHUNK, map_hit_chunks, profile_indices
    from rsem_tpu.testing import synthetic_arrays_fast

    ref, bundle, spec, model = synthetic_arrays_fast(
        n_reads=1_000_000, M=20_000, read_len=100, tx_len=2000,
        paired=False, has_qual=True, mean_extra_hits=1.5, seed=0)
    refd = RefDevice.from_reference(ref)
    m1 = ReadsDevice.from_arrays(bundle.reads)
    hd = HitsDevice.from_arrays(bundle.hits)
    kcfg = KernelConfig.from_model(model, m1.codes.shape[1])
    dm = {k: jnp.asarray(v, dtype=jnp.float32)
          for k, v in model.device_arrays().items()}
    sync(m1.codes, refd.codes, hd.sid)
    H = hd.sid.shape[0]
    log_pro_flat = dm["log_pro"].reshape(-1).astype(jnp.float32)
    print("H padded:", H, "pro table:", log_pro_flat.shape, flush=True)

    def timeit(name, fn, *args, iters=3):
        out = fn(*args); sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        print(f"{name:38s} {(time.perf_counter()-t0)/iters*1e3:9.1f} ms", flush=True)

    # A: read-row gather only
    @jax.jit
    def read_gather(rid):
        def f(args):
            (r,) = args
            return m1.codes[r].astype(jnp.float32).sum(axis=1)
        return map_hit_chunks(f, H, (rid,))
    timeit("A read codes [C,L] row gather", read_gather, hd.rid)

    # B: ref window gather (ridx build + take + revcomp)
    @jax.jit
    def ref_gather(sid, pos, dirs):
        def f(args):
            s, p, d = args
            L = kcfg.max_read_len
            j = jnp.arange(L, dtype=jnp.int32)[None, :]
            off = refd.offsets[s][:, None]
            tl = refd.tot_len[s][:, None]
            fwd = off + p[:, None] + j
            rev = off + tl - 1 - p[:, None] - j
            ridx = jnp.clip(jnp.where(d[:, None] == 1, rev, fwd), 0,
                            refd.codes.shape[0] - 1)
            refc = jnp.take(refd.codes, ridx).astype(jnp.int32)
            return refc.sum(axis=1).astype(jnp.float32)
        return map_hit_chunks(f, H, (sid, pos, dirs))
    timeit("B ref window gather", ref_gather, hd.sid, hd.pos, hd.dir)

    # C: small-table value gather [C,L] into 2.5k-entry table
    flat_const = jnp.zeros((H,), jnp.int32)  # placeholder small
    @jax.jit
    def table_gather(rid, sid, pos, dirs):
        def f(args):
            r, s, p, d = args
            flat, valid = profile_indices(kcfg, refd, m1.codes[r],
                                          m1.quals[r], m1.lens[r], s, p, d)
            vals = jnp.take(log_pro_flat, flat)
            return jnp.sum(jnp.where(valid, vals, 0.0), axis=1)
        return map_hit_chunks(f, H, (rid, sid, pos, dirs))
    timeit("C full profile term (A+B+take+sum)", table_gather,
           hd.rid, hd.sid, hd.pos, hd.dir)

    # D: whole conprb
    fn = jax.jit(partial(compute_log_conprb, kcfg))
    timeit("D compute_log_conprb", fn, refd, m1, None, hd, dm)

    # E: bigger chunk experiment
    @jax.jit
    def table_gather_big(rid, sid, pos, dirs):
        def f(args):
            r, s, p, d = args
            flat, valid = profile_indices(kcfg, refd, m1.codes[r],
                                          m1.quals[r], m1.lens[r], s, p, d)
            vals = jnp.take(log_pro_flat, flat)
            return jnp.sum(jnp.where(valid, vals, 0.0), axis=1)
        return map_hit_chunks(f, H, (rid, sid, pos, dirs), chunk=131072)
    timeit("E profile term, CHUNK=128k", table_gather_big,
           hd.rid, hd.sid, hd.pos, hd.dir)

if __name__ == "__main__":
    main()
