"""Issue-path variants for the chunk-gather kernel, timed with the
sum-fetch protocol (block_until_ready returns early through the relay —
only a scalar dependency fetch bounds the real execution).

A: pl.when(ch>=0) skip-pads + per-DMA semaphore + per-DMA wait (engine v1)
B: unconditional fetch (pads -> chunk 0) + per-DMA sem/wait
C: unconditional + ONE aggregate wait per (slot, rr) (8 DMAs, one sem)
D: unconditional + ONE aggregate wait per group (8R DMAs, one sem)
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(variant, ng, r, ns):
    def kernel(chunk_ref, subw_ref, wvals_ref, b_ref, out_ref, buf, sems):
        def issue(g, slot):
            for rr in range(r):
                for s in range(8):
                    ch = chunk_ref[g, s, rr]
                    if variant == "A":
                        @pl.when(ch >= 0)
                        def _():
                            pltpu.make_async_copy(
                                b_ref.at[ch], buf.at[slot, rr, s],
                                sems.at[slot, rr, s]).start()
                    elif variant == "B":
                        pltpu.make_async_copy(
                            b_ref.at[ch], buf.at[slot, rr, s],
                            sems.at[slot, rr, s]).start()
                    elif variant == "C":
                        pltpu.make_async_copy(
                            b_ref.at[ch], buf.at[slot, rr, s],
                            sems.at[slot, rr]).start()
                    else:
                        pltpu.make_async_copy(
                            b_ref.at[ch], buf.at[slot, rr, s],
                            sems.at[slot]).start()

        def wait_group(g, slot):
            if variant in ("A", "B"):
                for rr in range(r):
                    for s in range(8):
                        ch = chunk_ref[g, s, rr]
                        if variant == "A":
                            @pl.when(ch >= 0)
                            def _():
                                pltpu.make_async_copy(
                                    b_ref.at[0], buf.at[slot, rr, s],
                                    sems.at[slot, rr, s]).wait()
                        else:
                            pltpu.make_async_copy(
                                b_ref.at[0], buf.at[slot, rr, s],
                                sems.at[slot, rr, s]).wait()
            elif variant == "C":
                for rr in range(r):
                    pltpu.make_async_copy(
                        b_ref.at[0], buf.at[slot, rr], sems.at[slot, rr]
                    ).wait()
            else:
                pltpu.make_async_copy(
                    b_ref.at[0], buf.at[slot], sems.at[slot]).wait()

        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 1)
        issue(0, 0)

        def body(g, _):
            slot = jax.lax.rem(g, 2)

            @pl.when(g + 1 < ng)
            def _():
                issue(g + 1, jax.lax.rem(g + 1, 2))

            wait_group(g, slot)
            w = wvals_ref[g]
            subw = subw_ref[g]
            accs = []
            for c in range(ns):
                acc_c = jnp.zeros((8, 128), jnp.float32)
                for rr in range(r):
                    tgt = subw[:, rr] * ns + c
                    sel = sub_iota == tgt[:, None, None]
                    part = jnp.sum(jnp.where(sel, buf[slot, rr], 0.0), axis=1)
                    acc_c = acc_c + w[:, rr][:, None] * part
                accs.append(acc_c)
            out_ref[g] = accs[0] if ns == 1 else jnp.concatenate(accs, axis=1)
            return 0

        jax.lax.fori_loop(0, ng, body, 0, unroll=False)

    return kernel


@partial(jax.jit, static_argnames=("variant", "m_block", "n_pad"))
def run_variant(vals, cols, b_padded, variant, m_block, n_pad):
    m_padded, r = vals.shape
    k_pad = b_padded.shape[0]
    ns = n_pad // 128
    p = 8 // ns
    valid = vals != 0.0
    if variant == "A":
        chunk = jnp.where(valid, cols // p, -1).astype(jnp.int32)
    else:
        chunk = jnp.where(valid, cols // p, 0).astype(jnp.int32)
    subw = jnp.where(valid, cols % p, -1).astype(jnp.int32)
    groups = m_padded // 8
    n_blocks = m_padded // m_block
    ng = m_block // 8
    b3 = b_padded.reshape(k_pad // p, 8, 128)
    sems_shape = {
        "A": (2, r, 8), "B": (2, r, 8), "C": (2, r), "D": (2,)
    }[variant]
    out = pl.pallas_call(
        make_kernel(variant, ng, r, ns),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((ng, 8, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ng, 8, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 8, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((ng, 8, n_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((groups, 8, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, r, 8, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(sems_shape),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(chunk.reshape(groups, 8, r), subw.reshape(groups, 8, r),
      vals.reshape(groups, 8, r), b3)
    return out.reshape(m_padded, n_pad)


def main():
    rng = np.random.default_rng(0)
    # correctness, small
    k, n_pad, r, m = 4096, 512, 4, 2048
    b = rng.standard_normal((k, n_pad)).astype(np.float32)
    cols = rng.integers(0, k, (m, r)).astype(np.int32)
    vals = rng.standard_normal((m, r)).astype(np.float32)
    vals[rng.random((m, r)) < 0.3] = 0.0
    want = np.einsum("mr,mrn->mn", vals, b[cols] * (vals != 0)[..., None])
    for v in ("A", "B", "C", "D"):
        got = np.asarray(run_variant(jnp.asarray(vals), jnp.asarray(cols),
                                     jnp.asarray(b), v, 256, n_pad))
        err = np.abs(got - want).max()
        print(f"variant {v}: correctness err={err:.2e}", flush=True)

    # rate sweep, sum-fetch protocol
    k = 400_000 // 8 * 8
    m = 262_144
    for n_pad in (512, 128):
        b = jnp.asarray(rng.standard_normal((k, n_pad)).astype(np.float32))
        for r in (4, 8):
            cols = jnp.asarray(rng.integers(0, k, (m, r)).astype(np.int32))
            vals = jnp.asarray(rng.standard_normal((m, r)).astype(np.float32))
            for v in ("A", "B", "C", "D"):
                for blk in (256, 1024):
                    try:
                        out = run_variant(vals, cols, b, v, blk, n_pad)
                        float(jnp.sum(out[0]))
                        reps = 5
                        t0 = time.perf_counter()
                        for _ in range(reps):
                            out = run_variant(vals, cols, b, v, blk, n_pad)
                        float(jnp.sum(out))
                        dt = (time.perf_counter() - t0) / reps
                        print(f"n_pad={n_pad:4d} R={r} {v} blk={blk:5d}: "
                              f"{dt*1e3:8.2f} ms  {m*r/dt/1e6:7.1f} M dma/s  "
                              f"{2.0*m*r*n_pad/dt/1e9:7.1f} GF-equiv",
                              flush=True)
                    except Exception as e:
                        print(f"n_pad={n_pad} R={r} {v} blk={blk}: FAILED "
                              f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
