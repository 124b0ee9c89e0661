"""On-device probe: what does an HBM gather actually cost on this TPU?

Calibrates the ELL engine's cost model (utils/autotune.ELL_GATHER_FACTOR):

1. raw ``jnp.take(B, idx, axis=0)`` bandwidth for random indices, across
   N in {16, 128, 512} and table sizes — the engine's dominant term;
2. the full ELL engine vs the edge kernel on a synthetic low-degree
   scattered matrix (roadnet/webbase class) at each N;
3. a fused gather+multiply+reduce step (what lax.map's block body compiles
   to) to see whether XLA fuses or materializes.

Run ONLY in a quiet window (no concurrent suite pass):

    python benchmarks/scratch/gather_probe.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp


def timed(fn, *args, times=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(times):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / times


def probe_raw_take():
    print("== raw jnp.take bandwidth (random row gather) ==")
    rng = np.random.default_rng(0)
    for k in (65536, 1 << 20):
        for n in (16, 128, 512):
            for g in (1 << 20, 4 << 20):
                b = jnp.asarray(
                    rng.standard_normal((k, n)).astype(np.float32)
                )
                idx = jnp.asarray(rng.integers(0, k, g).astype(np.int32))
                f = jax.jit(lambda b_, i_: jnp.take(b_, i_, axis=0))
                dt = timed(f, b, idx, times=5)
                bytes_moved = g * n * 4 * 2  # read + write
                print(
                    f"  K={k} N={n} gathers={g}: {dt*1e3:.2f} ms "
                    f"{bytes_moved/dt/1e9:.1f} GB/s apparent "
                    f"({dt/g*1e9:.2f} ns/row)"
                )


def probe_fused_block():
    print("== fused gather+mul+add chain (ELL block body) ==")
    rng = np.random.default_rng(1)
    k, n, mb, r = 1 << 20, 512, 65536, 4
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    cl = jnp.asarray(rng.integers(0, k, (mb, r)).astype(np.int32))
    v = jnp.asarray(rng.standard_normal((mb, r)).astype(np.float32))

    @jax.jit
    def blk(v_, cl_, b_):
        acc = v_[:, 0, None] * jnp.take(b_, cl_[:, 0], axis=0)
        for i in range(1, r):
            acc = acc + v_[:, i, None] * jnp.take(b_, cl_[:, i], axis=0)
        return acc

    dt = timed(blk, v, cl, b, times=10)
    rows = mb * r
    print(
        f"  mb={mb} R={r} N={n}: {dt*1e3:.2f} ms, {dt/rows*1e9:.2f} ns/row, "
        f"{rows*n*4/dt/1e9:.1f} GB/s gather-side"
    )


def probe_end_to_end():
    print("== ELL engine vs edge kernel, low-degree scattered ==")
    from benchmarks.matrices import roadnet_like
    from sextans_tpu.format.pack_edge import pack_edge
    from sextans_tpu.format.pack_ell import pack_ell
    from sextans_tpu.ops.plan import SpmmPlan
    from sextans_tpu.utils.autotune import (
        choose_config_edge,
        choose_config_ell,
    )
    from sextans_tpu.utils.timing import time_repeat
    from sextans_tpu.utils.verify import gflops

    coo = roadnet_like(200_000, seed=42)
    rng = np.random.default_rng(2)
    for n in (16, 128, 512):
        b = rng.standard_normal((coo.shape[1], n)).astype(np.float32)
        c = rng.standard_normal((coo.shape[0], n)).astype(np.float32)
        row = f"  nnz={coo.nnz} N={n}:"
        for fam, chooser, packer in (
            ("ell", choose_config_ell, pack_ell),
            ("edge", choose_config_edge, pack_edge),
        ):
            cand = chooser(coo, n=n, top=1)
            if not cand:
                row += f" {fam}=infeasible"
                continue
            packed = packer(coo, cand[0].config)
            plan = SpmmPlan(packed, n, backend="auto")
            secs = time_repeat(plan, b, 1.0, 0.5, c, times=64)
            gf = gflops(coo.nnz, coo.shape[0], n, secs)
            row += (
                f" {fam}={gf:.1f} GFLOPS ({secs*1e3:.3f} ms, "
                f"pred {cand[0].predicted_cost/0.94e9*1e3:.2f} ms)"
            )
        print(row)


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe_raw_take()
    probe_fused_block()
    probe_end_to_end()
