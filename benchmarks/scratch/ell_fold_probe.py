"""Isolate the amazon_like ELL-pallas slowdown: bare kernel vs hub-fold
scatter vs row gather, timed with the sum-fetch protocol on the real TPU."""
import os
import sys
import time

os.environ.setdefault("TMPDIR", "/root/cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import numpy as np
import jax
import jax.numpy as jnp

import matrices as M
from sextans_tpu.format.pack_ell import pack_ell
from sextans_tpu.ops.spmm_ell_pallas import spmm_ell_gather_padded
from sextans_tpu.utils.config import SpmmConfig


def fetch_time(fn, *args, reps=3):
    out = fn(*args)
    jnp.sum(out).block_until_ready()
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps


def main():
    print("platform:", jax.devices()[0], flush=True)
    coo = M.suite("full")["amazon_like"]()
    m, k = coo.shape
    n_pad = 512
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((k, n_pad)).astype(np.float32))

    for r in (2, 8, 16):
        packed = pack_ell(coo, SpmmConfig(tile_m=8192, ell_r=r))
        m_padded = packed.m_padded
        n_virt = packed.n_virt
        vals = jnp.asarray(packed.vals)
        cols = jnp.asarray(packed.cols)
        fold = jnp.asarray(packed.fold_rows)
        c = jnp.zeros((m_padded, n_pad), jnp.float32)
        nofold = jnp.zeros((0,), jnp.int32)

        # 1. bare kernel, fold stripped
        bare = jax.jit(lambda v, cl, bb: spmm_ell_gather_padded(
            v, cl, nofold, bb, c, jnp.float32(1.0), jnp.float32(0.0),
            m_block=256, m_base=packed.m_base, with_c=False))
        dt = fetch_time(bare, vals, cols, b)
        slots = m_padded * r
        print(f"R={r:2d} m_padded={m_padded} n_virt={n_virt}: bare kernel "
              f"{dt*1e3:8.2f} ms  {slots/dt/1e6:6.1f} M dma/s  "
              f"{2.0*coo.nnz*n_pad/dt/1e9:6.1f} GF", flush=True)

        # 2. fold scatter alone on a same-shaped array
        if n_virt:
            x = jnp.asarray(
                rng.standard_normal((m_padded, n_pad)).astype(np.float32))

            @jax.jit
            def scat(xx):
                add = jax.lax.dynamic_slice_in_dim(
                    xx, packed.m_base, n_virt, 0)
                return xx.at[fold].add(add, indices_are_sorted=True,
                                       unique_indices=False)

            dt2 = fetch_time(scat, x)
            print(f"      fold scatter alone: {dt2*1e3:8.2f} ms "
                  f"({n_virt} virt rows -> {dt2/max(n_virt,1)*1e6:.2f} us/row)",
                  flush=True)

            # 3. segment-sum fold: cumsum + two monotone gathers
            s_idx = np.searchsorted(packed.fold_rows, np.arange(packed.m_base))
            e_idx = np.searchsorted(packed.fold_rows, np.arange(packed.m_base),
                                    side="right")
            s_d = jnp.asarray(s_idx.astype(np.int32))
            e_d = jnp.asarray(e_idx.astype(np.int32))

            @jax.jit
            def segfold(xx):
                virt = jax.lax.dynamic_slice_in_dim(
                    xx, packed.m_base, n_virt, 0)
                cs = jnp.cumsum(virt, axis=0)
                cs0 = jnp.concatenate(
                    [jnp.zeros((1, n_pad), jnp.float32), cs], 0)
                add = jnp.take(cs0, e_d, axis=0) - jnp.take(cs0, s_d, axis=0)
                head = jax.lax.dynamic_slice_in_dim(xx, 0, packed.m_base, 0)
                return head + add

            dt3 = fetch_time(segfold, x)
            print(f"      segfold (cumsum+2 takes): {dt3*1e3:8.2f} ms",
                  flush=True)

        # 4. full-row monotone gather of m rows (reorder-style)
        perm = jnp.asarray(
            rng.permutation(m_padded).astype(np.int32)[:m])
        x2 = jnp.asarray(rng.standard_normal((m_padded, n_pad)).astype(np.float32))
        g = jax.jit(lambda xx: jnp.take(xx, perm, axis=0))
        dt4 = fetch_time(g, x2)
        print(f"      random row take of {m}: {dt4*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
