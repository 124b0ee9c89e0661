"""Measure the "one bitstream" serving property on the live backend.

Serves two DIFFERENT matrices from one SpmmServer bucket and times:
  * pack + plan build per matrix (host work);
  * the first call of each (compile happens here if anywhere);
  * steady-state call latency.
Done-bar (VERDICT r4 #4): the second, never-seen matrix of a warm bucket
must show first-call latency ~= steady-state (no 20-40 s XLA compile).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from sextans_tpu.format.coo import COOMatrix
from sextans_tpu.format.csr import CSRMatrix
from sextans_tpu.ops.golden import golden_spmm_exact
from sextans_tpu.ops.serve import SpmmServer
from sextans_tpu.utils.config import SpmmConfig


def _coo(m, k, nnz, seed):
    rng = np.random.default_rng(seed)
    lin = rng.choice(m * k, size=nnz, replace=False).astype(np.int64)
    return COOMatrix(
        (m, k), (lin // k).astype(np.int32), (lin % k).astype(np.int32),
        rng.standard_normal(nnz).astype(np.float32),
    )


def drive(server, coo, label):
    rng = np.random.default_rng(11)
    b = rng.standard_normal((coo.shape[1], server.n)).astype(np.float32)
    c = rng.standard_normal((coo.shape[0], server.n)).astype(np.float32)
    t0 = time.perf_counter()
    plan = server.plan(coo)
    t_plan = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = plan(b, 0.85, -2.06, c)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    plan(b, 0.85, -2.06, c)
    t_steady = time.perf_counter() - t0
    want = golden_spmm_exact(CSRMatrix.from_coo(coo), b, 0.85, -2.06, c)
    err = float(np.abs(got - want).max())
    print(
        f"{label}: bucket_new={plan.bucket_new} plan {t_plan*1e3:.0f} ms, "
        f"first call {t_first*1e3:.0f} ms, steady {t_steady*1e3:.0f} ms, "
        f"max_abs_err {err:.2e}",
        flush=True,
    )
    assert err < 1e-4
    return t_first, t_steady


def _coo_low_degree(m, k, deg, seed):
    """Every row gets ``deg`` distinct nonzeros (vectorized): the scattered
    low-degree class the ELL engine serves. n_virt=0 at R>=deg, so two
    near-size instances share an ELL bucket."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, k, size=m, dtype=np.int64)
    step = rng.integers(1, k // deg, size=m, dtype=np.int64)
    cols = (base[:, None] + step[:, None] * np.arange(deg)) % k
    rows = np.repeat(np.arange(m, dtype=np.int32), deg)
    return COOMatrix(
        (m, k), rows, cols.reshape(-1).astype(np.int32),
        rng.standard_normal(m * deg).astype(np.float32),
    )


def main(fmt="vpu"):
    import jax

    print("devices:", jax.devices(), "fmt:", fmt, flush=True)
    from sextans_tpu.utils.cache import enable_compilation_cache

    # NOTE: deliberately NOT enabling the persistent compile cache would
    # show the raw compile cost; we enable it (like production) and rely
    # on fresh-shape buckets for the cold number.
    enable_compilation_cache()
    if fmt == "ell":
        cfg = SpmmConfig(tile_m=512, ell_r=4, tile_n=128)
        server = SpmmServer(512, config=cfg, fmt="ell")
        coo1 = _coo_low_degree(30000, 30000, 4, 31)
        coo2 = _coo_low_degree(29500, 29000, 4, 32)
    else:
        cfg = SpmmConfig()
        server = SpmmServer(512, config=cfg, fmt=fmt)
        coo1 = _coo(30000, 30000, 600000, 31)
        coo2 = _coo(29500, 29000, 580000, 32)
    # two never-before-seen shapes in one bucket family
    t1_first, t1_steady = drive(server, coo1, "matrix-1")
    t2_first, t2_steady = drive(server, coo2, "matrix-2")
    ratio = t2_first / max(t2_steady, 1e-9)
    print(
        f"cold-serve ratio (matrix-2 first/steady): {ratio:.2f}x "
        f"(matrix-1 first call carried the compile: {t1_first*1e3:.0f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "vpu")
