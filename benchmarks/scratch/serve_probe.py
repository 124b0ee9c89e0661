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


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    from sextans_tpu.utils.cache import enable_compilation_cache

    # NOTE: deliberately NOT enabling the persistent compile cache would
    # show the raw compile cost; we enable it (like production) and rely
    # on fresh-shape buckets for the cold number.
    enable_compilation_cache()
    cfg = SpmmConfig()
    server = SpmmServer(512, config=cfg, fmt="vpu")
    # two never-before-seen shapes in one bucket family
    m1, k1 = 30000, 30000
    m2, k2 = 29500, 29000
    t1_first, t1_steady = drive(server, _coo(m1, k1, 600000, 31), "matrix-1")
    t2_first, t2_steady = drive(server, _coo(m2, k2, 580000, 32), "matrix-2")
    ratio = t2_first / max(t2_steady, 1e-9)
    print(
        f"cold-serve ratio (matrix-2 first/steady): {ratio:.2f}x "
        f"(matrix-1 first call carried the compile: {t1_first*1e3:.0f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    main()
