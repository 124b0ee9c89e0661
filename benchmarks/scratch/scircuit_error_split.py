"""Explain the scircuit-class error cliff (VERDICT r4 weak #7).

scircuit_like canonical rows carry max_abs ~2e-4 — 30-100x every other
row — with the hybrid (diag + hub rows + residue) winner. This script
computes each hybrid component in f32 EXACTLY as the plan does (host
NumPy mirrors) against the f64 oracle of that component, isolating where
the error lives, and checks it against the f32 inner-product rounding
model err ~ sqrt(deg)/2 * ulp(|partial|).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from benchmarks.matrices import suite
from sextans_tpu.ops.hybrid import split_structure

coo = suite("full")["scircuit_like"]()
m, k = coo.shape
print(f"scircuit_like: {m}x{k}, nnz={coo.nnz}", flush=True)
n = 8  # columns are independent; a few suffice for max-abs structure
rng = np.random.default_rng(0)
b = rng.standard_normal((k, n)).astype(np.float32)

split = split_structure(coo, n=512)
print(split.summary(), flush=True)

def part_err(vals64_f, vals32_f, label):
    e64 = vals64_f()
    e32 = vals32_f().astype(np.float64)
    err = np.abs(e32 - e64)
    i = np.unravel_index(err.argmax(), err.shape)
    print(f"{label}: max_abs_err {err.max():.3e} at row {i[0]} "
          f"(|part| there {abs(e64[i]):.3f}, part max {np.abs(e64).max():.3f})",
          flush=True)
    return err.max()

b64 = b.astype(np.float64)

# hub-row component: R dense rows of length k
if split.head_rows.size:
    hr32 = split.head_rows_dense
    deg = (hr32 != 0).sum(axis=1)
    print(f"hub rows: {split.head_rows.size}, degrees {deg.min()}..{deg.max()}",
          flush=True)
    part_err(
        lambda: hr32.astype(np.float64) @ b64,
        lambda: hr32 @ b,   # f32 BLAS dot — the MXU HIGHEST analog
        "head-rows (dense @ B)",
    )
    # rounding model for the worst row
    j = int(np.argmax(deg))
    row = hr32[j][hr32[j] != 0].astype(np.float64)
    scale = np.sqrt((row**2).sum())  # |partial| ~ running-sum scale
    model = 0.5 * np.sqrt(deg[j]) * np.spacing(np.float32(scale))
    print(f"  rounding model for deg={deg[j]} row: ~{model:.3e}", flush=True)

# diagonal component
if split.diag_offsets.size:
    dv = split.diag_vals
    def dia64():
        acc = np.zeros((m, n))
        for d, off in enumerate(split.diag_offsets):
            lo = max(0, -off); hi = min(m, k - off)
            acc[lo:hi] += dv[d, lo:hi, None].astype(np.float64) * b64[lo+off:hi+off]
        return acc
    def dia32():
        acc = np.zeros((m, n), np.float32)
        for d, off in enumerate(split.diag_offsets):
            lo = max(0, -off); hi = min(m, k - off)
            acc[lo:hi] += (dv[d, lo:hi, None] * b[lo+off:hi+off]).astype(np.float32)
        return acc
    part_err(dia64, dia32, "diagonals")

# head-cols component
if split.head_cols.size:
    hd = split.head_dense
    bh = b[split.head_cols]
    part_err(lambda: hd.astype(np.float64) @ bh.astype(np.float64),
             lambda: hd @ bh, "head-cols")

# residue via scipy CSR f32
from sextans_tpu.format.csr import CSRMatrix
import scipy.sparse as sp
res = split.residue
mat32 = sp.csr_matrix((res.vals, (res.rows, res.cols)), shape=res.shape)
mat64 = sp.csr_matrix((res.vals.astype(np.float64), (res.rows, res.cols)), shape=res.shape)
part_err(lambda: mat64 @ b64, lambda: (mat32 @ b).astype(np.float32), "residue")

# full-product conditioning: |A| |B| vs |C|
mat_abs = sp.csr_matrix((np.abs(coo.vals).astype(np.float64), (coo.rows, coo.cols)), shape=coo.shape)
absprod = mat_abs @ np.abs(b64)
full64 = sp.csr_matrix((coo.vals.astype(np.float64), (coo.rows, coo.cols)), shape=coo.shape) @ b64
print(f"conditioning: max |A||B| row sum {absprod.max():.1f}, max|AB| {np.abs(full64).max():.1f}, "
      f"ratio {absprod.max()/max(np.abs(full64).max(),1e-9):.1f}", flush=True)
