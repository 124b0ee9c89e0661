"""Differentiable SpMM tests (ops/autodiff.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from sextans_tpu.format.coo import COOMatrix
from sextans_tpu.ops.autodiff import spmm_op
from sextans_tpu.utils.config import SpmmConfig

CFG = SpmmConfig(tile_m=32, window_k=128, block_k=8, group_blocks=16, tile_n=128)


def _setup(m=60, k=80, n=16, nnz=500, seed=3):
    coo = COOMatrix.random(m, k, nnz, seed=seed)
    rng = np.random.default_rng(seed + 1)
    b = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    return coo, b, c


def test_forward_matches_dense():
    coo, b, c = _setup()
    op = spmm_op(coo, 16, 0.85, -2.06, backend="xla", config=CFG)
    dense = jnp.asarray(coo.to_dense())
    want = 0.85 * dense @ b + (-2.06) * c
    got = op(b, c)
    assert np.max(np.abs(np.asarray(got - want))) < 1e-4


def test_grad_wrt_b_is_alpha_at_g():
    coo, b, c = _setup(seed=7)
    alpha, beta = 1.7, 0.3
    op = spmm_op(coo, 16, alpha, beta, backend="xla", config=CFG)
    g = jnp.asarray(
        np.random.default_rng(9).standard_normal((60, 16)).astype(np.float32)
    )
    _, vjp = jax.vjp(op, b, c)
    db, dc = vjp(g)
    dense = np.asarray(coo.to_dense(), dtype=np.float64)
    want_db = alpha * dense.T @ np.asarray(g, dtype=np.float64)
    want_dc = beta * np.asarray(g, dtype=np.float64)
    assert np.max(np.abs(np.asarray(db) - want_db)) < 1e-4
    assert np.max(np.abs(np.asarray(dc) - want_dc)) < 1e-5


def test_grad_of_scalar_loss():
    coo, b, c = _setup(seed=11)
    op = spmm_op(coo, 16, 1.0, 0.5, backend="xla", config=CFG)

    def loss(b_):
        return jnp.sum(op(b_, c) ** 2)

    g_auto = jax.grad(loss)(b)
    # finite differences on a few coordinates
    rng = np.random.default_rng(0)
    for _ in range(4):
        i, j = rng.integers(0, b.shape[0]), rng.integers(0, b.shape[1])
        eps = 1e-2
        bp = b.at[i, j].add(eps)
        bm = b.at[i, j].add(-eps)
        fd = (loss(bp) - loss(bm)) / (2 * eps)
        assert abs(float(g_auto[i, j]) - float(fd)) < 2e-1 + 0.05 * abs(float(fd))


def test_jit_compatible():
    coo, b, c = _setup(seed=13)
    op = spmm_op(coo, 16, 1.0, 0.0, backend="xla", config=CFG)
    f = jax.jit(lambda b_, c_: op(b_, c_).sum())
    assert np.isfinite(float(f(b, c)))
