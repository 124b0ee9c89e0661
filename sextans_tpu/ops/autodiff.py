"""Differentiable SpMM: gradients through C = alpha * A @ B + beta * C.

Beyond-reference capability that falls naturally out of a JAX-native design:
the reference is a fixed-function accelerator (no training story), but a TPU
SpMM framework slots into learned pipelines, so ``spmm_op`` exposes the
product as a differentiable primitive:

    d/dB  = alpha * A^T @ G      (another SpMM, with the transpose pack)
    d/dC  = beta * G

A^T is packed once on the host (pack of the transposed COO) — the analog of
preparing a second edge stream in the reference world, except here it buys
a whole backward pass. alpha/beta are non-differentiable parameters.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sextans_tpu.format.coo import COOMatrix
from sextans_tpu.format.pack import pack
from sextans_tpu.ops.plan import SpmmPlan
from sextans_tpu.utils.config import SpmmConfig

__all__ = ["spmm_op"]


def spmm_op(
    a: COOMatrix,
    n: int,
    alpha: float = 1.0,
    beta: float = 0.0,
    *,
    backend: str = "auto",
    config: Optional[SpmmConfig] = None,
):
    """Build a differentiable ``f(b, c) -> alpha*A@b + beta*c``.

    Both the forward matrix and its transpose are packed once; the returned
    callable is jit-compatible and supports ``jax.grad``/``jax.vjp`` with
    respect to ``b`` and ``c``.
    """
    cfg = config or SpmmConfig()
    m, k = a.shape
    fwd_plan = SpmmPlan(pack(a, cfg), n, backend=backend)
    bwd_plan = SpmmPlan(pack(a.transpose(), cfg), n, backend=backend)
    alpha = float(alpha)
    beta = float(beta)

    @jax.custom_vjp
    def op(b, c):
        return fwd_plan(b, alpha, beta, c)

    def op_fwd(b, c):
        return op(b, c), None

    def op_bwd(_, g):
        g = g.astype(jnp.float32)
        # dB = alpha * A^T @ G — reuse the SpMM kernel with the transpose pack
        db = bwd_plan(g, alpha, 0.0, None)
        dc = jnp.float32(beta) * g
        return db, dc

    op.defvjp(op_fwd, op_bwd)
    return op
