"""Top-level SpMM API: C = alpha * A @ B + beta * C.

The library analog of the reference's host-side kernel launch
(``tapa::invoke(Sextans, ...)``, src/sextans-host.cpp:236-251): pads dense
operands to tile boundaries, dispatches to a backend, and slices the result
back to (M, N).

Backends:

* ``"pallas"`` — the TPU Pallas kernel (ops/spmm_pallas.py), production path;
* ``"xla"``    — portable pure-XLA scan backend (ops/spmm_xla.py);
* ``"auto"``   — pallas on TPU, xla elsewhere.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from sextans_tpu.format.coo import COOMatrix
from sextans_tpu.format.csr import CSRMatrix, CSCMatrix
from sextans_tpu.format.pack import PackedSpMatrix, pack
from sextans_tpu.utils.config import SpmmConfig, round_up

__all__ = ["spmm", "prepare"]

MatrixLike = Union[PackedSpMatrix, COOMatrix, CSRMatrix, CSCMatrix]


def prepare(a: MatrixLike, config: Optional[SpmmConfig] = None) -> PackedSpMatrix:
    """Coerce any supported sparse container into the packed block format."""
    if isinstance(a, PackedSpMatrix):
        return a
    cfg = config or SpmmConfig()
    if isinstance(a, (CSRMatrix, CSCMatrix)):
        a = a.to_coo()
    if not isinstance(a, COOMatrix):
        raise TypeError(f"unsupported sparse matrix type {type(a)!r}")
    return pack(a, cfg)


def _pad2d(x: jax.Array, rows: int, cols: int) -> jax.Array:
    pr, pc = rows - x.shape[0], cols - x.shape[1]
    if pr == 0 and pc == 0:
        return x
    return jnp.pad(x, ((0, pr), (0, pc)))


def spmm(
    a: MatrixLike,
    b,
    alpha: float = 1.0,
    beta: float = 0.0,
    c=None,
    *,
    backend: str = "auto",
    config: Optional[SpmmConfig] = None,
) -> jax.Array:
    """Sparse-matrix x dense-matrix product with the reference semantics.

    ``a``: sparse (M, K) in any supported container (packed preferred —
    packing is the expensive host step, do it once per matrix).
    ``b``: dense (K, N) float32. ``c``: dense (M, N) float32, required when
    ``beta != 0`` (matching src/sextans-host.cpp semantics where C is always
    supplied; here it is optional for the common beta=0 case).
    """
    packed = prepare(a, config)
    cfg = packed.config
    m, k = packed.shape

    b = jnp.asarray(b, dtype=jnp.float32)
    if b.ndim != 2 or b.shape[0] != k:
        raise ValueError(f"B must be ({k}, N) dense, got {b.shape}")
    n = b.shape[1]

    tile_n = cfg.resolve_tile_n(n)
    n_padded = round_up(n, tile_n)
    b_padded = _pad2d(b, packed.k_padded, n_padded)

    if c is None:
        if float(beta) != 0.0:
            raise ValueError("beta != 0 requires an input C")
        c_padded = jnp.zeros((packed.m_padded, n_padded), dtype=jnp.float32)
    else:
        c = jnp.asarray(c, dtype=jnp.float32)
        if c.shape != (m, n):
            raise ValueError(f"C must be ({m}, {n}), got {c.shape}")
        c_padded = _pad2d(c, packed.m_padded, n_padded)

    if backend == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        backend = "pallas" if on_tpu else "xla"

    alpha_arr = jnp.float32(alpha)
    beta_arr = jnp.float32(beta)

    kwargs = dict(
        tile_m=cfg.tile_m,
        window_k=cfg.window_k,
        block_k=cfg.block_k,
        group_blocks=cfg.group_blocks,
    )
    args = (
        jnp.asarray(packed.vals),
        jnp.asarray(packed.qrow),
        jnp.asarray(packed.bcol),
        jnp.asarray(packed.group_mtile),
        jnp.asarray(packed.group_kwin),
        b_padded,
        c_padded,
        alpha_arr,
        beta_arr,
    )

    if backend == "xla":
        from sextans_tpu.ops.spmm_xla import spmm_xla_padded

        out = spmm_xla_padded(*args, **kwargs)
    elif backend in ("pallas", "pallas_interpret"):
        from sextans_tpu.ops.spmm_pallas import spmm_pallas_padded

        out = spmm_pallas_padded(
            *args,
            **kwargs,
            tile_n=tile_n,
            interpret=(backend == "pallas_interpret"),
        )
    else:
        raise ValueError(f"unknown backend {backend!r}")

    return out[:m, :n]
