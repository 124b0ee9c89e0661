"""Pure-XLA SpMM backend over the packed block format.

This is the portable reference implementation (runs on CPU/GPU/TPU, no
Pallas): a ``lax.scan`` over block groups, each step doing a block-row gather
of B, a batched (8 x block_k) x (block_k x N) contraction, and a stripe
scatter-add into C. It is the "swsim" analog (SURVEY.md §4): same data
layout and math as the Pallas kernel, executed by stock XLA — used as the
cross-check oracle for the Pallas backend and as the fallback path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["spmm_xla_padded"]


@partial(jax.jit, static_argnames=("tile_m", "window_k", "block_k", "group_blocks"))
def spmm_xla_padded(
    vals: jax.Array,  # (ngroups, 8, G*bk) f32
    qrow: jax.Array,  # (ngroups, G) i32
    bcol: jax.Array,  # (ngroups, G) i32
    group_mtile: jax.Array,  # (ngroups+1,) i32
    group_kwin: jax.Array,  # (ngroups,) i32
    b_padded: jax.Array,  # (k_padded, n_padded) f32
    c_padded: jax.Array,  # (m_padded, n_padded) f32
    alpha: jax.Array,  # () f32
    beta: jax.Array,  # () f32
    *,
    tile_m: int,
    window_k: int,
    block_k: int,
    group_blocks: int,
) -> jax.Array:
    """Compute alpha * A @ B + beta * C on padded operands.

    Returns the padded (m_padded, n_padded) result.
    """
    ngroups, _, _ = vals.shape
    G, bk = group_blocks, block_k
    n_padded = b_padded.shape[1]
    m_padded = c_padded.shape[0]
    tmq = tile_m // 8
    n_stripes = m_padded // 8

    vals_blk = vals.reshape(ngroups, 8, G, bk).transpose(0, 2, 1, 3)  # (ngroups,G,8,bk)
    stripe_iota = jnp.arange(tmq, dtype=jnp.int32)

    def step(acc, xs):
        v_g, q_g, c_g, mt_g, kw_g = xs
        # Global B row index of each block's first column.
        col0 = kw_g * window_k + c_g  # (G,)
        rowsel = col0[:, None] + jnp.arange(bk, dtype=col0.dtype)[None, :]  # (G,bk)
        brows = b_padded[rowsel]  # (G, bk, n_padded) gather
        # HIGHEST precision: on TPU the default f32 contraction uses bf16 MXU
        # passes, which would blow the 1e-6 max-abs-error budget (BASELINE.md).
        contrib = jnp.einsum(
            "gik,gkn->gin",
            v_g,
            brows,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (G, 8, n_padded)
        # Scatter within the M-tile as a one-hot matmul — dense MXU work
        # instead of scatter-add. The one-hot operand is exact in any
        # precision, but ``contrib`` is real f32 data: HIGHEST keeps the TPU
        # from rounding it through bf16 passes (same budget argument as the
        # first einsum; each output element is 1.0 * contrib + exact zeros).
        onehot = (stripe_iota[:, None] == q_g[None, :]).astype(jnp.float32)
        tile = jnp.einsum(
            "tg,gin->tin",
            onehot,
            contrib,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (tmq, 8, n_padded)
        # Accumulate into the group's M-tile with a dynamic slice read+write.
        start = (mt_g * tmq, 0, 0)
        old = jax.lax.dynamic_slice(acc, start, (tmq, 8, n_padded))
        acc = jax.lax.dynamic_update_slice(acc, old + tile, start)
        return acc, None

    acc0 = jnp.zeros((n_stripes, 8, n_padded), dtype=jnp.float32)
    acc, _ = jax.lax.scan(
        step,
        acc0,
        (vals_blk, qrow, bcol, group_mtile[:ngroups], group_kwin),
    )
    ab = acc.reshape(m_padded, n_padded)
    return alpha.astype(jnp.float32) * ab + beta.astype(jnp.float32) * c_padded
