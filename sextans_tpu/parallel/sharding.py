"""Multi-chip SpMM via shard_map over a device mesh.

The TPU-native replacement for the reference's single-FPGA HBM-channel
parallelism (SURVEY.md §2.4): A and C are 1-D row-block sharded over the
mesh's ``"x"`` axis (each chip owns a contiguous row slab), B is replicated,
and every chip runs the single-chip kernel on its slab. Row-sharded SpMM
needs **no** inter-chip collectives in the forward product — C rows are
produced where A rows live; XLA inserts the B broadcast on ICI.

A K-sharded variant with ``psum``/reduce-scatter of C partials is provided
for matrices whose K dimension dominates (``spmm_sharded_k``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sextans_tpu.parallel.partition import ShardedSpMatrix
from sextans_tpu.utils.config import round_up

__all__ = [
    "spmm_sharded",
    "spmm_sharded_k",
    "ShardedSpmmPlan",
    "ShardedSpmmPlanK",
    "make_mesh",
]


def make_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def make_local_kernel(cfg, backend: str, tile_n: int, m_local: int):
    """Per-shard kernel dispatch shared by the row-sharded plans.

    Returns ``run(vals, qrow, bcol, gmt, gkw, b_pad, c_loc, alpha, beta)
    -> (m_local, n_padded)`` operating on ONE shard's (unstacked) arrays —
    the single-chip engine switch of ops/plan.py reduced to the padded
    entry points, used inside shard_map by ShardedSpmmPlan and
    ShardedHybridPlan (parallel/hybrid_sharded.py)."""

    def run(vals, qrow, bcol, gmt, gkw, b_pad, c_loc, alpha, beta):
        if backend in ("ell", "ell_pallas", "ell_pallas_interpret"):
            # the shard's slot grid carries virtual hub rows beyond the
            # m_local C slab: pad C in, slice the fold-resolved rows out
            m_pad_l = vals.shape[0]
            c_pad = jnp.pad(c_loc, ((0, m_pad_l - m_local), (0, 0)))
            if backend == "ell":
                from sextans_tpu.ops.spmm_ell_xla import spmm_ell_padded

                out = spmm_ell_padded(
                    vals, qrow, bcol, b_pad, c_pad, alpha, beta,
                    m_block=cfg.tile_m, m_base=m_local,
                )
            else:
                from sextans_tpu.ops.spmm_ell_pallas import (
                    spmm_ell_gather_padded,
                )

                out = spmm_ell_gather_padded(
                    vals, qrow, bcol, b_pad, c_pad, alpha, beta,
                    m_block=cfg.tile_m if cfg.tile_m % 256 else 256,
                    m_base=m_local,
                    interpret=(backend == "ell_pallas_interpret"),
                )
            return out[:m_local]
        kernel_kwargs = dict(
            tile_m=cfg.tile_m,
            window_k=cfg.window_k,
            block_k=cfg.block_k,
            group_blocks=cfg.group_blocks,
        )
        if backend == "xla":
            from sextans_tpu.ops.spmm_xla import spmm_xla_padded

            return spmm_xla_padded(
                vals, qrow, bcol, gmt, gkw, b_pad, c_loc, alpha, beta,
                **kernel_kwargs,
            )
        if backend in ("edge", "edge_interpret"):
            from sextans_tpu.ops.spmm_edge_pallas import spmm_edge_padded

            return spmm_edge_padded(
                vals, qrow, gmt, gkw, b_pad, c_loc, alpha, beta,
                tile_m=cfg.tile_m,
                window_k=cfg.window_k,
                edge_chunk=cfg.edge_chunk,
                edge_lanes=cfg.edge_lanes,
                tile_n=tile_n,
                interpret=(backend == "edge_interpret"),
            )
        if backend in ("mxu", "mxu_interpret"):
            from sextans_tpu.ops.spmm_mxu_pallas import spmm_mxu_padded

            return spmm_mxu_padded(
                vals, qrow, bcol, gmt, gkw, b_pad, c_loc, alpha, beta,
                **kernel_kwargs,
                tile_n=tile_n,
                interpret=(backend == "mxu_interpret"),
                unroll=cfg.chunk_unroll,
                precise=cfg.precise,
            )
        from sextans_tpu.ops.spmm_pallas import spmm_pallas_padded

        return spmm_pallas_padded(
            vals, qrow, bcol, gmt, gkw, b_pad, c_loc, alpha, beta,
            **kernel_kwargs,
            tile_n=tile_n,
            interpret=(backend == "pallas_interpret"),
            n_acc=cfg.n_acc,
            chunk_unroll=cfg.chunk_unroll,
            precise=cfg.precise,
        )

    return run


class ShardedSpmmPlan:
    """Device-resident row-block-sharded executor (multi-chip SpmmPlan).

    Uploads the stacked shard arrays to the mesh once; each call moves only
    B (replicated) and C (row-sharded) — the multi-chip twin of
    ops/plan.SpmmPlan.
    """

    def __init__(
        self,
        sharded: ShardedSpMatrix,
        n: int,
        *,
        mesh: Optional[Mesh] = None,
        backend: str = "auto",
    ):
        if sharded.mode != "row":
            raise ValueError("ShardedSpmmPlan needs a pack_sharded (row) matrix")
        mesh = mesh or make_mesh(sharded.n_shards)
        if mesh.devices.size != sharded.n_shards:
            raise ValueError(
                f"matrix packed for {sharded.n_shards} shards but mesh has "
                f"{mesh.devices.size} devices"
            )
        fmt = getattr(sharded, "fmt", "vpu")
        if backend == "auto":
            on_tpu = jax.devices()[0].platform == "tpu"
            if fmt == "mxu":
                backend = "mxu" if on_tpu else "mxu_interpret"
            elif fmt == "edge":
                backend = "edge" if on_tpu else "edge_interpret"
            elif fmt == "ell":
                # TPU: the Pallas chunk-gather engine (XLA's take
                # serializes there); elsewhere the XLA gather engine
                backend = "ell_pallas" if on_tpu else "ell"
            else:
                backend = "pallas" if on_tpu else "xla"
        if (
            (fmt == "mxu") != (backend in ("mxu", "mxu_interpret"))
            or (fmt == "edge") != (backend in ("edge", "edge_interpret"))
            or (fmt == "ell")
            != (backend in ("ell", "ell_pallas", "ell_pallas_interpret"))
        ):
            raise ValueError(
                f"backend {backend!r} does not match sharded format {fmt!r}"
            )
        self.backend = backend
        self.mesh = mesh
        self.sharded = sharded
        self.m, self.k = sharded.m, sharded.k
        self.n = n
        cfg = sharded.config
        if backend in ("ell_pallas", "ell_pallas_interpret"):
            self.tile_n = next(
                (c for c in (128, 256, 512, 1024) if n <= c),
                round_up(n, 1024),
            )
        elif fmt == "ell":
            # gather engine: no lane-tile constraint, no K windows
            self.tile_n = n
        else:
            self.tile_n = cfg.resolve_tile_n(n)
        self.n_padded = round_up(n, self.tile_n)

        axis = mesh.axis_names[0]
        shard_spec = P(axis)
        repl = P()
        m, k = self.m, self.k
        m_padded = sharded.m_padded
        k_padded = self.k if fmt == "ell" else sharded.k_padded
        n_, n_padded = n, self.n_padded
        S, m_local = sharded.n_shards, sharded.m_local
        tile_n = self.tile_n

        run_local = make_local_kernel(cfg, backend, tile_n, m_local)

        def local_step(vals, qrow, bcol, gmt, gkw, b_pad, c_loc, alpha, beta):
            # shard_map hands each device its (1, ...) slice — drop the axis.
            out = run_local(
                vals[0], qrow[0], bcol[0], gmt[0], gkw[0], b_pad, c_loc[0],
                alpha, beta,
            )
            return out[None]

        inner = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(shard_spec,) * 5 + (repl, shard_spec, repl, repl),
            out_specs=shard_spec,
            # the kernels allocate unvarying accumulators internally; skip
            # the varying-manual-axes type check rather than threading pvary
            # through backends that also run un-sharded
            check_vma=False,
        )

        # nnz-balanced sharding: m-tiles are LPT-permuted across shards
        # (partition.py tile_assign); scatter C tiles to their owners on the
        # way in and gather them back on the way out — two cheap device-side
        # permutations bracketing the kernel (never inside the repeat chain).
        tm = cfg.tile_m
        if sharded.tile_assign is not None:
            assign_flat = jnp.asarray(
                sharded.tile_assign.reshape(-1).astype(np.int32)
            )
            inv_perm = jnp.asarray(
                np.argsort(sharded.tile_assign.reshape(-1)).astype(np.int32)
            )
            t_pad = S * (m_local // tm)

            def to_stacked(c_p):
                tiles = c_p.reshape(t_pad, tm, n_padded)
                return tiles[assign_flat].reshape(S, m_local, n_padded)

            def from_stacked(out):
                tiles = out.reshape(t_pad, tm, n_padded)
                return tiles[inv_perm].reshape(m_padded, n_padded)
        else:

            def to_stacked(c_p):
                return c_p.reshape(S, m_local, n_padded)

            def from_stacked(out):
                return out.reshape(m_padded, n_padded)

        def step(vals, qrow, bcol, gmt, gkw, b, c, alpha, beta):
            b_p = jnp.pad(b, ((0, k_padded - k), (0, n_padded - n_)))
            c_p = jnp.pad(c, ((0, m_padded - m), (0, n_padded - n_)))
            c_stacked = to_stacked(c_p)
            out = inner(vals, qrow, bcol, gmt, gkw, b_p, c_stacked, alpha, beta)
            return from_stacked(out)[:m, :n_]

        self._jit = jax.jit(step)

        # in-device rp_time repeat loop, multi-chip twin of SpmmPlan.repeat
        # (src/sextans.cpp:54-60): C chained through the carry so repeats
        # cannot overlap; used by the sharded timing harness.
        def _make_repeat(times):
            def rep(vals, qrow, bcol, gmt, gkw, b, c, alpha, beta):
                b_p = jnp.pad(b, ((0, k_padded - k), (0, n_padded - n_)))
                c_p = jnp.pad(c, ((0, m_padded - m), (0, n_padded - n_)))
                c_stacked = to_stacked(c_p)

                def body(_, c_acc):
                    # pure-XLA backends: tie B to the carry so LICM cannot
                    # hoist the loop-invariant A@B out of the timing loop
                    # (same trick as ops/plan.py; Pallas calls are opaque)
                    if backend in ("xla", "ell"):
                        b_i = b_p + c_acc[0, 0:1, 0:1] * jnp.float32(1e-38)
                    else:
                        b_i = b_p
                    return inner(
                        vals, qrow, bcol, gmt, gkw, b_i, c_acc, alpha, beta
                    )

                out = jax.lax.fori_loop(0, times, body, c_stacked)
                return from_stacked(out)[:m, :n_]

            return jax.jit(rep)

        self._repeat_cache = {}
        self._make_repeat = _make_repeat
        ns = NamedSharding(mesh, shard_spec)
        self._dev = (
            jax.device_put(jnp.asarray(sharded.vals), ns),
            jax.device_put(jnp.asarray(sharded.qrow), ns),
            jax.device_put(jnp.asarray(sharded.bcol), ns),
            jax.device_put(jnp.asarray(sharded.group_mtile), ns),
            jax.device_put(jnp.asarray(sharded.group_kwin), ns),
        )

    def _check_bc(self, b, beta, c):
        b = jnp.asarray(b, dtype=jnp.float32)
        if b.shape != (self.k, self.n):
            raise ValueError(f"B must be ({self.k}, {self.n}), got {b.shape}")
        if c is None:
            if float(beta) != 0.0:
                raise ValueError("beta != 0 requires an input C")
            c = jnp.zeros((self.m, self.n), dtype=jnp.float32)
        else:
            c = jnp.asarray(c, dtype=jnp.float32)
            if c.shape != (self.m, self.n):
                raise ValueError(f"C must be ({self.m}, {self.n}), got {c.shape}")
        return b, c

    def __call__(self, b, alpha=1.0, beta=0.0, c=None) -> jax.Array:
        b, c = self._check_bc(b, beta, c)
        return self._jit(
            *self._dev, b, c, jnp.float32(alpha), jnp.float32(beta)
        )

    def repeat(self, b, alpha=1.0, beta=0.0, c=None, times: int = 1) -> jax.Array:
        """Run the sharded kernel ``times`` times in-device (one dispatch),
        feeding C back each iteration — the multi-chip rp_time analog."""
        b, c = self._check_bc(b, beta, c)
        if times not in self._repeat_cache:
            self._repeat_cache[times] = self._make_repeat(times)
        return self._repeat_cache[times](
            *self._dev, b, c, jnp.float32(alpha), jnp.float32(beta)
        )


class ShardedSpmmPlanK:
    """Device-resident K-sharded executor with ICI reduce-scatter.

    The plan twin of :func:`spmm_sharded_k`: uploads the stacked column-slab
    shards to the mesh ONCE and jit-caches the step, so steady-state calls
    move only B and C (the one-shot function re-device_put every operand per
    call — unusable for steady-state multi-chip serving).

    Each chip computes a full-M partial product over its K slab, then
    ``psum_scatter`` sums partials over ICI while scattering C row slabs to
    their owners; the alpha/beta epilogue runs on the owning chip.
    """

    def __init__(
        self,
        sharded: ShardedSpMatrix,
        n: int,
        *,
        mesh: Optional[Mesh] = None,
        backend: str = "auto",
    ):
        if sharded.mode != "col":
            raise ValueError("ShardedSpmmPlanK needs a pack_sharded_k matrix")
        mesh = mesh or make_mesh(sharded.n_shards)
        if mesh.devices.size != sharded.n_shards:
            raise ValueError(
                f"matrix packed for {sharded.n_shards} shards but mesh has "
                f"{mesh.devices.size} devices"
            )
        fmt = getattr(sharded, "fmt", "vpu")
        if backend == "auto":
            on_tpu = jax.devices()[0].platform == "tpu"
            if fmt == "mxu":
                backend = "mxu" if on_tpu else "mxu_interpret"
            elif fmt == "edge":
                backend = "edge" if on_tpu else "edge_interpret"
            elif fmt == "ell":
                backend = "ell_pallas" if on_tpu else "ell"
            else:
                backend = "pallas" if on_tpu else "xla"
        if (
            (fmt == "mxu") != (backend in ("mxu", "mxu_interpret"))
            or (fmt == "edge") != (backend in ("edge", "edge_interpret"))
            or (fmt == "ell")
            != (backend in ("ell", "ell_pallas", "ell_pallas_interpret"))
        ):
            raise ValueError(
                f"backend {backend!r} does not match sharded format {fmt!r}"
            )
        self.backend = backend
        self.mesh = mesh
        self.sharded = sharded
        self.m, self.k = sharded.m, sharded.k
        self.n = n
        cfg = sharded.config
        if backend in ("ell_pallas", "ell_pallas_interpret"):
            self.tile_n = next(
                (c for c in (128, 256, 512, 1024) if n <= c),
                round_up(n, 1024),
            )
        elif fmt == "ell":
            self.tile_n = n
        else:
            self.tile_n = cfg.resolve_tile_n(n)
        self.n_padded = round_up(n, self.tile_n)

        axis = mesh.axis_names[0]
        m, k = self.m, self.k
        S = sharded.n_shards
        m_padded = sharded.m_padded  # divisible by S by construction
        k_local = sharded.k_padded
        n_, n_padded = n, self.n_padded
        tile_n = self.tile_n

        kernel_kwargs = dict(
            tile_m=cfg.tile_m,
            window_k=cfg.window_k,
            block_k=cfg.block_k,
            group_blocks=cfg.group_blocks,
        )

        def local_step(vals, qrow, bcol, gmt, gkw, b_loc, c_loc, alpha, beta):
            vals, qrow, bcol = vals[0], qrow[0], bcol[0]
            gmt, gkw, b_loc, c_loc = gmt[0], gkw[0], b_loc[0], c_loc[0]
            zeros_c = jnp.zeros((m_padded, b_loc.shape[1]), dtype=jnp.float32)
            one, zero = jnp.float32(1.0), jnp.float32(0.0)
            if backend in ("ell", "ell_pallas", "ell_pallas_interpret"):
                # each chip gathers from its own K slab of B; virtual hub
                # rows beyond the global padded M are folded before the
                # reduce-scatter (the slice drops them)
                zeros_l = jnp.zeros(
                    (vals.shape[0], b_loc.shape[1]), dtype=jnp.float32
                )
                if backend == "ell":
                    from sextans_tpu.ops.spmm_ell_xla import spmm_ell_padded

                    partial_ab = spmm_ell_padded(
                        vals, qrow, bcol, b_loc, zeros_l, one, zero,
                        m_block=cfg.tile_m, m_base=m_padded, with_c=False,
                    )[:m_padded]
                else:
                    from sextans_tpu.ops.spmm_ell_pallas import (
                        spmm_ell_gather_padded,
                    )

                    partial_ab = spmm_ell_gather_padded(
                        vals, qrow, bcol, b_loc, zeros_l, one, zero,
                        m_block=cfg.tile_m if cfg.tile_m % 256 else 256,
                        m_base=m_padded, with_c=False,
                        interpret=(backend == "ell_pallas_interpret"),
                    )[:m_padded]
            elif backend == "xla":
                from sextans_tpu.ops.spmm_xla import spmm_xla_padded

                partial_ab = spmm_xla_padded(
                    vals, qrow, bcol, gmt, gkw, b_loc, zeros_c, one, zero,
                    **kernel_kwargs,
                )
            elif backend in ("edge", "edge_interpret"):
                from sextans_tpu.ops.spmm_edge_pallas import spmm_edge_padded

                partial_ab = spmm_edge_padded(
                    vals, qrow, gmt, gkw, b_loc, zeros_c, one, zero,
                    tile_m=cfg.tile_m,
                    window_k=cfg.window_k,
                    edge_chunk=cfg.edge_chunk,
                    edge_lanes=cfg.edge_lanes,
                    tile_n=tile_n,
                    interpret=(backend == "edge_interpret"),
                    with_c=False,
                )
            elif backend in ("mxu", "mxu_interpret"):
                from sextans_tpu.ops.spmm_mxu_pallas import spmm_mxu_padded

                partial_ab = spmm_mxu_padded(
                    vals, qrow, bcol, gmt, gkw, b_loc, zeros_c, one, zero,
                    **kernel_kwargs,
                    tile_n=tile_n,
                    interpret=(backend == "mxu_interpret"),
                    unroll=cfg.chunk_unroll,
                    precise=cfg.precise,
                    with_c=False,
                )
            else:
                from sextans_tpu.ops.spmm_pallas import spmm_pallas_padded

                partial_ab = spmm_pallas_padded(
                    vals, qrow, bcol, gmt, gkw, b_loc, zeros_c, one, zero,
                    **kernel_kwargs,
                    tile_n=tile_n,
                    interpret=(backend == "pallas_interpret"),
                    n_acc=cfg.n_acc,
                    chunk_unroll=cfg.chunk_unroll,
                    with_c=False,
                )
            slab = jax.lax.psum_scatter(
                partial_ab, axis, scatter_dimension=0, tiled=True
            )
            return (alpha * slab + beta * c_loc)[None]

        shard_spec = P(axis)
        inner = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(shard_spec,) * 7 + (P(), P()),
            out_specs=shard_spec,
            check_vma=False,
        )

        def step(vals, qrow, bcol, gmt, gkw, b, c, alpha, beta):
            b_p = jnp.pad(b, ((0, S * k_local - k), (0, n_padded - n_)))
            b_stacked = b_p.reshape(S, k_local, n_padded)
            c_p = jnp.pad(c, ((0, m_padded - m), (0, n_padded - n_)))
            c_stacked = c_p.reshape(S, m_padded // S, n_padded)
            out = inner(
                vals, qrow, bcol, gmt, gkw, b_stacked, c_stacked, alpha, beta
            )
            return out.reshape(m_padded, n_padded)[:m, :n_]

        self._jit = jax.jit(step)

        def _make_repeat(times):
            def rep(vals, qrow, bcol, gmt, gkw, b, c, alpha, beta):
                b_p = jnp.pad(b, ((0, S * k_local - k), (0, n_padded - n_)))
                b_stacked = b_p.reshape(S, k_local, n_padded)
                c_p = jnp.pad(c, ((0, m_padded - m), (0, n_padded - n_)))
                c_stacked = c_p.reshape(S, m_padded // S, n_padded)

                def body(_, c_acc):
                    return inner(
                        vals, qrow, bcol, gmt, gkw, b_stacked, c_acc,
                        alpha, beta,
                    )

                out = jax.lax.fori_loop(0, times, body, c_stacked)
                return out.reshape(m_padded, n_padded)[:m, :n_]

            return jax.jit(rep)

        self._repeat_cache = {}
        self._make_repeat = _make_repeat

        ns = NamedSharding(mesh, shard_spec)
        self._dev = (
            jax.device_put(jnp.asarray(sharded.vals), ns),
            jax.device_put(jnp.asarray(sharded.qrow), ns),
            jax.device_put(jnp.asarray(sharded.bcol), ns),
            jax.device_put(jnp.asarray(sharded.group_mtile), ns),
            jax.device_put(jnp.asarray(sharded.group_kwin), ns),
        )

    def _check_bc(self, b, beta, c):
        b = jnp.asarray(b, dtype=jnp.float32)
        if b.shape != (self.k, self.n):
            raise ValueError(f"B must be ({self.k}, {self.n}), got {b.shape}")
        if c is None:
            if float(beta) != 0.0:
                raise ValueError("beta != 0 requires an input C")
            c = jnp.zeros((self.m, self.n), dtype=jnp.float32)
        else:
            c = jnp.asarray(c, dtype=jnp.float32)
            if c.shape != (self.m, self.n):
                raise ValueError(f"C must be ({self.m}, {self.n}), got {c.shape}")
        return b, c

    def __call__(self, b, alpha=1.0, beta=0.0, c=None) -> jax.Array:
        b, c = self._check_bc(b, beta, c)
        return self._jit(
            *self._dev, b, c, jnp.float32(alpha), jnp.float32(beta)
        )

    def repeat(self, b, alpha=1.0, beta=0.0, c=None, times: int = 1) -> jax.Array:
        b, c = self._check_bc(b, beta, c)
        if times not in self._repeat_cache:
            self._repeat_cache[times] = self._make_repeat(times)
        return self._repeat_cache[times](
            *self._dev, b, c, jnp.float32(alpha), jnp.float32(beta)
        )


def spmm_sharded(
    sharded: ShardedSpMatrix,
    b,
    alpha: float = 1.0,
    beta: float = 0.0,
    c=None,
    *,
    mesh: Optional[Mesh] = None,
    backend: str = "auto",
) -> jax.Array:
    """Row-block sharded C = alpha*A@B + beta*C over the mesh.

    ``b`` is (K, N) replicated; ``c`` is (M, N) row-sharded like the result.
    Returns the global (M, N) array (sharded; materialize with np.asarray).
    One-shot convenience over :class:`ShardedSpmmPlan` (which is cached on
    the sharded matrix for reuse).
    """
    b = jnp.asarray(b, dtype=jnp.float32)
    if b.ndim != 2 or b.shape[0] != sharded.k:
        raise ValueError(f"B must be ({sharded.k}, N), got {b.shape}")
    n = b.shape[1]
    cache = getattr(sharded, "_plan_cache", None)
    if cache is None:
        cache = {}
        sharded._plan_cache = cache
    key = (n, backend, None if mesh is None else id(mesh))
    if key not in cache:
        cache[key] = ShardedSpmmPlan(sharded, n, mesh=mesh, backend=backend)
    return cache[key](b, alpha, beta, c)


def spmm_sharded_k(
    sharded: ShardedSpMatrix,
    b,
    alpha: float = 1.0,
    beta: float = 0.0,
    c=None,
    *,
    mesh: Optional[Mesh] = None,
    backend: str = "auto",
) -> jax.Array:
    """K-sharded C = alpha*A@B + beta*C with an ICI reduce-scatter.

    A is column-slab sharded and B row-slab sharded along K; each chip
    computes a full-M partial product, then ``psum_scatter`` sums the
    partials over ICI while scattering C rows — the chip-parallel rebirth of
    the reference's 8-channel A / 4-channel B HBM streaming
    (link_config.ini:2-34). The alpha/beta epilogue is applied after the
    reduction on the C-owning chip.

    Cached convenience over :class:`ShardedSpmmPlanK`: the packed shards are
    uploaded to the mesh once per (N, backend, mesh) and reused across calls.
    """
    b = jnp.asarray(b, dtype=jnp.float32)
    if b.ndim != 2 or b.shape[0] != sharded.k:
        raise ValueError(f"B must be ({sharded.k}, N), got {b.shape}")
    n = b.shape[1]
    cache = getattr(sharded, "_plan_cache", None)
    if cache is None:
        cache = {}
        sharded._plan_cache = cache
    key = (n, backend, None if mesh is None else id(mesh))
    if key not in cache:
        cache[key] = ShardedSpmmPlanK(sharded, n, mesh=mesh, backend=backend)
    return cache[key](b, alpha, beta, c)
