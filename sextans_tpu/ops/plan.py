"""SpmmPlan: a reusable, device-resident execution plan for one packed matrix.

The reference host uploads A/B/C channel buffers once and then invokes the
kernel rp_time times in-device (src/sextans-host.cpp:236-252). The TPU analog:
``SpmmPlan`` device-puts the packed arrays once and jit-compiles a single
program that pads B/C, runs the kernel backend, and slices the result — so a
steady-state call moves only B and C, with zero host-side repacking.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sextans_tpu.format.pack import PackedSpMatrix
from sextans_tpu.format.pack_edge import PackedSpMatrixEdge
from sextans_tpu.format.pack_ell import PackedSpMatrixELL
from sextans_tpu.format.pack_mxu import PackedSpMatrixMXU
from sextans_tpu.utils.config import round_up

__all__ = ["SpmmPlan", "retry_transient_compile"]


def retry_transient_compile(fn, *args, attempts: int = 3):
    """Call ``fn(*args)``, retrying on transient remote-compile failures.

    The TPU compile service behind the runtime occasionally returns
    HTTP 500 (``tpu_compile_helper subprocess exit code 1``) for configs
    that compile fine on retry — observed repeatedly on v5e for shapes that
    had already run in earlier sessions. A failed compile is not cached, so
    re-invoking re-submits it. Genuine errors (VMEM guard ValueError, shape
    errors, deterministic compiler rejections) re-raise immediately on the
    last attempt and are never masked: only the remote_compile/HTTP 500
    signature is retried.
    """
    import time as _time

    for i in range(attempts):
        try:
            return fn(*args)
        except Exception as e:  # noqa: BLE001 — filtered by signature below
            msg = str(e)
            # Deterministic compiler rejections also arrive wrapped in
            # HTTP 500 — a scoped-VMEM OOM ("Ran out of memory in memory
            # space vmem ... limit 16.00M") reproduces identically; don't
            # burn retries on it.
            deterministic = (
                "Ran out of memory" in msg or "RESOURCE_EXHAUSTED" in msg
            )
            transient = (
                not deterministic
                and ("remote_compile" in msg or "HTTP 500" in msg)
            )
            if not transient or i == attempts - 1:
                raise
            _time.sleep(1.5 * (i + 1))


class SpmmPlan:
    """Compiled SpMM executor for a fixed (packed A, N, backend).

    Accepts both packed formats: the VPU 8-row block format
    (format/pack.py → backends "pallas"/"xla") and the MXU dense-slab format
    (format/pack_mxu.py → backend "mxu").
    """

    def __init__(
        self,
        packed,
        n: int,
        backend: str = "auto",
        tile_n: Optional[int] = None,
    ):
        is_mxu = isinstance(packed, PackedSpMatrixMXU)
        is_edge = isinstance(packed, PackedSpMatrixEdge)
        is_ell = isinstance(packed, PackedSpMatrixELL)
        if backend == "auto":
            # SEXTANS_TPU_BACKEND overrides auto-detection — the analog of the
            # reference's TAPAB env var selecting the bitstream
            # (src/sextans-host.cpp:232-234).
            import os

            on_tpu = jax.devices()[0].platform == "tpu"
            backend = os.environ.get("SEXTANS_TPU_BACKEND") or (
                # on TPU the Pallas chunk-gather engine replaces the XLA
                # take (which lowers to a serialized full-latency loop
                # there); off-TPU the XLA engine is the fast path
                ("ell_pallas" if on_tpu else "ell")
                if is_ell
                else ("edge" if on_tpu else "edge_interpret")
                if is_edge
                else ("mxu" if is_mxu else "pallas")
                if on_tpu
                else ("mxu_interpret" if is_mxu else "xla")
            )
        if (
            is_mxu != (backend in ("mxu", "mxu_interpret"))
            or is_edge != (backend in ("edge", "edge_interpret"))
            or is_ell
            != (backend in ("ell", "ell_pallas", "ell_pallas_interpret"))
        ):
            raise ValueError(
                f"backend {backend!r} does not match packed format "
                f"{type(packed).__name__}"
            )
        self.backend = backend
        self.packed = packed
        cfg = packed.config
        self.m, self.k = packed.shape
        self.n = n
        if backend in ("ell_pallas", "ell_pallas_interpret"):
            # chunk-gather kernel: N panels are whole 128-lane tiles and the
            # 4 KiB chunk shape fixes n_padded to a divisor/multiple of 1024
            np_allowed = next(
                (c for c in (128, 256, 512, 1024) if n <= c),
                round_up(n, 1024),
            )
            self.tile_n = tile_n or np_allowed
        elif is_ell:
            # pure-XLA gather engine: no lane-tile constraint, and padding N
            # would inflate every gathered B row (8x at N=16)
            self.tile_n = tile_n or n
        else:
            self.tile_n = tile_n or cfg.resolve_tile_n(n)
        self.n_padded = round_up(n, self.tile_n)

        # One-time device upload of the packed operand (edge format carries
        # a single meta array; a 1-int placeholder keeps the 5-tuple shape).
        # The upload is memoized on the packed object so plans for other N
        # values (or repeated plan construction) reuse the device copy —
        # on 45M-nnz matrices the multi-GB transfer through the tunnel
        # dominated round-2 suite rows.
        dev_cache = packed.__dict__.setdefault("_dev_cache", {})
        dev_key = ("dev", jax.devices()[0].id, jax.devices()[0].platform)
        if dev_key in dev_cache:
            self._dev = dev_cache[dev_key]
        elif is_ell:
            ph = jnp.zeros((1,), jnp.int32)
            self._dev = (
                jnp.asarray(packed.vals),
                jnp.asarray(packed.cols),
                jnp.asarray(packed.fold_rows),
                ph,
                ph,
            )
            dev_cache[dev_key] = self._dev
        else:
            self._dev = (
                jnp.asarray(packed.vals),
                jnp.asarray(
                    packed.meta
                    if is_edge
                    else (packed.qm if is_mxu else packed.qrow)
                ),
                jnp.asarray(
                    jnp.zeros((1,), jnp.int32) if is_edge else packed.bcol
                ),
                jnp.asarray(packed.group_mtile),
                jnp.asarray(packed.group_kwin),
            )
            dev_cache[dev_key] = self._dev

        m, k = self.m, self.k
        m_padded, k_padded = packed.m_padded, packed.k_padded
        n_, n_padded = self.n, self.n_padded
        kernel_kwargs = dict(
            tile_m=cfg.tile_m,
            window_k=cfg.window_k,
            block_k=cfg.block_k,
            group_blocks=cfg.group_blocks,
        )

        if backend == "ell":
            from sextans_tpu.ops.spmm_ell_xla import spmm_ell_padded

            ell_kwargs = dict(
                m_block=cfg.tile_m, m_base=packed.m_base, precise=cfg.precise
            )

            def run(vals, cols_a, fold_a, _gmt, _gkw, b_p, c_p, alpha, beta,
                    with_c=True, **_):
                return spmm_ell_padded(
                    vals, cols_a, fold_a, b_p, c_p, alpha, beta,
                    with_c=with_c, **ell_kwargs,
                )

            kernel_kwargs = {}
            extra = {}
        elif backend in ("ell_pallas", "ell_pallas_interpret"):
            from sextans_tpu.ops.spmm_ell_pallas import spmm_ell_gather_padded

            # SMEM holds the (ng, 8, R) chunk-index block; cap the grid
            # step at 256 rows (ng=32) — m_block=1024 exceeds the scalar
            # memory budget (compile failure observed on v5e)
            ell_mb = cfg.tile_m if cfg.tile_m % 256 else 256
            ellp_kwargs = dict(
                m_block=ell_mb,
                m_base=packed.m_base,
                interpret=(backend == "ell_pallas_interpret"),
                precise=cfg.precise,
            )

            def run(vals, cols_a, fold_a, _gmt, _gkw, b_p, c_p, alpha, beta,
                    with_c=True, **_):
                return spmm_ell_gather_padded(
                    vals, cols_a, fold_a, b_p, c_p, alpha, beta,
                    with_c=with_c, **ellp_kwargs,
                )

            kernel_kwargs = {}
            extra = {}
        elif backend == "xla":
            from sextans_tpu.ops.spmm_xla import spmm_xla_padded as run

            extra = {}
        elif backend in ("mxu", "mxu_interpret") and n <= 32:
            # Skinny-N: C-transposed contraction — the MXU streams only
            # n_ct rows per block instead of 128, and every output lane is
            # an M column (ops/spmm_mxu_pallas.py spmm_mxu_ct_padded).
            from sextans_tpu.ops.spmm_mxu_pallas import spmm_mxu_ct_padded

            n_ct = round_up(max(n, 1), 8)
            ct_kwargs = dict(
                tile_m=cfg.tile_m,
                window_k=cfg.window_k,
                block_k=cfg.block_k,
                group_blocks=cfg.group_blocks,
                n_ct=n_ct,
                interpret=(backend == "mxu_interpret"),
                unroll=cfg.chunk_unroll,
                precise=cfg.precise,
            )

            def run(vals, qm_a, bcol_a, gmt, gkw, b_p, c_p, alpha, beta,
                    with_c=True, **_):
                ct_p = jnp.transpose(c_p[:, :n_ct])
                out = spmm_mxu_ct_padded(
                    vals, qm_a, bcol_a, gmt, gkw, b_p, ct_p, alpha, beta,
                    with_c=with_c, **ct_kwargs,
                )
                return jnp.pad(
                    jnp.transpose(out), ((0, 0), (0, c_p.shape[1] - n_ct))
                )

            extra = {}
        elif backend in ("mxu", "mxu_interpret"):
            from sextans_tpu.ops.spmm_mxu_pallas import spmm_mxu_padded as run

            extra = dict(
                tile_n=self.tile_n,
                interpret=(backend == "mxu_interpret"),
                unroll=cfg.chunk_unroll,
                precise=cfg.precise,
            )
        elif backend in ("edge", "edge_interpret"):
            from sextans_tpu.ops.spmm_edge_pallas import spmm_edge_padded

            edge_kwargs = dict(
                tile_m=cfg.tile_m,
                window_k=cfg.window_k,
                edge_chunk=cfg.edge_chunk,
                edge_lanes=cfg.edge_lanes,
                tile_n=self.tile_n,
                interpret=(backend == "edge_interpret"),
                masked=cfg.edge_masked,
                precise=cfg.precise,
            )

            def run(vals, meta, _ph, gmt, gkw, b_p, c_p, alpha, beta,
                    with_c=True, **_):
                return spmm_edge_padded(
                    vals, meta, gmt, gkw, b_p, c_p, alpha, beta,
                    with_c=with_c, **edge_kwargs,
                )

            kernel_kwargs = {}
            extra = {}
        elif backend in ("pallas", "pallas_interpret"):
            from sextans_tpu.ops.spmm_pallas import spmm_pallas_padded as run

            extra = dict(
                tile_n=self.tile_n,
                interpret=(backend == "pallas_interpret"),
                n_acc=cfg.n_acc,
                chunk_unroll=cfg.chunk_unroll,
                precise=cfg.precise,
            )
        else:
            raise ValueError(f"unknown backend {backend!r}")

        col_perm = (
            jnp.asarray(packed.col_perm) if packed.col_perm is not None else None
        )
        row_perm = (
            jnp.asarray(getattr(packed, "row_perm", None))
            if getattr(packed, "row_perm", None) is not None
            else None
        )
        if row_perm is not None:
            import numpy as _np

            inv = _np.empty(m, dtype=_np.int32)
            inv[packed.row_perm] = _np.arange(m, dtype=_np.int32)
            inv_row = jnp.asarray(inv)
        else:
            inv_row = None

        def _permute_b(b):
            # degree-sorted pack: feed the kernel B rows in packed column order
            return b if col_perm is None else b[col_perm]

        def _permute_c(c):
            # 2-D reorder: the kernel works in row-permuted space; C rows
            # are gathered in here and scattered back in _unpermute_out
            return c if row_perm is None else c[row_perm]

        def _unpermute_out(out):
            return out if inv_row is None else out[inv_row]

        def _step(vals, qrow, bcol, gmt, gkw, b, c, alpha, beta):
            b_p = jnp.pad(_permute_b(b), ((0, k_padded - k), (0, n_padded - n_)))
            c_p = jnp.pad(_permute_c(c), ((0, m_padded - m), (0, n_padded - n_)))
            out = run(
                vals, qrow, bcol, gmt, gkw, b_p, c_p, alpha, beta,
                **kernel_kwargs, **extra,
            )
            return _unpermute_out(out[:m, :n_])

        self._jit = jax.jit(_step)

        # beta == 0 / no-C fast path: the Pallas kernels drop the C_in stream
        # entirely (saves an M x N HBM read per call).
        self._jit_noc = None
        if backend in ("pallas", "pallas_interpret", "mxu", "mxu_interpret",
                       "edge", "edge_interpret", "ell", "ell_pallas",
                       "ell_pallas_interpret"):

            def _step_noc(vals, qrow, bcol, gmt, gkw, b, alpha):
                b_p = jnp.pad(_permute_b(b), ((0, k_padded - k), (0, n_padded - n_)))
                c_shape = jnp.zeros((m_padded, n_padded), jnp.float32)
                out = run(
                    vals, qrow, bcol, gmt, gkw, b_p, c_shape, alpha,
                    jnp.float32(0.0), **kernel_kwargs, **extra, with_c=False,
                )
                return _unpermute_out(out[:m, :n_])

            self._jit_noc = jax.jit(_step_noc)

        def _repeat(times):
            def rep(vals, qrow, bcol, gmt, gkw, b, c, alpha, beta):
                b_p = jnp.pad(_permute_b(b), ((0, k_padded - k), (0, n_padded - n_)))
                # repeat chain runs entirely in row-permuted space; the
                # gather/scatter sit outside the timed loop
                c_p = jnp.pad(_permute_c(c), ((0, m_padded - m), (0, n_padded - n_)))

                def body(_, c_acc):
                    # Pure-XLA backends only: tie B to the loop carry so LICM cannot
                    # hoist the (loop-invariant) A@B out of the timing loop.
                    # The perturbation is ~1e-38 * |C| — absorbed by float32
                    # rounding. The Pallas kernel is an opaque call consuming
                    # the carry, so it is unhoistable as-is and skips the
                    # full-B copy this would cost per iteration.
                    if backend in ("xla", "ell"):
                        b_i = b_p + c_acc[0:1, 0:1] * jnp.float32(1e-38)
                    else:
                        b_i = b_p
                    return run(
                        vals, qrow, bcol, gmt, gkw, b_i, c_acc, alpha, beta,
                        **kernel_kwargs, **extra,
                    )

                out = jax.lax.fori_loop(0, times, body, c_p)
                return _unpermute_out(out[:m, :n_])

            return jax.jit(rep)

        self._repeat_cache = {}
        self._make_repeat = _repeat

    def repeat(self, b, alpha=1.0, beta=0.0, c=None, times: int = 1) -> jax.Array:
        """Run the kernel ``times`` times in-device, feeding C back each
        iteration — ONE dispatch. The exact analog of the reference's
        rp_time loop (P_N bits 31:16, src/sextans-host.cpp:223;
        src/sextans.cpp:54-60): timing this and dividing by ``times``
        excludes all host dispatch overhead."""
        if times not in self._repeat_cache:
            self._repeat_cache[times] = self._make_repeat(times)
        b = jnp.asarray(b, dtype=jnp.float32)
        if b.shape != (self.k, self.n):
            raise ValueError(f"B must be ({self.k}, {self.n}), got {b.shape}")
        if c is None:
            if float(beta) != 0.0:
                raise ValueError("beta != 0 requires an input C")
            c = jnp.zeros((self.m, self.n), dtype=jnp.float32)
        else:
            c = jnp.asarray(c, dtype=jnp.float32)
        return retry_transient_compile(
            self._repeat_cache[times],
            *self._dev, b, c, jnp.float32(alpha), jnp.float32(beta),
        )

    def __call__(self, b, alpha=1.0, beta=0.0, c=None) -> jax.Array:
        b = jnp.asarray(b, dtype=jnp.float32)
        if b.shape != (self.k, self.n):
            raise ValueError(f"B must be ({self.k}, {self.n}), got {b.shape}")
        if c is None:
            if float(beta) != 0.0:
                raise ValueError("beta != 0 requires an input C")
            if self._jit_noc is not None:
                return retry_transient_compile(
                    self._jit_noc, *self._dev, b, jnp.float32(alpha)
                )
            c = jnp.zeros((self.m, self.n), dtype=jnp.float32)
        else:
            c = jnp.asarray(c, dtype=jnp.float32)
            if c.shape != (self.m, self.n):
                raise ValueError(f"C must be ({self.m}, {self.n}), got {c.shape}")
        return retry_transient_compile(
            self._jit, *self._dev, b, c, jnp.float32(alpha), jnp.float32(beta)
        )
