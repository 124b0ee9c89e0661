"""Host-side pack-cache warmer: pre-pack what the TPU suite will request.

The suite's wall-clock per row splits into host preprocessing (candidate
packs, hybrid splits, residue packs) and device work (upload, compile,
timing). On the one-CPU bench host, preprocessing for the big/scattered
tail costs minutes per row — time the TPU pass spends idle. This warmer
runs the SAME enumeration as ``suite.run_one`` (``suite.candidate_list``,
the hybrid gate, the stored-config store) purely on the host CPU and fills
the shared on-disk ``PackCache``, so a concurrent or subsequent TPU pass
finds every pack/split it asks for already on disk.

Run it ``nice -n 19`` next to a live TPU pass: it only consumes the CPU
the pass leaves idle (canary backoffs, device timing waits), and the pack
cache's atomic writes make concurrent access safe.

    nice -n 19 python benchmarks/prepack.py --scale full --n 16 128 512 \
        --covered benchmarks/results_r3.json
"""

from __future__ import annotations

import argparse
import sys
import time
import os
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))


def log(msg):
    print(f"[prepack {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def warm_row(name, coo, n, store, pack_cache, big_candidates=2):
    """Warm every pack run_one could request for (name, n)."""
    from benchmarks.suite import candidate_list, cover_upper_bound

    from sextans_tpu.utils.autotune import choose_backend, hybrid_cost

    base_ro = (False, False)
    key = f"{name}|n={n}"
    stored = store.get(key) if store is not None else None
    meta = (store.meta(key) or {}) if (store is not None and stored) else {}
    t0 = time.perf_counter()

    if stored is not None:
        fmt = meta.get("fmt", "vpu")
        if fmt.startswith("hybrid"):
            split = pack_cache.get_or_split(name, coo, n=n)
            res_fmt = fmt.split("+", 1)[1] if "+" in fmt else None
            if res_fmt is None and split.residue.nnz:
                res_fmt = choose_backend(split.residue, n=n)[0].fmt
            if res_fmt and split.residue.nnz:
                pack_cache.get_or_pack(
                    f"{name}@n{n}-residue", split.residue, stored, res_fmt
                )
        else:
            ro = (True, True) if meta.get("reorder2d") else base_ro
            pack_cache.get_or_pack(name, coo, stored, fmt, ro[0],
                                   reorder_rows=ro[1])
        # store-challenge path (run_one re-races hybrid when the model
        # predicts >=2x the stored GFLOPS): warm the split it would build
        if (not fmt.startswith("hybrid") and coo.nnz <= 20_000_000
                and meta.get("gflops")):
            if not (coo.nnz > 5_000_000 and cover_upper_bound(coo) < 0.3):
                pack_cache.get_or_split(name, coo, n=n)
        log(f"  {key}: stored-config warm in "
            f"{time.perf_counter() - t0:.1f}s")
        return

    # no stored winner: run_one decides hybrid-vs-blocked, then races.
    # Warm both sides.
    split = None
    if not (coo.nnz > 5_000_000 and cover_upper_bound(coo) < 0.3):
        cand = pack_cache.get_or_split(name, coo, n=n)
        dense_cover = (
            cand.diag_nnz + cand.head_nnz + cand.head_row_nnz
        ) / max(coo.nnz, 1)
        if dense_cover >= 0.3 and coo.nnz >= 50_000:
            full_cost = choose_backend(coo, n=n)[0].predicted_cost
            if hybrid_cost(cand, n=n) < 0.8 * full_cost:
                split = cand
    if split is not None:
        if split.residue.nnz:
            best = choose_backend(split.residue, n=n)[0]
            pack_cache.get_or_pack(
                f"{name}@n{n}-residue", split.residue, best.config, best.fmt
            )
        # the hybrid-vs-blocked race packs the best single-engine alt
        if coo.nnz <= 8_000_000:
            alt = choose_backend(coo, n=n, top=1)[0]
            pack_cache.get_or_pack(name, coo, alt.config, alt.fmt, False)
        log(f"  {key}: hybrid warm (cover path) in "
            f"{time.perf_counter() - t0:.1f}s")
        return

    cands = candidate_list(coo, coo, n, base_ro)
    # >8M-nnz matrices skip the race and take the first RUNNABLE candidate;
    # compile rejections can advance past the first, so warm a couple
    if coo.nnz > 8_000_000:
        cands = cands[:big_candidates]
    for cfg_i, fmt_i, ro_i in cands:
        pack_cache.get_or_pack(name, coo, cfg_i, fmt_i, ro_i[0],
                               reorder_rows=ro_i[1])
    log(f"  {key}: {len(cands)} candidate packs warm in "
        f"{time.perf_counter() - t0:.1f}s")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="full")
    ap.add_argument("--n", type=int, nargs="+", default=[16, 128, 512])
    ap.add_argument("--covered", default=None,
                    help="results json: skip (matrix, N) rows that already "
                         "have a canary-healthy sample")
    ap.add_argument("--only", default=None)
    ap.add_argument("--tuned-configs",
                    default=str(HERE / "tuned_configs.json"))
    args = ap.parse_args(argv)

    # host-only: never touch the TPU (a live benchmark pass owns it)
    import jax

    jax.config.update("jax_platforms", "cpu")
    # enumerate ELL candidates with the TPU engine's cost model even though
    # this process is CPU-pinned — the suite run we are warming for races
    # the Pallas chunk-gather engine (see choose_config_ell)
    os.environ.setdefault("SEXTANS_ELL_ENGINE", "pallas")

    from benchmarks.matrices import suite
    from benchmarks.suite import _gen_cached, load_covered

    from sextans_tpu.format.pack_cache import PackCache
    from sextans_tpu.utils.autotune import ConfigStore

    store = ConfigStore(args.tuned_configs) if args.tuned_configs else None
    pack_cache = PackCache()
    covered = load_covered(args.covered) if args.covered else set()
    if covered:
        log(f"skip-covered: {len(covered)} healthy rows in {args.covered}")

    for name, gen in suite(args.scale).items():
        if args.only and args.only not in name:
            continue
        todo_n = [n for n in args.n if (name, n) not in covered]
        if not todo_n:
            continue
        log(f"== {name} ==")
        coo = _gen_cached(name, gen)
        for n in todo_n:
            try:
                warm_row(name, coo, n, store, pack_cache)
            except Exception as e:
                log(f"  !! {name} N={n}: {e!r}")
    log(f"done: {pack_cache.misses} packed, {pack_cache.disk_hits} disk "
        f"hits, {pack_cache.hits} mem hits")
    return 0


if __name__ == "__main__":
    sys.exit(main())
