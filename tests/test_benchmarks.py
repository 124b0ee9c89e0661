"""Benchmark suite generator + runner tests."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.matrices import fem_like, kkt_like, powerlaw_like, suite
from benchmarks.suite import run_one


def test_fem_like_structure():
    coo = fem_like(3000, dofs=3, neighbors=9, seed=1)
    assert coo.shape == (3000, 3000)
    assert coo.nnz > 3000
    # FEM stand-in should have decent 8x8 block fill
    from sextans_tpu.utils.autotune import block_counts

    nb = block_counts(coo, (8,))[8]
    fill = coo.nnz / (nb * 64)
    assert fill > 0.05


def test_kkt_like_banded_three_scales():
    coo = kkt_like(8000, seed=2)
    assert coo.shape == (8000, 8000)
    spread = np.abs(coo.rows.astype(np.int64) - coo.cols.astype(np.int64))
    assert np.median(spread) < 8000 // 2  # banded-ish, not uniform


def test_powerlaw_has_hubs():
    coo = powerlaw_like(5000, avg_degree=8, seed=3)
    indeg = np.bincount(coo.cols, minlength=5000)
    assert indeg.max() > 20 * max(1, int(np.median(indeg[indeg > 0])))


def test_suite_registry():
    s = suite("small")
    assert "cant_like" in s and "webgraph_like" in s
    full = suite("full")
    assert "ldoor_like" in full and "nlpkkt80_like" in full


def test_run_one_tiny():
    coo = fem_like(600, dofs=3, neighbors=5, bandwidth=60, seed=9)
    rec = run_one("tiny", coo, 16, backend="xla", use_autotune=True, rp_time=2)
    assert rec["verify"] == "pass"
    assert rec["gflops"] > 0
    assert rec["block_fill"] > 0


def test_race_includes_2d_reorder_candidates(monkeypatch):
    """Hub-heavy matrices add 2-D reordered blocked candidates to the
    measured race (round-3 scattered-class lever)."""
    import io
    import contextlib

    import numpy as np

    from benchmarks import suite as suite_mod
    from sextans_tpu.format.coo import COOMatrix

    rng = np.random.default_rng(0)
    m = 512
    pop = rng.zipf(1.6, size=m).astype(np.float64)
    pop /= pop.sum()
    rows = rng.integers(0, m, 4000).astype(np.int32)
    cols = rng.choice(m, 4000, p=pop).astype(np.int32)
    lin = rows.astype(np.int64) * m + cols
    _, keep = np.unique(lin, return_index=True)
    coo = COOMatrix((m, m), rows[keep], cols[keep],
                    np.ones(keep.size, np.float32))

    # neutralize the expensive timing: every candidate 'measures' instantly
    import sextans_tpu.utils.timing as timing_mod

    monkeypatch.setattr(
        timing_mod, "time_repeat",
        lambda plan, b, a, be, c, times=1, detail=False:
            (1e-3, {"method": "differential", "times": times})
            if detail else 1e-3)
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        rec = suite_mod.run_one(
            "hubtest", coo, 16, "xla", True, verify_gate=True, hybrid="off",
        )
    assert rec["verify"] == "pass"
    assert "2d-reorder candidates added" in err.getvalue()


def test_store_challenge_reopens_hybrid_gate(tmp_path, monkeypatch):
    """A stored first-pass winner is challenged when the current hybrid
    model predicts >=2x its measured GFLOPS (round-3: improved DIA lift
    must not be frozen out by earlier passes)."""
    import contextlib
    import io

    import numpy as np

    from benchmarks import suite as suite_mod
    from sextans_tpu.format.coo import COOMatrix
    from sextans_tpu.utils.autotune import ConfigStore
    from sextans_tpu.utils.config import SpmmConfig

    # circuit-band matrix: near-total DIA cover under the cost-based lift
    rng = np.random.default_rng(2)
    m = 60000
    diag = np.arange(m, dtype=np.int64)
    lr = rng.integers(0, m, m * 4)
    lc = np.clip(lr + rng.integers(-40, 41, m * 4), 0, m - 1)
    rows = np.concatenate([diag, lr])
    cols = np.concatenate([diag, lc])
    lin = rows * m + cols
    _, keep = np.unique(lin, return_index=True)
    coo = COOMatrix((m, m), rows[keep].astype(np.int32),
                    cols[keep].astype(np.int32),
                    np.ones(keep.size, np.float32))

    store = ConfigStore(tmp_path / "tuned.json")
    # a frozen slow blocked winner (the round-3 scircuit situation)
    store.put("hubchal|n=16", SpmmConfig(), fmt="vpu", gflops=2.0)

    import sextans_tpu.utils.timing as timing_mod

    monkeypatch.setattr(
        timing_mod, "time_repeat",
        lambda plan, b, a, be, c, times=1, detail=False:
            (1e-3, {"method": "differential", "times": times})
            if detail else 1e-3)
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        rec = suite_mod.run_one(
            "hubchal", coo, 16, "xla", True, verify_gate=True, store=store,
        )
    assert "store challenge" in err.getvalue()
    assert rec["fmt"].startswith("hybrid")
    assert rec["verify"] == "pass"


def test_reverse_store_challenge_reraces_stale_hybrid(tmp_path, monkeypatch):
    """A stored slow HYBRID winner is cleared for re-racing when the model's
    best single-engine prediction is >=2x its stored GFLOPS (round-3: a
    frozen 1.6 GFLOPS hybrid decision on mac_econ N=16)."""
    import contextlib
    import io

    from benchmarks import suite as suite_mod
    from sextans_tpu.format.coo import COOMatrix
    from sextans_tpu.utils.autotune import ConfigStore
    from sextans_tpu.utils.config import SpmmConfig

    # banded matrix with decent diagonal cover so a hybrid split exists
    rng = np.random.default_rng(5)
    m = 20000
    diag = np.arange(m, dtype=np.int64)
    lr = rng.integers(0, m, m * 3)
    lc = np.clip(lr + rng.integers(-30, 31, m * 3), 0, m - 1)
    rows = np.concatenate([diag, lr])
    cols = np.concatenate([diag, lc])
    lin = rows * m + cols
    _, keep = np.unique(lin, return_index=True)
    coo = COOMatrix((m, m), rows[keep].astype(np.int32),
                    cols[keep].astype(np.int32),
                    np.ones(keep.size, np.float32))

    store = ConfigStore(tmp_path / "tuned.json")
    # a frozen, absurdly slow hybrid winner
    store.put("revchal|n=16", SpmmConfig(), fmt="hybrid", gflops=0.01)

    import sextans_tpu.utils.timing as timing_mod

    monkeypatch.setattr(
        timing_mod, "time_repeat",
        lambda plan, b, a, be, c, times=1, detail=False:
            (1e-3, {"method": "differential", "times": times})
            if detail else 1e-3)
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        rec = suite_mod.run_one(
            "revchal", coo, 16, "xla", True, verify_gate=True, store=store,
        )
    assert "reverse store challenge" in err.getvalue()
    assert rec["verify"] == "pass"


def test_csr_take_rows_matches_naive():
    from benchmarks.suite import _csr_take_rows
    from sextans_tpu.format.csr import CSRMatrix

    coo = fem_like(800, dofs=3, neighbors=5, seed=21)
    csr = CSRMatrix.from_coo(coo)
    rows = np.array([0, 3, 3, 17, 799, 798, 400], dtype=np.int64)
    sub = _csr_take_rows(csr, rows)
    assert sub.shape == (rows.size, 800)
    dense = np.zeros(coo.shape, np.float32)
    dense[coo.rows, coo.cols] = coo.vals
    sub_dense = np.zeros(sub.shape, np.float32)
    for i in range(rows.size):
        lo, hi = sub.indptr[i], sub.indptr[i + 1]
        sub_dense[i, sub.indices[lo:hi]] = sub.vals[lo:hi]
    np.testing.assert_array_equal(sub_dense, dense[rows])


def test_verify_sample_blocks_deterministic_and_bounded():
    from benchmarks.suite import _verify_sample_blocks

    b1 = _verify_sample_blocks(525625)
    b2 = _verify_sample_blocks(525625)
    assert b1 == b2  # deterministic (seeded jitter)
    assert all(0 <= s < e <= 525625 for s, e in b1)
    starts = [s for s, _ in b1]
    assert starts == sorted(starts)
    # strata span the full M range, not just a prefix
    assert b1[0][0] < 525625 // 8 and b1[-1][1] > 525625 * 7 // 8
    # tiny matrix degenerates gracefully
    assert _verify_sample_blocks(50) == [(0, 50)]


def test_run_one_sampled_verify(monkeypatch):
    """Huge-output rows verify a stratified row sample (the full fetch +
    full f64 oracle starved the 1-CPU host for tens of minutes)."""
    from benchmarks import suite as suite_mod

    coo = fem_like(1200, dofs=3, neighbors=5, bandwidth=80, seed=22)
    monkeypatch.setattr(suite_mod, "VERIFY_SAMPLE_BYTES", 1 << 10)
    rec = suite_mod.run_one(
        "tiny_sampled", coo, 16, backend="xla", use_autotune=False, rp_time=2
    )
    assert rec["verify"] == "pass"
    assert 0 < rec["verify_rows"] <= 1200
    assert "max_abs_vs_f64_ulp" in rec


def test_load_covered_skips_only_healthy_rows(tmp_path):
    """Coverage-first budgeting: a canonical row counts as covered only if
    it has a timing AND its canary was healthy; error rows and contended
    rows must be re-run by later passes."""
    import json

    from benchmarks.suite import load_covered

    doc = {
        "results": [
            # healthy merged row (carries its own session, overnight-style)
            {"matrix": "a", "n": 16, "gflops": 10.0,
             "canary_pre_ms": 0.4, "canary_post_ms": 0.45,
             "session": {"canary_healthy_ms": 0.5}},
            # contended row: canary above the session threshold
            {"matrix": "a", "n": 512, "gflops": 3.0,
             "canary_pre_ms": 2.0,
             "session": {"canary_healthy_ms": 0.5}},
            # error row: never timed
            {"matrix": "b", "n": 16, "error": "boom",
             "session": {"canary_healthy_ms": 0.5}},
        ]
    }
    p = tmp_path / "canon.json"
    p.write_text(json.dumps(doc))
    assert load_covered(p) == {("a", 16)}
    assert load_covered(tmp_path / "missing.json") == set()


def test_load_failed_collects_error_rows(tmp_path):
    """Error rows in the canonical file feed the deferral ordering (a
    deterministically-failing matrix must not starve never-attempted ones)."""
    import json

    from benchmarks.suite import load_failed

    doc = {
        "results": [
            {"matrix": "a", "n": 16, "gflops": 10.0},
            {"matrix": "b", "n": 512, "error": "RESOURCE_EXHAUSTED"},
            {"matrix": "c", "n": 16, "error": "boom"},
        ]
    }
    p = tmp_path / "canon.json"
    p.write_text(json.dumps(doc))
    assert load_failed(p) == {("b", 512), ("c", 16)}
    assert load_failed(tmp_path / "missing.json") == set()


def test_pack_dev_bytes_matches_upload_tuple():
    """The footprint gate's byte count must equal the arrays SpmmPlan
    actually uploads (ops/plan.py:150-163)."""
    from benchmarks.suite import _pack_dev_bytes
    from sextans_tpu.format.pack import pack
    from sextans_tpu.utils.config import SpmmConfig

    coo = fem_like(600, dofs=3, neighbors=4, bandwidth=60, seed=7)
    packed = pack(coo, SpmmConfig(tile_m=256, window_k=256, block_k=8,
                                  group_blocks=32))
    expect = (packed.vals.nbytes + packed.qrow.nbytes + packed.bcol.nbytes
              + packed.group_mtile.nbytes + packed.group_kwin.nbytes)
    assert _pack_dev_bytes(packed) == expect


def test_footprint_gate_skips_oversized_candidate(monkeypatch):
    """A candidate whose pack + dense extents exceed the HBM budget is
    skipped with race provenance instead of raising RESOURCE_EXHAUSTED
    (the ldoor N=512 livelock)."""
    from benchmarks import suite as suite_mod

    coo = fem_like(1200, dofs=3, neighbors=5, bandwidth=80, seed=22)
    monkeypatch.setattr(suite_mod, "HBM_BUDGET_BYTES", 1)  # gate everything
    try:
        suite_mod.run_one(
            "tiny_gated", coo, 16, backend="xla", use_autotune=True, rp_time=2
        )
    except Exception as e:
        assert "budget" in str(e) or isinstance(e, suite_mod._AllGated)
    else:
        raise AssertionError("expected every candidate to be gated")


def _hybrid_band_coo(seed=2, m=60000):
    """Circuit-band matrix: near-total DIA cover -> the hybrid gate fires."""
    import numpy as np

    from sextans_tpu.format.coo import COOMatrix

    rng = np.random.default_rng(seed)
    diag = np.arange(m, dtype=np.int64)
    lr = rng.integers(0, m, m * 4)
    lc = np.clip(lr + rng.integers(-40, 41, m * 4), 0, m - 1)
    rows = np.concatenate([diag, lr])
    cols = np.concatenate([diag, lc])
    lin = rows * m + cols
    _, keep = np.unique(lin, return_index=True)
    return COOMatrix((m, m), rows[keep].astype(np.int32),
                     cols[keep].astype(np.int32),
                     np.ones(keep.size, np.float32))


def test_untimeable_hybrid_falls_back_to_blocked_race(monkeypatch):
    """A hybrid plan whose compile/timing raises must not keep the row:
    the blocked race runs and its winner lands (webbase1M N=512: the
    hybrid+ell repeat chain OOMed and the whole row errored although the
    vpu candidate ran at ~52 ms)."""
    import contextlib
    import io

    from benchmarks import suite as suite_mod
    from sextans_tpu.ops import hybrid as hybrid_mod

    coo = _hybrid_band_coo()

    def boom(self, *a, **k):
        raise RuntimeError("synthetic hybrid compile OOM")

    monkeypatch.setattr(hybrid_mod.HybridSpmmPlan, "__call__", boom)

    import sextans_tpu.utils.timing as timing_mod

    monkeypatch.setattr(
        timing_mod, "time_repeat",
        lambda plan, b, a, be, c, times=1, detail=False:
            (1e-3, {"method": "differential", "times": times})
            if detail else 1e-3)
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        # backend="auto": the hybrid-vs-blocked race only runs for
        # auto/hybrid backends (the real suite path)
        rec = suite_mod.run_one("untimeable", coo, 16, "auto", True,
                                verify_gate=True)
    assert "hybrid compile/time failed" in err.getvalue()
    assert not rec["fmt"].startswith("hybrid")
    assert rec["verify"] == "pass"
    assert rec["gflops"] > 0


def test_time_repeat_chained_protocol():
    """The host-chained timing fallback returns a positive time with
    chained-* method provenance and matches the plan's semantics."""
    from sextans_tpu.format.pack import pack
    from sextans_tpu.ops.plan import SpmmPlan
    from sextans_tpu.utils.config import SpmmConfig
    from sextans_tpu.utils.timing import time_repeat_chained

    import numpy as np

    coo = fem_like(600, dofs=3, neighbors=4, bandwidth=60, seed=7)
    packed = pack(coo, SpmmConfig(tile_m=256, window_k=256, block_k=8,
                                  group_blocks=32))
    m, k = coo.shape
    b = np.ones((k, 16), np.float32)
    c = np.zeros((m, 16), np.float32)
    plan = SpmmPlan(packed, 16, backend="xla")
    secs, info = time_repeat_chained(plan, b, 0.85, -2.06, c, times=2,
                                     detail=True)
    assert secs > 0
    assert info["method"].startswith("chained-")


def test_measure_falls_back_to_chained_timing(monkeypatch):
    """run_one lands a timed row even when the in-device repeat chain
    cannot compile (jit(rep) HBM OOM): timing provenance says chained-*."""
    import contextlib
    import io

    from benchmarks import suite as suite_mod

    import sextans_tpu.utils.timing as timing_mod

    def rep_boom(plan, b, a, be, c, times=1, detail=False):
        raise RuntimeError("synthetic jit(rep) OOM")

    monkeypatch.setattr(timing_mod, "time_repeat", rep_boom)
    coo = fem_like(1200, dofs=3, neighbors=5, bandwidth=80, seed=22)
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        rec = suite_mod.run_one("chainfall", coo, 16, "xla",
                                use_autotune=False, rp_time=2)
    assert "falling back to host-chained timing" in err.getvalue()
    assert rec["gflops"] > 0
    assert rec["timing"]["method"].startswith("chained-")


def test_force_race_ignores_stored_winner(tmp_path, monkeypatch):
    """--force-race drops a stored winner even when the 2x challenge
    thresholds would keep it frozen (mac_econ N=16 sat at 1.6 GFLOPS for
    two rounds with only ~1.7x model headroom)."""
    import contextlib
    import io

    from benchmarks import suite as suite_mod
    from sextans_tpu.utils.autotune import ConfigStore
    from sextans_tpu.utils.config import SpmmConfig

    coo = fem_like(800, dofs=3, neighbors=4, bandwidth=60, seed=9)
    store = ConfigStore(tmp_path / "tuned.json")
    # stored winner with realistic GFLOPS: the 2x challenges stay closed
    store.put("frozen|n=16", SpmmConfig(), fmt="vpu", gflops=50.0)

    import sextans_tpu.utils.timing as timing_mod

    monkeypatch.setattr(
        timing_mod, "time_repeat",
        lambda plan, b, a, be, c, times=1, detail=False:
            (1e-3, {"method": "differential", "times": times})
            if detail else 1e-3)
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        rec_frozen = suite_mod.run_one(
            "frozen", coo, 16, "xla", True, verify_gate=True, store=store,
        )
    assert "tuned-config store hit" in err.getvalue()
    assert not rec_frozen.get("race")  # stored winner: no race ran

    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        rec = suite_mod.run_one(
            "frozen", coo, 16, "xla", True, verify_gate=True, store=store,
            force_race=True,
        )
    assert "force-race: ignoring stored winner" in err.getvalue()
    assert rec["verify"] == "pass"


def test_merge_stamps_gate_note_without_cmaxabs(tmp_path):
    """Retro gate accounting must not leave a silent meets_1e6_gate=false:
    r3-era rows carry c_max_abs=None AND gate_unreachable=None keys (the
    old `not in r` check skipped them) — they get the no-ulp note."""
    import json as _json

    from benchmarks.overnight import merge

    doc = {"session": {"nasa_canary_ms": 0.2, "canary_healthy_ms": 0.5},
           "results": [
               {"matrix": "old", "n": 16, "gflops": 10.0,
                "meets_1e6_gate": False, "gate_unreachable": None,
                "gate_note": None, "c_max_abs": None,
                "canary_pre_ms": 0.2, "canary_post_ms": 0.2},
               {"matrix": "ulp", "n": 16, "gflops": 10.0,
                "meets_1e6_gate": False, "gate_unreachable": None,
                "gate_note": None, "c_max_abs": 100.0,
                "canary_pre_ms": 0.2, "canary_post_ms": 0.2},
           ]}
    p = tmp_path / "pass_01.json"
    p.write_text(_json.dumps(doc))
    out = tmp_path / "merged.json"
    merge([p], out)
    rows = {r["matrix"]: r for r in _json.loads(out.read_text())["results"]}
    assert rows["old"]["gate_note"] == "precise-not-attempted:pre-r4-row-no-ulp"
    # c_max_abs=100 -> ulp(f32 100.0) ~ 7.6e-6 > 2e-6 -> structurally
    # unreachable for an f32 kernel
    assert rows["ulp"]["gate_unreachable"] is True


def test_merge_carries_gate_evidence_to_faster_winner(tmp_path):
    """The 1e-6 gate is a (matrix, N) workload property: a faster re-raced
    winner whose own precise attempt failed (compile outage) must inherit
    the gate banked on a slower healthy sample, not demote it to false."""
    import json as _json

    from benchmarks.overnight import merge

    ses = {"nasa_canary_ms": 0.2, "canary_healthy_ms": 0.5}
    gated = {
        "matrix": "amz", "n": 512, "gflops": 8.15, "fmt": "vpu",
        "meets_1e6_gate": True, "gate_note": "precise-gate:level1",
        "precise_sample": {"level": 1, "backend": "pallas",
                           "max_abs_vs_f64": 9.1e-07},
        "c_max_abs": 20.0,
        "canary_pre_ms": 0.2, "canary_post_ms": 0.2,
    }
    faster = {
        "matrix": "amz", "n": 512, "gflops": 27.97, "fmt": "ell",
        "meets_1e6_gate": False,
        "gate_note": "precise-failed:no-level-ran",
        "c_max_abs": 20.0,
        "canary_pre_ms": 0.2, "canary_post_ms": 0.2,
    }
    p1 = tmp_path / "pass_01.json"
    p1.write_text(_json.dumps({"session": ses, "results": [gated]}))
    p2 = tmp_path / "pass_02.json"
    p2.write_text(_json.dumps({"session": ses, "results": [faster]}))
    out = tmp_path / "merged.json"
    merge([p1, p2], out)
    rows = _json.loads(out.read_text())["results"]
    assert len(rows) == 1
    r = rows[0]
    assert r["gflops"] == 27.97  # headline stays the fastest healthy sample
    assert r["meets_1e6_gate"] is True  # gate rides the workload evidence
    assert r["gate_note"] == "precise-gate:level1(carried)"
    assert r["precise_sample"]["carried_from"] == str(p1)
    # a merged sample that is already the strongest evidence is untouched
    merge([p1], out)
    only = _json.loads(out.read_text())["results"][0]
    assert only["gate_note"] == "precise-gate:level1"
    assert "carried_from" not in only["precise_sample"]


def test_nsweep_resume_state_keeps_measured_drops_errors():
    from benchmarks.nsweep import resume_state

    prev = {"results": [
        {"matrix": "a", "n": 8, "gflops": 1.0},
        {"matrix": "a", "n": 16, "error": "RuntimeError(...)"},
        {"matrix": "b", "n": 8, "gflops": 2.0},
    ]}
    rows, done = resume_state(prev)
    assert done == {("a", 8), ("b", 8)}  # error cell gets retried
    assert [r["matrix"] for r in rows] == ["a", "b"]
    assert resume_state({}) == ([], set())


def test_bench_wait_for_quiet_pool(tmp_path, monkeypatch):
    import bench

    class Clock:
        def __init__(self):
            self.t = 0.0
            self.slept = []

        def time(self):
            return self.t

        def sleep(self, s):
            self.slept.append(s)
            self.t += s

    # no pid files -> returns immediately
    clk = Clock()
    bench.wait_for_quiet_pool(
        max_wait_s=100, _clock=clk, pidfiles=(str(tmp_path / "x.pid"),)
    )
    assert clk.slept == []

    # a live "scheduler" (this test process) with a matching marker waits
    # to the deadline; a non-matching cmdline is ignored (pid-reuse guard)
    pidfile = tmp_path / "night.pid"
    pidfile.write_text(str(__import__("os").getpid()))
    clk = Clock()
    bench.wait_for_quiet_pool(
        max_wait_s=70, poll_s=30, _clock=clk,
        pidfiles=(str(pidfile),), markers=(b"python",),
    )
    assert sum(clk.slept) == 70  # capped exactly at the deadline
    clk = Clock()
    bench.wait_for_quiet_pool(
        max_wait_s=70, _clock=clk,
        pidfiles=(str(pidfile),), markers=(b"no-such-marker",),
    )
    assert clk.slept == []  # pid alive but not a scheduler -> not busy

    # stale pid (unlikely-to-exist pid number) -> not busy
    pidfile.write_text("999999999")
    clk = Clock()
    bench.wait_for_quiet_pool(
        max_wait_s=70, _clock=clk, pidfiles=(str(pidfile),)
    )
    assert clk.slept == []


def test_bank_isolated_one_child_per_row_parent_never_writes(
    tmp_path, monkeypatch
):
    import json as _json
    import subprocess
    import types

    from benchmarks import precise_verify as pv

    results = tmp_path / "results.json"
    doc = {"results": [
        {"matrix": "a_like", "n": 16, "gflops": 1.0, "nnz": 10},
        {"matrix": "a_like", "n": 512, "gflops": 1.0, "nnz": 10},
        {"matrix": "b_like", "n": 512, "gflops": 1.0, "nnz": 99},
    ]}
    results.write_text(_json.dumps(doc))

    calls = []

    def fake_run(cmd, timeout=None):
        calls.append(cmd)
        # child banks its row by rewriting the results file (as the real
        # child does); b_like "fails" transiently (rc=1, no bank) on its
        # FIRST child and banks on the retry-pass child — the observed
        # compile-outage / HBM-contention failure mode
        cur = _json.loads(results.read_text())
        sel = (cmd[cmd.index("--only") + 1], int(cmd[cmd.index("--n") + 1]))
        first_b = sel[0] == "b_like" and sum(
            1 for c in calls if "b_like" in c
        ) == 1
        rc = 0
        for r in cur["results"]:
            if (r["matrix"], r["n"]) == sel:
                if first_b:
                    rc = 1
                else:
                    r["meets_1e6_gate"] = True
        results.write_text(_json.dumps(cur))
        return types.SimpleNamespace(returncode=rc)

    monkeypatch.setattr(subprocess, "run", fake_run)
    args = types.SimpleNamespace(
        results=str(results), tuned_configs="unused.json", deadline_ts=None
    )
    todo = [dict(r) for r in doc["results"]]
    rc = pv._bank_isolated(args, todo)
    assert rc == 0
    # 3 first-pass children + 1 retry child for the transient failure
    assert len(calls) == 4
    # every child carries --no-isolate (no recursive forking) + exact row
    assert all("--no-isolate" in c for c in calls)
    # children's updates survive (the parent never rewrites the file)
    final = _json.loads(results.read_text())
    banked = sorted((r["matrix"], r["n"]) for r in final["results"]
                    if r.get("meets_1e6_gate"))
    assert banked == [("a_like", 16), ("a_like", 512), ("b_like", 512)]


def test_bank_isolated_respects_deadline(tmp_path, monkeypatch):
    import json as _json
    import subprocess
    import types

    from benchmarks import precise_verify as pv

    results = tmp_path / "results.json"
    results.write_text(_json.dumps({"results": []}))
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("spawned")),
    )
    args = types.SimpleNamespace(
        results=str(results), tuned_configs="u.json", deadline_ts=1.0
    )
    rc = pv._bank_isolated(args, [{"matrix": "x", "n": 16}])
    assert rc == 0  # deadline in the past -> no children spawned


def test_nsweep_redo_drops_named_measured_cells():
    from benchmarks.nsweep import parse_redo, resume_state

    prev = {"results": [
        {"matrix": "a", "n": 64, "gflops": 79.0},
        {"matrix": "a", "n": 128, "gflops": 158.0},
    ]}
    redo = parse_redo(["a:64"])
    assert redo == {("a", 64)}
    rows, done = resume_state(prev, redo)
    assert done == {("a", 128)}  # the redone cell re-races
    assert [r["n"] for r in rows] == [128]
    assert parse_redo(None) == set()
