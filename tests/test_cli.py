"""CLI tests — parity with the reference host binary's interface
(src/sextans-host.cpp:26-48, output format :253-290)."""

import pytest

from sextans_tpu.cli import build_parser, main
from sextans_tpu.format.coo import COOMatrix
from sextans_tpu.io.mtx import write_mtx


@pytest.fixture
def small_mtx(tmp_path):
    coo = COOMatrix.random(64, 64, 400, seed=42)
    p = tmp_path / "small.mtx"
    write_mtx(p, coo)
    return p


def test_parser_positional_defaults():
    args = build_parser().parse_args(["m.mtx", "16"])
    assert args.rp_time == 1
    assert args.alpha == pytest.approx(0.85)
    assert args.beta == pytest.approx(-2.06)


def test_parser_full_positional():
    args = build_parser().parse_args(["m.mtx", "16", "5", "1.5", "-0.5"])
    assert (args.rp_time, args.alpha, args.beta) == (5, 1.5, -0.5)


def test_cli_end_to_end(small_mtx, capsys):
    rc = main([str(small_mtx), "16", "--backend", "xla"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Success!" in out
    assert "GFLOPS" in out
    assert "N = 16" in out


def test_cli_rounds_n_to_8(small_mtx, capsys):
    rc = main([str(small_mtx), "13", "--backend", "xla", "--skip-cpu"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "N = 16" in out  # tapa::round_up<8> semantics


def test_cli_alpha_beta(small_mtx, capsys):
    rc = main([str(small_mtx), "8", "1", "2.0", "0.0", "--backend", "xla"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "alpha = 2.0" in out
    assert "Success!" in out


def test_cli_save_packed(small_mtx, tmp_path, capsys):
    from sextans_tpu.format.pack import PackedSpMatrix

    dst = tmp_path / "packed.npz"
    rc = main(
        [str(small_mtx), "8", "--backend", "xla", "--skip-cpu",
         "--save-packed", str(dst)]
    )
    assert rc == 0
    p = PackedSpMatrix.load(dst)
    assert p.nnz == 400


def test_cli_config_overrides(small_mtx, capsys):
    rc = main(
        [str(small_mtx), "8", "--backend", "xla", "--tile-m", "32",
         "--window-k", "64", "--block-k", "4", "--group-blocks", "32"]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "Success!" in out


def test_cli_shards_row(small_mtx, capsys):
    """--shards drives the sharded executor on the virtual CPU mesh and
    prints per-shard stats (VERDICT r2 item 8: L5 parity for multi-chip)."""
    rc = main([str(small_mtx), "16", "--backend", "xla", "--shards", "4",
               "--tile-m", "16", "--window-k", "32"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Success!" in out
    assert "4 shards (row-mode" in out
    assert "per-shard nnz" in out
    assert "imbalance" in out


def test_cli_shards_k_mode(small_mtx, capsys):
    rc = main([str(small_mtx), "16", "--backend", "xla", "--shards", "2",
               "--shard-mode", "k", "--tile-m", "16", "--window-k", "32"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Success!" in out
    assert "2 shards (k-mode" in out


def test_cli_shards_contiguous_balance(small_mtx, capsys):
    rc = main([str(small_mtx), "16", "--backend", "xla", "--shards", "2",
               "--shard-balance", "contiguous", "--tile-m", "16",
               "--window-k", "32"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Success!" in out


def test_cli_ell_backend(small_mtx, capsys):
    rc = main([str(small_mtx), "16", "--backend", "ell"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Success!" in out


def test_cli_ell_rejects_reorder(small_mtx):
    with pytest.raises(SystemExit):
        main([str(small_mtx), "16", "--backend", "ell", "--reorder-cols"])
