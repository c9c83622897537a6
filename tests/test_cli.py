"""CLI / benchmark-driver behavior (reference protocol parity:
src/main.cu:74-217)."""

import json
import os

import numpy as np
import pytest

from mh_spgemm_tpu.bench.driver import main as cli_main
from mh_spgemm_tpu.bench import gen
from mh_spgemm_tpu.io.mmio import write_mtx


@pytest.fixture
def tiny_mtx(tmp_path):
    p = str(tmp_path / "tiny" / "tiny.mtx")
    os.makedirs(os.path.dirname(p))
    write_mtx(p, gen.banded(60, band=5, nnz_per_row=4, seed=9))
    return p


def test_cli_check_pass(tiny_mtx, capsys):
    rc = cli_main([tiny_mtx, "--mode", "bucketed", "--iters", "1",
                   "--check"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "pass" in out
    assert "Gflops" in out


def test_cli_json_and_write(tiny_mtx, tmp_path, capsys):
    csv = str(tmp_path / "g.csv")
    rc = cli_main([tiny_mtx, "--mode", "esc", "--iters", "1", "--json",
                   "--write", csv])
    assert rc == 0
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if ln.startswith("{")][0]
    d = json.loads(line)
    assert d["nnz_C"] > 0 and "phases_ms" in d
    assert os.path.exists(csv) and len(open(csv).read().strip()) > 0


def test_cli_stats_counters(tiny_mtx, capsys):
    rc = cli_main([tiny_mtx, "--mode", "bucketed", "--iters", "1",
                   "--stats"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "engine stats:" in out
    stats = json.loads(out.split("engine stats:", 1)[1].splitlines()[0])
    assert stats["engine"] == "bucketed"
    assert stats["padding_ratio"] >= 1.0
    assert stats["ns_per_product"] > 0


def test_cli_missing_matrix_fails_gracefully(capsys):
    rc = cli_main(["/nonexistent/not_there.mtx", "--iters", "1"])
    assert rc == 1
    assert "FAILED" in capsys.readouterr().out


def test_cli_aat(tiny_mtx, capsys):
    rc = cli_main([tiny_mtx, "--aat", "--iters", "1", "--check",
                   "--mode", "bucketed"])
    assert rc == 0
    assert "pass" in capsys.readouterr().out


def test_dist_bench_smoke(tiny_mtx, capsys):
    from mh_spgemm_tpu.bench.dist_bench import main as dist_main
    rc = dist_main([tiny_mtx, "--strategy", "replicate",
                    "--iters", "1", "--max-devices", "2"])
    assert rc == 0
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][0]
    d = json.loads(line)
    assert d["metric"] == "spgemm_dist_scaling"
    assert d["devices"]["1"]["check"] == "pass"


def test_cli_masked_mode(tiny_mtx, capsys):
    rc = cli_main([tiny_mtx, "--mode", "masked", "--iters", "1",
                   "--json"])
    out = capsys.readouterr().out
    assert rc == 0 and '"gflops"' in out
