"""CLI surface (`python -m dataengineerchallenge_spark`): the
switch-over entry a reference user drives — list must enumerate the
registry without starting Spark, run must execute a query end-to-end."""

from __future__ import annotations

import subprocess
import sys


def test_cli_list_enumerates_registry():
    out = subprocess.run(
        [sys.executable, "-m", "dataengineerchallenge_spark", "list"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert out.returncode == 0
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) >= 190
    assert any(l.startswith("o sessionize ") or "o sessionize" in l for l in lines)
    # oracle marks present on both kinds
    assert any(l.startswith("o ") for l in lines) and any(
        l.startswith("- ") for l in lines
    )


def test_cli_run_executes_a_query():
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "dataengineerchallenge_spark",
            "run",
            "region_revenue",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--show",
            "3",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "r_name" in out.stdout  # the shown frame's header


def test_cli_unknown_query_fails_loud():
    out = subprocess.run(
        [sys.executable, "-m", "dataengineerchallenge_spark", "run", "nope_q"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 2
    assert "unknown query" in out.stderr


def test_cli_sql_lane_runs_over_views():
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "dataengineerchallenge_spark",
            "sql",
            "SELECT r_name, count(*) AS n FROM region GROUP BY r_name ORDER BY r_name",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--show",
            "2",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "AFRICA" in out.stdout
