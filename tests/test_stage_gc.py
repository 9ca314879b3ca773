"""tools/stage_gc.py on a synthetic scratch tree: scan inventory,
dry-run safety, cutoff-based expiry."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from stage_gc import expire, scan  # noqa: E402


def _mk_slot(root: Path, name: str, age_days: float, published: bool = True) -> Path:
    d = root / name
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x" * 100)
    if published:
        (d / "_SUCCESS").touch()
    old = time.time() - age_days * 86400
    os.utime(d, (old, old))
    return d


def test_scan_inventories_only_staging_dirs(tmp_path):
    _mk_slot(tmp_path, "spark_graft_ivfpq_aaaa", 1.0)
    _mk_slot(tmp_path, "spark_graft_datepart_bbbb", 10.0)
    _mk_slot(tmp_path, "spark_graft_ivfpq_scratch_x1", 10.0, published=False)
    (tmp_path / "unrelated_dir").mkdir()
    (tmp_path / "some_file.txt").write_text("not a slot")

    records = scan(tmp_path)
    assert {r["name"] for r in records} == {
        "spark_graft_ivfpq_aaaa",
        "spark_graft_datepart_bbbb",
        "spark_graft_ivfpq_scratch_x1",
    }
    by_name = {r["name"]: r for r in records}
    assert by_name["spark_graft_ivfpq_scratch_x1"]["kind"] == "scratch"
    assert not by_name["spark_graft_ivfpq_scratch_x1"]["published"]
    assert by_name["spark_graft_ivfpq_aaaa"]["size_bytes"] == 100
    assert 9.5 < by_name["spark_graft_datepart_bbbb"]["age_days"] < 10.5


def test_dry_run_deletes_nothing(tmp_path):
    d = _mk_slot(tmp_path, "spark_graft_zorder_cccc", 30.0)
    expired = expire(scan(tmp_path), expire_days=7, delete=False)
    assert len(expired) == 1 and expired[0]["expired"]
    assert d.exists()  # dry run: marked, not removed


def test_delete_removes_only_past_cutoff(tmp_path):
    old = _mk_slot(tmp_path, "spark_graft_zorder_old1", 30.0)
    fresh = _mk_slot(tmp_path, "spark_graft_zorder_new1", 0.1)
    orphan = _mk_slot(tmp_path, "spark_graft_x_scratch_z", 30.0, published=False)

    expired = expire(scan(tmp_path), expire_days=7, delete=True)
    assert {r["name"] for r in expired} == {
        "spark_graft_zorder_old1",
        "spark_graft_x_scratch_z",
    }
    assert not old.exists() and not orphan.exists()
    assert fresh.exists()
