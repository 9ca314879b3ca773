"""tools/stage_gc.py on a synthetic scratch tree: scan inventory,
dry-run safety, cutoff-based expiry, and the protocol-naming scope
(ADVICE r7: only content-addressed slots / scratch dirs are GC-able —
never the spark_graft_bkt_* paths backing live catalog tables)."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from stage_gc import expire, scan  # noqa: E402

# realistic 16-hex content tags, as staging.content_tag produces
_T1 = "0123456789abcdef"
_T2 = "feedfacecafe0123"
_T3 = "00ff00ff00ff00ff"
_T4 = "deadbeef01234567"


def _mk_slot(root: Path, name: str, age_days: float, published: bool = True) -> Path:
    d = root / name
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x" * 100)
    if published:
        (d / "_SUCCESS").touch()
    old = time.time() - age_days * 86400
    os.utime(d, (old, old))
    return d


def test_scan_inventories_only_protocol_dirs(tmp_path):
    _mk_slot(tmp_path, f"spark_graft_ivfpq_{_T1}", 1.0)
    _mk_slot(tmp_path, f"spark_graft_datepart_{_T2}", 10.0)
    _mk_slot(tmp_path, "spark_graft_ivfpq_scratch_x1", 10.0, published=False)
    # NON-protocol dirs that must never be listed: a session-catalog
    # bucketed-table path (queries/formats.py / queries/dedup.py), a
    # short/non-hex suffix, and plain unrelated entries
    _mk_slot(tmp_path, "spark_graft_bkt_orders", 30.0)
    _mk_slot(tmp_path, "spark_graft_bkt_a1b2c3d4", 30.0)
    _mk_slot(tmp_path, "spark_graft_ivfpq_aaaa", 30.0)
    (tmp_path / "unrelated_dir").mkdir()
    (tmp_path / "some_file.txt").write_text("not a slot")

    records = scan(tmp_path)
    assert {r["name"] for r in records} == {
        f"spark_graft_ivfpq_{_T1}",
        f"spark_graft_datepart_{_T2}",
        "spark_graft_ivfpq_scratch_x1",
    }
    by_name = {r["name"]: r for r in records}
    assert by_name["spark_graft_ivfpq_scratch_x1"]["kind"] == "scratch"
    assert not by_name["spark_graft_ivfpq_scratch_x1"]["published"]
    assert by_name[f"spark_graft_ivfpq_{_T1}"]["size_bytes"] == 100
    assert 9.5 < by_name[f"spark_graft_datepart_{_T2}"]["age_days"] < 10.5


def test_dry_run_deletes_nothing(tmp_path):
    d = _mk_slot(tmp_path, f"spark_graft_zorder_{_T3}", 30.0)
    expired = expire(scan(tmp_path), expire_days=7, delete=False)
    assert len(expired) == 1 and expired[0]["expired"]
    assert d.exists()  # dry run: marked, not removed


def test_delete_removes_only_past_cutoff(tmp_path):
    old = _mk_slot(tmp_path, f"spark_graft_zorder_{_T3}", 30.0)
    fresh = _mk_slot(tmp_path, f"spark_graft_zorder_{_T4}", 0.1)
    orphan = _mk_slot(tmp_path, "spark_graft_x_scratch_z", 30.0, published=False)

    expired = expire(scan(tmp_path), expire_days=7, delete=True)
    assert {r["name"] for r in expired} == {
        f"spark_graft_zorder_{_T3}",
        "spark_graft_x_scratch_z",
    }
    assert not old.exists() and not orphan.exists()
    assert fresh.exists()


def test_delete_never_touches_bucketed_table_dirs(tmp_path):
    """--delete on a shared tmp must not remove a live session's catalog
    table backing dirs, however old they are."""
    bkt = _mk_slot(tmp_path, "spark_graft_bkt_lineitem", 365.0)
    expired = expire(scan(tmp_path), expire_days=7, delete=True)
    assert expired == []
    assert bkt.exists()


def test_include_bkt_opts_bucketed_dirs_into_expiry(tmp_path):
    """ADVICE r9: bkt dirs are orphaned when their session dies and
    accumulate unboundedly; --include-bkt opts them into the mtime-age
    sweep (kind 'bkt'), while the default scan still never lists them."""
    old_bkt = _mk_slot(tmp_path, "spark_graft_bkt_mh_bands_x", 30.0)
    fresh_bkt = _mk_slot(tmp_path, "spark_graft_bkt_orders_y", 0.1)
    slot = _mk_slot(tmp_path, f"spark_graft_ivfpq_{_T1}", 30.0)

    records = scan(tmp_path, include_bkt=True)
    by_name = {r["name"]: r for r in records}
    assert by_name["spark_graft_bkt_mh_bands_x"]["kind"] == "bkt"
    assert by_name[f"spark_graft_ivfpq_{_T1}"]["kind"] == "slot"

    expired = expire(records, expire_days=7, delete=True)
    assert {r["name"] for r in expired} == {
        "spark_graft_bkt_mh_bands_x",
        f"spark_graft_ivfpq_{_T1}",
    }
    assert not old_bkt.exists() and not slot.exists()
    assert fresh_bkt.exists()  # inside the cutoff: untouched


def test_dir_size_survives_concurrent_removal(tmp_path):
    """A file vanishing between rglob and stat (concurrent GC/builder on
    a shared root) must be skipped, not crash the scan."""
    import stage_gc

    d = _mk_slot(tmp_path, f"spark_graft_ivfpq_{_T1}", 1.0)
    gone = d / "vanishing.parquet"
    gone.write_bytes(b"y" * 50)

    real_stat = Path.stat

    def racy_stat(self, **kw):
        if self.name == "vanishing.parquet":
            raise FileNotFoundError(self)
        return real_stat(self, **kw)

    orig = stage_gc.Path.stat
    stage_gc.Path.stat = racy_stat  # type: ignore[method-assign]
    try:
        size = stage_gc._dir_size(d)
    finally:
        stage_gc.Path.stat = orig  # type: ignore[method-assign]
    assert size == 100  # the surviving file only; no crash
