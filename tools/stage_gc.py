"""Staged-artifact garbage collector (VERDICT r6 What's-wrong #3).

Content-addressed staging slots (``spark_graft_<prefix>_<tag>``; see
dataengineerchallenge_spark/staging.py) accumulate one copy per fixture
content version — correct, but a long-lived deployment needs a lifecycle:
this tool lists every slot under a staging root with its age and size,
and expires stale ones.

Dry-run by default; nothing is deleted without ``--delete``.

    python tools/stage_gc.py                          # list all slots
    python tools/stage_gc.py --expire-days 7          # show what WOULD go
    python tools/stage_gc.py --expire-days 7 --delete # actually remove

Orphaned ``*_scratch_*`` dirs (a builder that died mid-publish) are
always considered expirable once older than the cutoff.

Scope (ADVICE r7): ONLY dirs following the content-addressed protocol
naming are GC-able — ``spark_graft_<prefix>_<16-hex tag>`` slots and
their ``*_scratch_*`` work dirs. Other ``spark_graft_*`` dirs under a
shared tmp (e.g. the ``spark_graft_bkt_*`` paths backing live
session-catalog bucketed tables, queries/formats.py) are explicitly
outside the protocol and are never listed or deleted by default.

``--include-bkt`` (ADVICE r9) opts those bucketed-table data dirs into
the sweep: they are per-session mkdtemps whose catalog metadata dies
with the owning session (every bench.py ``_prestage`` run writes a
fresh copy), so without a reclaim path staged bytes accumulate
unboundedly. Catalog liveness cannot be checked from here, so the only
safe signal is mtime age — the dirs are written once at staging and
never touched again, meaning age == session age. Only combine
``--include-bkt --delete`` with an ``--expire-days`` threshold safely
above your longest plausible live session (e.g. 2+ days for a box that
runs hour-scale benches); an aged-out dir belonging to a somehow-still-
live session would break that session's bucketed table.
"""

from __future__ import annotations

import argparse
import json
import re
import shutil
import sys
import tempfile
import time
from pathlib import Path

SLOT_PREFIX = "spark_graft_"
# published content-addressed slot: prefix + _ + 16 lowercase hex chars
_SLOT_RE = re.compile(rf"^{SLOT_PREFIX}.+_[0-9a-f]{{16}}$")


def _is_bkt_dir(name: str) -> bool:
    """Session-catalog bucketed-table data dirs (queries/formats.py,
    queries/dedup.py): per-session mkdtemps under the staging root whose
    catalog metadata dies with the owning session."""
    return name.startswith(f"{SLOT_PREFIX}bkt_")


def _is_protocol_dir(name: str, include_bkt: bool = False) -> bool:
    """True only for dirs the staging protocol owns: content-addressed
    slots (16-hex tag suffix) and builder scratch dirs. Anything else —
    notably session-catalog bucketed-table paths (spark_graft_bkt_*,
    which as of r9 also live under the staging root) — is excluded
    unless the caller opts in with ``include_bkt`` (ADVICE r9: those
    dirs are orphaned when the owning session dies and otherwise
    accumulate unboundedly; see module docstring for the safety
    contract)."""
    if not name.startswith(SLOT_PREFIX):
        return False
    # live session-catalog bucketed-table data dirs: excluded explicitly
    # by default, not just by failing the 16-hex-tag pattern — their
    # mkdtemp suffix is random and a future naming change must not make
    # them silently GC-eligible
    if _is_bkt_dir(name):
        return include_bkt
    return "_scratch_" in name or bool(_SLOT_RE.match(name))


def _dir_size(path: Path) -> int:
    # per-file stat guarded: on a shared root a concurrent builder/GC can
    # remove files between the rglob listing and the stat (ADVICE r7)
    total = 0
    for f in path.rglob("*"):
        try:
            if f.is_file():
                total += f.stat().st_size
        except OSError:
            continue  # vanished mid-scan — skip, don't crash the sweep
    return total


def _slot_mtime(path: Path) -> float:
    """The slot dir's own mtime — the moment this content version was
    (re)built/published, NOT last access (content-addressed slots are
    immutable after publish and reads don't bump dir mtime). ``age`` in
    the scan output is therefore age-since-build; an old-but-hot slot is
    eligible at the cutoff and will simply be rebuilt on next use."""
    return path.stat().st_mtime


def scan(
    root: Path, now: float | None = None, include_bkt: bool = False
) -> list[dict]:
    """One record per staging slot/scratch dir under ``root`` (plus
    bucketed-table data dirs, kind ``bkt``, when ``include_bkt``)."""
    now = time.time() if now is None else now
    records = []
    if not root.is_dir():
        return records
    for p in sorted(root.iterdir()):
        if not p.is_dir() or not _is_protocol_dir(p.name, include_bkt):
            continue
        mtime = _slot_mtime(p)
        kind = (
            "bkt"
            if _is_bkt_dir(p.name)
            else ("scratch" if "_scratch_" in p.name else "slot")
        )
        records.append(
            {
                "path": str(p),
                "name": p.name,
                "kind": kind,
                "published": (p / "_SUCCESS").exists(),
                "age_days": round((now - mtime) / 86400.0, 3),
                "size_bytes": _dir_size(p),
            }
        )
    return records


def expire(
    records: list[dict], expire_days: float, delete: bool = False
) -> list[dict]:
    """Mark (and with ``delete=True`` remove) records older than the
    cutoff. Unpublished scratch dirs expire at the same cutoff — they are
    dead weight from a crashed builder."""
    expired = [r for r in records if r["age_days"] > expire_days]
    for r in expired:
        r["expired"] = True
        if delete:
            shutil.rmtree(r["path"], ignore_errors=True)
            r["deleted"] = True
    return expired


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--root",
        default=tempfile.gettempdir(),
        help="staging root (the spark_graft.staging_root conf value; "
        "default: the local tmpdir)",
    )
    ap.add_argument(
        "--expire-days",
        type=float,
        default=None,
        help="mark slots older than this many days as expired",
    )
    ap.add_argument(
        "--delete",
        action="store_true",
        help="actually remove expired slots (default: dry run)",
    )
    ap.add_argument(
        "--include-bkt",
        action="store_true",
        help="opt bucketed-table data dirs (spark_graft_bkt_*) into the "
        "sweep; only safe with an --expire-days threshold above your "
        "longest plausible live session (see module docstring)",
    )
    args = ap.parse_args(argv)

    records = scan(Path(args.root), include_bkt=args.include_bkt)
    expired: list[dict] = []
    if args.expire_days is not None:
        expired = expire(records, args.expire_days, delete=args.delete)
    print(
        json.dumps(
            {
                "root": args.root,
                "n_slots": len(records),
                "total_bytes": sum(r["size_bytes"] for r in records),
                "n_expired": len(expired),
                "deleted": bool(args.delete),
                "slots": records,
            },
            indent=1,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
