"""Diagnose round-over-round bench drift → BENCH_variance.json
(VERDICT r6 What's-wrong #1: BENCH_r06's comparable-21 total came out
1.17× of r5 with unchanged plans, and a one-sample bench cannot say
whether that was regression or machine noise).

Reads the committed single-sample round artifacts (BENCH_r05.json,
BENCH_r06.json) plus a FRESH median-of-3 run of bench.py (the r7
methodology: artifacts pre-staged, three warm suite passes, per-query
median + spread), and classifies every query common to all three:

- ``noise``      — the fresh median is back at (or below) the r5 level,
                   or r5 sits inside the fresh sample window: the r6
                   sample was session noise, the code is not slower.
- ``persistent`` — the fresh median reproduces the r6 elevation while
                   r5 falls outside the fresh window: something real
                   (code or machine) changed since r5 and is still
                   present.

The "fresh window" is the ACTUAL per-query min..max when bench.py
reports it (``qmin``/``qmax``, added r8); for older bench outputs
without those keys it falls back to median ± spread/2 — a symmetric
reconstruction that is narrower than min..max on skewed samples, which
is why the real window is preferred (ADVICE r7).

Usage:
    python tools/bench_variance.py [--fresh fresh.json] [--out BENCH_variance.json]
        [--rounds BENCH_r05.json,BENCH_r06.json]

Without --fresh, runs ``bench.py`` as a subprocess at $SPARK_GRAFT_SF_DIR
(default sf0.1) and uses its JSON line. ``--rounds`` picks which two
committed round artifacts anchor the comparison (earlier,later — the
default replays the original r5/r6 question; future rounds can pass
e.g. ``BENCH_r07.json,BENCH_r09.json``; a round whose artifact is
unparseable, like BENCH_r08, simply cannot anchor). The output keys
stay ``r5_s``/``r6_s``-shaped only for the default pair; other pairs
emit ``<stem>_s`` keys derived from the filenames.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str) -> dict:
    """Driver round artifacts wrap the bench JSON under 'parsed'."""
    with open(os.path.join(REPO, name)) as f:
        d = json.load(f)
    return d["parsed"] if "parsed" in d else d


def classify(
    r5: float,
    r6: float,
    med: float,
    spread: float,
    lo: float | None = None,
    hi: float | None = None,
) -> str:
    # fresh sample window: actual min..max when bench.py reported it,
    # else the half-spread reconstruction (pre-r8 bench outputs)
    if lo is None or hi is None:
        lo, hi = med - spread / 2.0, med + spread / 2.0
    if med <= r5 * 1.1 or lo <= r5 <= hi:
        return "noise"
    if lo <= r6 <= hi:
        return "persistent"
    return "persistent" if med > r5 * 1.2 else "noise"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fresh", default=None, help="path to a bench.py JSON output; runs bench.py if omitted")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_variance.json"))
    ap.add_argument(
        "--rounds",
        default="BENCH_r05.json,BENCH_r06.json",
        help="earlier,later committed round artifacts to anchor against",
    )
    args = ap.parse_args()

    if args.fresh:
        fresh = json.load(open(args.fresh))
    else:
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            check=True,
        )
        fresh = json.loads(res.stdout.strip().splitlines()[-1])

    # as of r9 bench.py keeps the stdout line driver-sized and writes
    # spread/qmin/qmax to a sidecar (VERDICT r8 What's-wrong #1); merge
    # the sidecar in when the line itself doesn't carry the window
    if "qmin" not in fresh:
        sidecar = os.path.join(REPO, "BENCH_detail.json")
        if os.path.exists(sidecar):
            det = json.load(open(sidecar))
            if det.get("queries") == fresh.get("queries"):
                for k in ("spread", "qmin", "qmax"):
                    fresh.setdefault(k, det.get(k, {}))

    name_a, name_b = (s.strip() for s in args.rounds.split(","))
    r5, r6 = _load(name_a), _load(name_b)
    if not (r5 and r6 and "queries" in r5 and "queries" in r6):
        raise SystemExit(
            f"anchor artifact unparseable ({name_a} / {name_b}) — pick rounds "
            "whose BENCH_r*.json has a non-null 'parsed' payload"
        )
    # default pair keeps the historical r5_s/r6_s keys gen_observations
    # reads; other pairs key by filename stem (e.g. bench_r07_s)
    if (name_a, name_b) == ("BENCH_r05.json", "BENCH_r06.json"):
        key_a, key_b = "r5_s", "r6_s"
    else:
        key_a = name_a.rsplit(".", 1)[0].lower() + "_s"
        key_b = name_b.rsplit(".", 1)[0].lower() + "_s"
    spread = fresh.get("spread", {})
    qmin, qmax = fresh.get("qmin", {}), fresh.get("qmax", {})
    rows = {}
    for q, med in fresh["queries"].items():
        if q not in r5["queries"] or q not in r6["queries"]:
            continue
        v5, v6, sp = r5["queries"][q], r6["queries"][q], spread.get(q, 0.0)
        lo, hi = qmin.get(q), qmax.get(q)
        rows[q] = {
            key_a: v5,
            key_b: v6,
            "fresh_median_s": med,
            "fresh_spread_s": sp,
            "fresh_min_s": lo,
            "fresh_max_s": hi,
            "later_over_earlier": round(v6 / v5, 3) if v5 else None,
            "fresh_over_earlier": round(med / v5, 3) if v5 else None,
            "verdict": classify(v5, v6, med, sp, lo, hi),
        }
    common = sorted(rows)
    out = {
        "metric": "bench_variance",
        "sf": fresh.get("sf"),
        "samples": fresh.get("samples"),
        "rounds": [name_a, name_b],
        "fresh_total_s": round(sum(rows[q]["fresh_median_s"] for q in common), 3),
        key_a.replace("_s", "_total_s"): round(sum(rows[q][key_a] for q in common), 3),
        key_b.replace("_s", "_total_s"): round(sum(rows[q][key_b] for q in common), 3),
        "n_noise": sum(1 for q in common if rows[q]["verdict"] == "noise"),
        "n_persistent": sum(1 for q in common if rows[q]["verdict"] == "persistent"),
        "queries": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))


if __name__ == "__main__":
    main()
