"""Diagnose round-over-round bench drift → BENCH_variance.json
(VERDICT r6 What's-wrong #1: BENCH_r06's comparable-21 total came out
1.17× of r5 with unchanged plans, and a one-sample bench cannot say
whether that was regression or machine noise).

Reads two committed round bench artifacts (the ``--rounds`` anchors)
plus a FRESH median-of-3 run of bench.py (the r7 methodology: artifacts
pre-staged, three warm suite passes, per-query median + spread), and
classifies every fresh headline query:

- ``noise``      — the fresh median is back at (or below) the earlier
                   anchor's level, or the earlier number sits inside the
                   fresh sample window: the later round's sample was
                   session noise, the code is not slower.
- ``persistent`` — the fresh median reproduces the later anchor's
                   elevation while the earlier number falls outside the
                   fresh window: something real (code or machine)
                   changed between the anchors and is still present.
- ``new``        — the query postdates both anchors; nothing to drift
                   from yet.

The "fresh window" is the ACTUAL per-query min..max when bench.py
reports it (``qmin``/``qmax``, added r8); for older bench outputs
without those keys it falls back to median ± spread/2 — a symmetric
reconstruction that is narrower than min..max on skewed samples, which
is why the real window is preferred (ADVICE r7).

Usage:
    python tools/bench_variance.py [--fresh fresh.json] [--out BENCH_variance.json]
        [--rounds BENCH_r07.json,BENCH_r09.json]

Without --fresh, runs ``bench.py`` as a subprocess at $SPARK_GRAFT_SF_DIR
(default sf0.1) and uses its JSON line. ``--rounds`` picks which two
committed round artifacts anchor the comparison (earlier,later — the
default anchors the two most recent parseable rounds, r7/r9; a round
whose artifact is unparseable, like BENCH_r08, simply cannot anchor).

Output keys (ADVICE r9 — consumers must not hardcode a round pair):
every per-query row carries GENERIC ``earlier_s``/``later_s`` keys and
the top level carries ``earlier_total_s``/``later_total_s``, whatever
the anchor pair; ``<stem>_s`` aliases derived from the filenames (e.g.
``bench_r07_s``) ride along for humans. The ``rounds`` field names the
anchors. Headline queries newer than the earlier anchor are still
classified against the later one (``earlier_s: null``); queries newer
than BOTH anchors get verdict ``new`` — first round measured, nothing
to drift from.
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
    earlier: float,
    later: float,
    med: float,
    spread: float,
    lo: float | None = None,
    hi: float | None = None,
) -> str:
    # fresh sample window: actual min..max when bench.py reported it,
    # else the half-spread reconstruction (pre-r8 bench outputs)
    if lo is None or hi is None:
        lo, hi = med - spread / 2.0, med + spread / 2.0
    if med <= earlier * 1.1 or lo <= earlier <= hi:
        return "noise"
    if lo <= later <= hi:
        return "persistent"
    return "persistent" if med > earlier * 1.2 else "noise"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fresh", default=None, help="path to a bench.py JSON output; runs bench.py if omitted")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_variance.json"))
    ap.add_argument(
        "--rounds",
        default=None,
        help="earlier,later committed round artifacts to anchor against "
        "(default: the two most recent parseable rounds; a round that "
        "shipped parsed:null, like BENCH_r08, cannot anchor)",
    )
    args = ap.parse_args()

    if args.rounds is None:
        # actually scan for the two most recent parseable rounds — the
        # old hardcoded r7/r9 default silently went stale every round
        import glob as _glob

        import re as _re

        cands = []
        for f in _glob.glob(os.path.join(REPO, "BENCH_r*.json")):
            m = _re.search(r"BENCH_r(\d+)\.json$", f)
            if not m:
                continue
            try:
                d = json.load(open(f))
                parsed = d.get("parsed", d) if isinstance(d, dict) else None
            except Exception:
                continue
            if isinstance(parsed, dict) and "queries" in parsed:
                # sort by ROUND NUMBER, not filename: lexicographic order
                # breaks at r100 (sorts before r99)
                cands.append((int(m.group(1)), os.path.basename(f)))
        if len(cands) < 2:
            raise SystemExit(f"need two parseable round artifacts, found {cands}")
        args.rounds = ",".join(n for _, n in sorted(cands)[-2:])

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
    # the sidecar in when the line itself doesn't carry the window. A
    # reduced overflow line (ADVICE r9 degrade path) drops "queries"
    # entirely — then the sidecar IS the fresh sample.
    sidecar = os.path.join(REPO, "BENCH_detail.json")
    if os.path.exists(sidecar):
        det = json.load(open(sidecar))
        if "queries" not in fresh and fresh.get("value") == det.get("value"):
            fresh = det
        elif "qmin" not in fresh and det.get("queries") == fresh.get("queries"):
            for k in ("spread", "qmin", "qmax"):
                fresh.setdefault(k, det.get(k, {}))
    if "queries" not in fresh:
        raise SystemExit("fresh bench output carries no per-query medians")

    name_a, name_b = (s.strip() for s in args.rounds.split(","))
    r_a, r_b = _load(name_a), _load(name_b)
    if not (r_a and r_b and "queries" in r_a and "queries" in r_b):
        raise SystemExit(
            f"anchor artifact unparseable ({name_a} / {name_b}) — pick rounds "
            "whose BENCH_r*.json has a non-null 'parsed' payload"
        )
    # human-facing aliases key by filename stem (e.g. bench_r07_s); the
    # machine-facing keys are the generic earlier_s/later_s (ADVICE r9:
    # gen_observations.py crashed on a re-anchored artifact because the
    # keys used to be pair-derived only)
    key_a = name_a.rsplit(".", 1)[0].lower() + "_s"
    key_b = name_b.rsplit(".", 1)[0].lower() + "_s"
    spread = fresh.get("spread", {})
    qmin, qmax = fresh.get("qmin", {}), fresh.get("qmax", {})
    rows = {}
    for q, med in fresh["queries"].items():
        va, vb = r_a["queries"].get(q), r_b["queries"].get(q)
        sp = spread.get(q, 0.0)
        lo, hi = qmin.get(q), qmax.get(q)
        if vb is None:
            # newer than both anchors: first round measured, nothing to
            # drift from — recorded so no headline query maps to nothing
            verdict = "new"
        elif va is None:
            # newer than the earlier anchor: classify vs the later one
            # (did the later-round number reproduce, or was it noise?)
            verdict = classify(vb, vb, med, sp, lo, hi)
        else:
            verdict = classify(va, vb, med, sp, lo, hi)
        rows[q] = {
            "earlier_s": va,
            "later_s": vb,
            key_a: va,
            key_b: vb,
            "fresh_median_s": med,
            "fresh_spread_s": sp,
            "fresh_min_s": lo,
            "fresh_max_s": hi,
            "later_over_earlier": round(vb / va, 3) if va and vb else None,
            "fresh_over_earlier": round(med / va, 3) if va else None,
            "verdict": verdict,
        }
    # r15: the udf_user_trend three-anchor climb got a dedicated bisect
    # (tools/bisect_udf_trend.py); cite its artifact on the row so the
    # verdict carries the evidence, not another watch round
    bisect_path = os.path.join(REPO, "BENCH_udf_bisect.json")
    if "udf_user_trend" in rows and os.path.exists(bisect_path):
        bi = json.load(open(bisect_path))
        rows["udf_user_trend"]["bisect"] = {
            "artifact": "BENCH_udf_bisect.json",
            "verdict": bi.get("verdict"),
            "r14_elevation_reproduced": bi.get("r14_elevation_reproduced"),
            "base_median_s": bi.get("base_median_s"),
            "best_config": min(
                bi.get("configs", {}).items(),
                key=lambda kv: kv[1]["median_s"],
                default=(None, None),
            )[0],
        }
    common = sorted(q for q in rows if rows[q]["earlier_s"] is not None and rows[q]["later_s"] is not None)
    tot_a = round(sum(rows[q]["earlier_s"] for q in common), 3)
    tot_b = round(sum(rows[q]["later_s"] for q in common), 3)
    out = {
        "metric": "bench_variance",
        "sf": fresh.get("sf"),
        "samples": fresh.get("samples"),
        "rounds": [name_a, name_b],
        "n_common": len(common),
        "fresh_total_s": round(sum(rows[q]["fresh_median_s"] for q in common), 3),
        "earlier_total_s": tot_a,
        "later_total_s": tot_b,
        key_a.replace("_s", "_total_s"): tot_a,
        key_b.replace("_s", "_total_s"): tot_b,
        "n_noise": sum(1 for q in rows if rows[q]["verdict"] == "noise"),
        "n_persistent": sum(1 for q in rows if rows[q]["verdict"] == "persistent"),
        "n_new": sum(1 for q in rows if rows[q]["verdict"] == "new"),
        "queries": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))


if __name__ == "__main__":
    main()
