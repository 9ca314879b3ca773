"""Deterministic synthetic AWS ELB access-log generator.

Writes tests/data/elb_synth.log.gz: ~1200 lines in the classic ELB entry
format (/root/reference/README.md:44-45) — sessions per client IP with
intra-session bursts and >15-min inter-session gaps, plus a controlled
set of malformed lines ("messy (ie real) data", README.md:61) restricted
to classes that Spark's PERMISSIVE from_csv and DuckDB's all-varchar
read_csv classify identically (bad timestamp, non-integer status,
truncated line):

    python tools/gen_elb_log.py

Seeded (SEED=7); re-running reproduces the identical file, so the
checked-in artifact and this script can be diffed at review time.
"""

from __future__ import annotations

import gzip
import random
from pathlib import Path

SEED = 7
N_IPS = 40
BASE_TS = 1437555600  # 2015-07-22T09:00:00Z, matching the reference's log date
OUT = Path(__file__).resolve().parent.parent / "tests" / "data" / "elb_synth.log.gz"

PATHS = [
    "/shop/authresponse", "/papi/v1/expresscart/verify", "/shop/cart",
    "/papi/rr/products/%d/statistics", "/shop/orderdetail/%d", "/favicon.ico",
    "/shop/p/%d", "/api/user/profile", "/shop/search", "/shop/wallet/txn",
]
AGENTS = [
    "Mozilla/5.0 (Windows NT 6.1; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/43.0.2357.130 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/44.0.2403.89 Safari/537.36",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 8_3 like Mac OS X) AppleWebKit/600.1.4 Version/8.0 Mobile/12F70 Safari/600.1.4",
    "python-requests/2.7.0 CPython/2.7.9",
    "-",
]


def fmt_ts(epoch_us: int) -> str:
    import datetime

    dt = datetime.datetime.fromtimestamp(epoch_us // 1_000_000, datetime.timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{epoch_us % 1_000_000:06d}Z"


def main() -> None:
    rng = random.Random(SEED)
    rows: list[tuple[int, str]] = []  # (epoch_us, line)

    for ip_i in range(N_IPS):
        ip = f"203.0.{ip_i // 8}.{10 + ip_i * 3 % 240}"
        t_us = (BASE_TS + rng.randint(0, 600)) * 1_000_000
        for _ in range(rng.randint(1, 4)):  # sessions per ip
            n_hits = rng.randint(1, 18)
            for _h in range(n_hits):
                port = rng.randint(30000, 65000)
                path = rng.choice(PATHS)
                if "%d" in path:
                    path = path % rng.randint(100, 9999)
                scheme, hostport = rng.choice(
                    [("https", "paytm.com:443"), ("http", "www.paytm.com:80")]
                )
                q = f"?item={rng.randint(1, 500)}" if rng.random() < 0.3 else ""
                method = rng.choice(["GET"] * 8 + ["POST", "PUT"])
                backend = (
                    "-"
                    if rng.random() < 0.02
                    else f"10.0.{rng.randint(4, 6)}.{rng.randint(100, 250)}:80"
                )
                status = rng.choice([200] * 14 + [302, 404, 500])
                b_status = status if backend != "-" else 0
                rt, bt, ct = (
                    round(rng.uniform(0.00002, 0.0009), 6),
                    round(rng.uniform(0.001, 0.9), 6),
                    round(rng.uniform(0.00002, 0.0009), 6),
                )
                if backend == "-":
                    rt = bt = ct = -1.0
                rcv, snt = rng.choice([0, 0, 0, rng.randint(20, 900)]), rng.randint(30, 60000)
                agent = rng.choice(AGENTS)
                ssl = (
                    ("ECDHE-RSA-AES128-GCM-SHA256", "TLSv1.2") if scheme == "https" else ("-", "-")
                )
                line = (
                    f"{fmt_ts(t_us)} marketpalce-shop {ip}:{port} {backend} "
                    f"{rt} {bt} {ct} {status} {b_status} {rcv} {snt} "
                    f'"{method} {scheme}://{hostport}{path}{q} HTTP/1.1" "{agent}" '
                    f"{ssl[0]} {ssl[1]}"
                )
                rows.append((t_us, line))
                t_us += rng.randint(200_000, 180_000_000)  # 0.2 s – 3 min within session
            # inter-session gap: 1000–7200 s random + 901 s floor-guard
            # ≈ 31.7 min – 2.25 h total, always > the 900 s session gap
            t_us += rng.randint(1000, 7200) * 1_000_000
            t_us += 901 * 1_000_000

    # malformed lines: classes both engines classify identically
    bad: list[tuple[int, str]] = []
    for k in range(6):  # bad timestamp (still 15 fields)
        t = (BASE_TS + 1000 + k) * 1_000_000
        bad.append(
            (
                t,
                'NOT-A-TIMESTAMP marketpalce-shop 198.51.100.7:4444 10.0.4.1:80 0.1 0.1 0.1 200 200 0 100 "GET https://paytm.com:443/shop/cart HTTP/1.1" "Mozilla/5.0" - -',
            )
        )
    for k in range(4):  # truncated line (8 fields)
        t = (BASE_TS + 2000 + k) * 1_000_000
        bad.append((t, f"{fmt_ts(t)} marketpalce-shop 198.51.100.9:5555 10.0.4.2:80 0.1 0.1 0.1 200"))
    for k in range(4):  # non-integer status code
        t = (BASE_TS + 3000 + k) * 1_000_000
        bad.append(
            (
                t,
                f'{fmt_ts(t)} marketpalce-shop 198.51.100.11:6666 10.0.4.3:80 0.1 0.1 0.1 XXX 200 0 100 "GET https://paytm.com:443/shop/cart HTTP/1.1" "Mozilla/5.0" - -',
            )
        )

    rows.extend(bad)
    rows.sort(key=lambda r: (r[0], r[1]))
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(OUT, "wt", newline="\n") as f:
        for _, line in rows:
            f.write(line + "\n")
    print(f"wrote {len(rows)} lines ({len(bad)} malformed) to {OUT}")


if __name__ == "__main__":
    main()
