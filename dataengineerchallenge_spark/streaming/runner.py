"""Stream execution helper (SURVEY.md §2.9 T6 — output modes/triggers).

``run_to_batch`` drives a streaming DataFrame to completion over the
currently-available input with ``trigger(availableNow=True)`` and a
memory sink, returning the materialized result as a batch DataFrame.

This is the test/oracle harness path: results are deterministic because
availableNow drains the full fixture. The memory sink collects to the
driver, so it is test-scale only — the production sink is
``writeStream.format("parquet"/"kafka")`` with the same trigger options
(S4; sinks module).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame

_counter = itertools.count()


def run_to_batch(
    sdf: DataFrame,
    name: str,
    output_mode: str = "append",
    timeout_s: int = 300,
    checkpoint: str | None = None,
) -> DataFrame:
    """Run a streaming frame until availableNow is drained; return the
    memory-sink contents. ``output_mode``: append for row streams and
    finalized-only emission, complete for full-aggregate snapshots,
    update for incremental aggregate deltas.

    Pass ``checkpoint`` to persist offsets/state/watermark across calls:
    a second run with the same checkpoint resumes exactly where the first
    stopped (used by tests to replay a stream batch-by-batch and to
    verify watermark semantics across restarts)."""
    spark = sdf.sparkSession
    qname = f"_strm_{name}_{next(_counter)}_{id(sdf) & 0xFFFF}"
    writer = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    try:
        finished = q.awaitTermination(timeout_s)
        if not finished:
            raise TimeoutError(
                f"streaming query {name!r} did not drain availableNow input in "
                f"{timeout_s}s — refusing to return a partially-filled sink"
            )
    finally:
        if q.isActive:
            q.stop()
    # Resolve the sink into a DataFrame, then drop the uniquely-named temp
    # view: spark.table() analyzes EAGERLY, so the returned frame holds the
    # memory-sink relation directly and survives the drop, while the
    # catalog no longer accumulates one table per call (ADVICE r2). The
    # sink rows stay reachable only through the returned frame and are
    # GC'd with it — no driver-side collect/re-parallelize round-trip
    # (that copy cost ~2.3 s per streaming query at sf0.1).
    out = spark.table(qname)
    spark.catalog.dropTempView(qname)
    return out
