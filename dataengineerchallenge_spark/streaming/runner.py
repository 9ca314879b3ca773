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
    # r20 session 5: a stateful drain fixes its STATE partition count
    # from spark.sql.shuffle.partitions at first-batch planning (and
    # records it in the offset log), so every drain through this harness
    # scheduled 32 state-store tasks whose cost is per-task open/commit
    # I/O, not compute — profiled at sf0.1: 21 s of task time at 0.79 s
    # CPU for stream_per_minute_load's stateful stage; narrowing to 8
    # measured the whole drain 2.1-4.1 s -> 1.2-1.5 s (alternating
    # samples). This harness is the TEST/ORACLE path by contract (the
    # memory sink collects to the driver, so drains here are
    # driver-bounded by design — its own docstring); the production
    # parquet/kafka sink path does not go through it. Dial:
    # spark.graft.stream.drainStatePartitions (default 8; set 0/unset
    # semantics: any non-positive value disables the override). The
    # session width is restored after termination — state partitioning
    # for batches beyond the first comes from the offset log, never the
    # live conf. Partitioning cannot change any drained VALUE (exact
    # aggregates; the oracle sweeps re-verify every streaming twin).
    drain_sp = int(
        spark.conf.get("spark.graft.stream.drainStatePartitions", "8")
    )
    old_sp: str | None = None
    if drain_sp > 0:
        cur_sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if drain_sp < cur_sp:
            old_sp = str(cur_sp)
            spark.conf.set("spark.sql.shuffle.partitions", str(drain_sp))
    writer = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    try:
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
    finally:
        if old_sp is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
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


def drain_foreach_batch(
    sdf: DataFrame,
    batch_fn,
    checkpoint: str,
    name: str,
    timeout_s: int = 300,
) -> None:
    """Drain an availableNow foreachBatch stream to completion — the
    shared start/await/stop lifecycle of the ~21 foreachBatch twins,
    under the same narrowed drain width as ``run_to_batch`` (r21 change
    3; the r20 Change-14 dial applied through one helper instead of 21
    hand-rolled writeStream blocks).

    The session shuffle width is narrowed to
    ``spark.graft.stream.drainStatePartitions`` (default 8; any
    non-positive value disables) around the drain and restored after
    termination: the stream's own state layout AND each micro-batch's
    foreachBatch body (a batch query planned under the live conf) then
    schedule drain-width tasks instead of the full
    ``spark.sql.shuffle.partitions``. These drains run per-epoch
    idempotent batch writes through the driver by contract (the
    run-scoped store commit); the production parquet/kafka sink path
    does not go through this helper, and a cluster drain raises the
    dial. Partitioning cannot change any drained VALUE (exact
    aggregates, epoch-keyed overwrites; the oracle sweeps re-verify
    every twin).

    Raises TimeoutError on a partial drain; always stops the query and
    restores the width."""
    spark = sdf.sparkSession
    drain_sp = int(
        spark.conf.get("spark.graft.stream.drainStatePartitions", "8")
    )
    old_sp: str | None = None
    if drain_sp > 0:
        cur_sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if drain_sp < cur_sp:
            old_sp = str(cur_sp)
            spark.conf.set("spark.sql.shuffle.partitions", str(drain_sp))
    try:
        q = (
            sdf.writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(timeout_s):
                raise TimeoutError(
                    f"{name} did not drain availableNow input in {timeout_s}s"
                )
        finally:
            if q.isActive:
                q.stop()
    finally:
        if old_sp is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
