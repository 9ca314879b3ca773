"""Structured Streaming twins of the batch engine (SURVEY.md §2.9
S3/T1-T6; /root/reference/README.md:19 makes next-minute load inherently
online, README.md:29 lists Flink among the allowed tools).

Layout:
- ``source.py``  — S3: file-based streaming source over the driver's
  parquet fixtures (stands in for the Kafka/Kinesis feed a production
  ELB pipeline would tail).
- ``windows.py`` — T1 tumbling / T2 sliding load counts.
- ``sessionize.py`` — T3 native ``session_window`` + T4 watermark, and
  T5 a custom stateful sessionizer via ``applyInPandasWithState``.
- ``runner.py``  — T6: drives any streaming frame to completion with
  ``trigger(availableNow=True)`` into a memory sink so tests and the
  driver's oracle harness see a deterministic batch result.
"""

from dataengineerchallenge_spark.streaming.runner import run_to_batch  # noqa: F401
from dataengineerchallenge_spark.streaming.source import stream_events  # noqa: F401
