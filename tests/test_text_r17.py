"""Round-17 pin (VERDICT r16 next-round #5): the registered top-V JSD
variant must actually cap the vocabulary AND preserve the uncapped
matrix's pair ordering on the fixture — capped ≈ uncapped, measured as
Spearman rank correlation over the 190 source pairs."""

from __future__ import annotations

from dataengineerchallenge_spark.queries.text import (
    _JSD_TOPV,
    source_jsd_matrix,
    source_jsd_matrix_topv,
)

SF_DIR = "/root/testdata/sf0.001"


def test_topv_jsd_preserves_uncapped_ranking(spark):
    full = {
        (r["source_a"], r["source_b"]): r["jsd_micropoints"]
        for r in source_jsd_matrix(spark, SF_DIR).collect()
    }
    capped = {
        (r["source_a"], r["source_b"]): r["jsd_micropoints"]
        for r in source_jsd_matrix_topv(spark, SF_DIR).collect()
    }
    assert set(full) == set(capped) and len(full) == 190

    def ranks(d):
        order = sorted(d, key=lambda k: (d[k], k))
        return {k: i for i, k in enumerate(order)}

    rf, rc = ranks(full), ranks(capped)
    n = len(full)
    d2 = sum((rf[k] - rc[k]) ** 2 for k in full)
    rho = 1 - 6 * d2 / (n * (n**2 - 1))
    assert rho > 0.85, f"capped JSD reordered the matrix: spearman {rho:.3f}"


def test_topv_cap_bites_on_fixture(spark):
    """The cap must be real (24 of 31 words) — a vacuous cap would make
    the registered 'scale form' indistinguishable from the full one."""
    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.queries.text import spread
    from dataengineerchallenge_spark.sources.tables import load_table

    vocab_n = (
        spread(load_table(spark, SF_DIR, "documents"))
        .select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .count()
    )
    assert _JSD_TOPV < vocab_n, (_JSD_TOPV, vocab_n)
