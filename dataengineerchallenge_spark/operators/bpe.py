"""BPE merge-table training over a corpus (SURVEY.md §2.11 N4 — the
tokenizer-training stage: token counting and sequence packing live in
queries/text.py; this learns the vocabulary they'd count with).

Distributed shape: the corpus collapses ONCE into a (word, freq) table —
the only pass whose cost scales with corpus bytes; at 100 TB that
aggregate is the standard map-side-combined shuffle and the resulting
distinct-word table is orders of magnitude smaller. The merge loop then
iterates on the word table alone: per round, one pair-count aggregate
(argmax pair to the driver — a 1-row collect, same stance as an ML fit)
and one higher-order-function rewrite of the symbol arrays (fold-based
left-to-right merge, JVM-side, no Python UDF). Plans are cut per round
with a lazy localCheckpoint exactly like the connected-components loop
(operators/dedup.py) so N rounds don't compound into one mega-plan.

Production tokenizers train on a SAMPLE (the merge statistics converge
long before full-corpus exactness matters) — compose with
events_hash_sample-style hash sampling upstream for that."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel, kept out of the corpus alphabet
EOW = "</w>"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """corpus → (word, freq): the single corpus-wide pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_pair_in_syms(syms, left: str, right: str):
    """Fold the symbol array left-to-right, fusing adjacent (left, right)
    occurrences non-overlappingly (greedy-left, the BPE rule)."""
    merged = left + right
    return F.when(
        F.size(syms) < 2,
        syms,
    ).otherwise(
        F.aggregate(
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
            F.slice(syms, 1, 1),
            lambda acc, x: F.when(
                (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
    )


def apply_bpe(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Tokenize the corpus with a learned merge table; returns
    (id_col, n_bpe_tokens, n_ws_tokens).

    Scale shape: merges are applied to the DISTINCT-WORD table (the same
    tiny frame training iterated on), never to raw corpus rows — then the
    word → token-count map broadcast-joins back onto one exploded corpus
    pass. The rewrite chain is cut with a lazy localCheckpoint every few
    merges so a 30k-merge vocabulary doesn't nest 30k folds in one plan."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .distinct()
        .select(
            "word",
            F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))).alias("syms"),
        )
    )
    for i, m in enumerate(merges):
        words = words.select(
            "word", _merge_pair_in_syms(F.col("syms"), m["left"], m["right"]).alias("syms")
        )
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=False)
    word_tokens = words.select("word", F.size("syms").alias("n_tok"))
    tok = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.length("word") > 0)
    return (
        tok.join(F.broadcast(word_tokens), "word")
        .groupBy(id_col)
        .agg(
            F.sum("n_tok").cast("long").alias("n_bpe_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_ws_tokens"),
        )
    )


def train_bpe(docs: DataFrame, text_col: str = "text", n_merges: int = 20) -> list[dict]:
    """Learn ``n_merges`` BPE merges; returns them in rank order as dicts
    (rank, left, right, merged, pair_freq). Ties on pair frequency break
    lexicographically so the table is deterministic across runs and
    partitionings."""
    wf = word_freq_table(docs, text_col)
    words = wf.select(
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
    ).localCheckpoint()  # eager: the corpus pass runs once, here

    merges: list[dict] = []
    for rank in range(n_merges):
        pairs = (
            words.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("pf"))
            .orderBy(F.desc("pf"), F.asc("p.l"), F.asc("p.r"))
        )
        top = pairs.first()
        if top is None:
            break
        left, right, pf = top["p"]["l"], top["p"]["r"], top["pf"]
        merges.append(
            {"rank": rank, "left": left, "right": right, "merged": left + right, "pair_freq": pf}
        )
        words = words.select(
            "freq", _merge_pair_in_syms(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=False)
    return merges
