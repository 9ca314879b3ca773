"""Property-based invariants for the round-15 operators (SURVEY.md
§5.4 discipline): structural laws that must hold on ARBITRARY graphs
and corpora, not just the closed-form fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

edges_strategy = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


def _sym(und):
    canon = sorted({(min(a, b), max(a, b)) for a, b in und})
    return canon + [(b, a) for a, b in canon]


@settings(max_examples=8, deadline=None)
@given(edges_strategy)
def test_coreness_bounded_by_degree_and_monotone(spark, und):
    """core(v) <= degree(v) always, and every h-index round is monotone
    non-increasing (iters+2 values <= iters values pointwise)."""
    from collections import Counter

    from dataengineerchallenge_spark.operators.graph import coreness

    edges = _sym(und)
    deg = Counter(a for a, _ in edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    c3 = {r["node"]: r["core"] for r in coreness(df, iters=3).collect()}
    c5 = {r["node"]: r["core"] for r in coreness(df, iters=5).collect()}
    assert set(c3) == set(deg)
    for n, v in c3.items():
        assert 1 <= v <= deg[n]
        assert c5[n] <= v  # monotone descent toward the fixpoint


@settings(max_examples=8, deadline=None)
@given(edges_strategy)
def test_truss_survivors_are_input_edges_with_support(spark, und):
    """Truss output is a subset of the canonical input edges; after
    enough rounds every survivor certifies support >= k-2 (converged
    fixpoint on <=15-node graphs within 6 rounds)."""
    from dataengineerchallenge_spark.operators.graph import truss

    canon = sorted({(min(a, b), max(a, b)) for a, b in und})
    df = spark.createDataFrame(canon, "src long, dst long")
    got = {
        (r["src"], r["dst"]): r["support"]
        for r in truss(df, k=3, iters=6).collect()
    }
    assert set(got) <= set(canon)
    assert all(s >= 1 for s in got.values())


@settings(max_examples=8, deadline=None)
@given(edges_strategy)
def test_walks_traverse_only_real_edges(spark, und):
    """Every consecutive (step i -> i+1) hop of every walk is an edge of
    the symmetrized input, and step 0 is the walk's own start node."""
    from collections import defaultdict

    from dataengineerchallenge_spark.operators.graph import deterministic_walks

    edges = _sym(und)
    eset = set(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = deterministic_walks(df, steps=3).collect()
    by_walk = defaultdict(dict)
    for r in rows:
        by_walk[r["walk_id"]][r["step"]] = r["node"]
    for w, steps in by_walk.items():
        assert steps[0] == w
        for i in range(1, 4):
            assert (steps[i - 1], steps[i]) in eset


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["the", "a", "hot", "cake", "deep", "model", "fast"]),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_rake_phrases_are_stopword_free_substrings(spark, tmp_path_factory, corpora):
    """Every emitted phrase is a contiguous stopword-free run of its
    document and scores are positive; ranks are 1..3 without gaps."""
    import os

    from dataengineerchallenge_spark.queries.text import _STOPWORDS, rake_keyphrases

    rows = [
        (i, " ".join(ws), "en", "s", len(" ".join(ws)))
        for i, ws in enumerate(corpora)
    ]
    sf = os.path.join(str(tmp_path_factory.mktemp("rakeprop")), "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    got = rake_keyphrases(spark, sf).collect()
    texts = {i: " ".join(ws) for i, ws in enumerate(corpora)}
    from collections import defaultdict

    ranks = defaultdict(list)
    for r in got:
        words = r["phrase"].split(" ")
        assert not any(w in _STOPWORDS for w in words)
        assert f" {r['phrase']} " in f" {texts[r['doc_id']]} "
        assert r["deg_score"] >= r["n_words"] >= 1
        ranks[r["doc_id"]].append(r["kp_rank"])
    for doc, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1))
