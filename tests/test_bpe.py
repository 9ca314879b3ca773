"""BPE trainer: exact equivalence with a pure-Python reference
implementation, determinism, and corpus smoke."""

from __future__ import annotations

import collections

from dataengineerchallenge_spark.operators.bpe import EOW, train_bpe


def _ref_bpe(texts, n):
    wf = collections.Counter(w for t in texts for w in t.split() if w)
    words = {w: list(w) + [EOW] for w in wf}
    out = []
    for rank in range(n):
        pc = collections.Counter()
        for w, f in wf.items():
            s = words[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        mx = max(pc.values())
        a, b = min(p for p, c in pc.items() if c == mx)
        out.append({"rank": rank, "left": a, "right": b, "merged": a + b, "pair_freq": mx})
        for w in words:
            s = words[w]
            ns, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            words[w] = ns
    return out


def test_bpe_matches_reference_implementation(spark):
    texts = ["low low low lower lowest", "newer newer new wider", "a aa aaa aaaa"]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = train_bpe(docs, n_merges=8)
    assert got == _ref_bpe(texts, 8)


def test_bpe_greedy_left_nonoverlapping_merge(spark):
    """'aaaa' under merge (a,a) must become [aa, aa], not [aa, a, a] or
    overlapping — the fold's greedy-left rule, checked via the ref impl
    on a pathological repeat corpus."""
    texts = ["aaaa aaa aa"]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    assert train_bpe(docs, n_merges=4) == _ref_bpe(texts, 4)


def test_bpe_on_fixture_corpus_smoke(spark):
    from dataengineerchallenge_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    merges = train_bpe(docs, n_merges=6)
    assert len(merges) == 6
    assert [m["rank"] for m in merges] == list(range(6))
    # merged symbols grow out of prior merges or raw chars; freqs non-increasing is
    # NOT guaranteed by BPE, but every pair_freq must be positive
    assert all(m["pair_freq"] > 0 for m in merges)
    # determinism: retraining yields the identical table
    assert train_bpe(docs, n_merges=6) == merges


def test_apply_bpe_matches_reference_token_counts(spark):
    from dataengineerchallenge_spark.operators.bpe import apply_bpe, train_bpe

    texts = {1: "low low low lower lowest", 2: "newer newer new wider", 3: "a aa low"}
    docs = spark.createDataFrame([(i, t) for i, t in texts.items()], ["doc_id", "text"])
    merges = train_bpe(docs, n_merges=6)

    # reference tokenizer: replay merges in rank order per word
    def tokenize(word):
        s = list(word) + [EOW]
        for m in merges:
            ns, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == m["left"] and s[i + 1] == m["right"]:
                    ns.append(m["merged"])
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            s = ns
        return s

    want = {
        i: (sum(len(tokenize(w)) for w in t.split()), len(t.split()))
        for i, t in texts.items()
    }
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_ws_tokens"])
        for r in apply_bpe(docs, merges).collect()
    }
    assert got == want


def test_bpe_property_random_corpora(spark):
    """Hypothesis sweep: on arbitrary small corpora over a 3-letter
    alphabet (dense pair collisions, heavy ties), the distributed trainer
    must match the reference implementation merge for merge."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.lists(st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=12)

    @given(st.lists(words, min_size=1, max_size=3))
    @settings(max_examples=8, deadline=None)
    def check(texts_words):
        texts = [" ".join(ws) for ws in texts_words]
        docs = spark.createDataFrame([(t,) for t in texts], ["text"])
        assert train_bpe(docs, n_merges=5) == _ref_bpe(texts, 5)

    check()
