"""Text-analysis suite vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle import check_query

TX_QUERIES = [
    "tx1_token_counts",
    "tx2_quality_scores",
    "tx3_lang_id",
    "tx4_fingerprints",
    "tx5_corpus_stats",
    "tx6_gopher_rules",
    "tx7_pii_scrub",
    "cls1_classifier_score",
    "bm1_bm25_topk",
    "bm2_bm25_prebuilt",
]


def test_bm2_prebuilt_index_equals_bm1(spark, tmp_path):
    """The full prebuilt lifecycle — save half the corpus, APPEND the other
    half (docfreq merged from partials), load, query with and without
    scan pushdown — is row-for-row identical to bm1's rebuild-per-call
    form. Exercises the disk round-trip the registered in-memory bm2
    query can't."""
    from samsa_spark import tables
    from samsa_spark.operators.text import (
        append_text_index,
        bm25_query,
        bm25_topk,
        save_text_index,
    )

    docs = tables.load(spark, SF_SMALL, "documents")
    corpus = docs.where("doc_id >= 20")
    probes = docs.where("doc_id < 20")
    want = sorted(map(tuple, bm25_topk(docs).collect()))

    path = str(tmp_path / "text_index")
    save_text_index(corpus.where("doc_id % 2 = 0"), path)
    idx = append_text_index(spark, path, corpus.where("doc_id % 2 = 1"))
    got = sorted(map(tuple, bm25_query(idx, probes).collect()))
    assert got == want
    pushed = sorted(map(tuple, bm25_query(idx, probes, pushdown=True).collect()))
    assert pushed == want


@pytest.mark.parametrize("name", TX_QUERIES)
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg


def test_pii_scrub_injected_corpus(spark, tmp_path):
    """The corpus tables contain no PII (the registered query locks the
    no-match path); this locks the match path — counts, redaction, and
    ordering — against the same DuckDB twin on a PII-injected corpus."""
    import pandas as pd

    from samsa_spark.operators.text import _TX7_SQL, pii_scrub
    from tests.oracle import compare, run_oracle

    rows = [
        (0, "contact alice@example.com or bob.smith+x@sub.domain.org today"),
        (1, "call 555-867-5309 or 555.867.5309 x12"),
        (2, "server at 10.0.0.1 and 192.168.100.200 responded"),
        (3, "mixed: a@b.co 123-456-7890 1.2.3.4 end"),
        (4, "clean text with no identifiers at all"),
        (5, "edge: not-an-email@ nor 12-34-5678 nor 1.2.3"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    (tmp_path / "docs").mkdir()
    pdf.to_parquet(tmp_path / "docs" / "documents.parquet", index=False)

    out = pii_scrub(spark.createDataFrame(pdf))
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["n_emails"] == 2 and got[0]["had_pii"]
    assert got[0]["scrubbed"] == "contact [EMAIL] or [EMAIL] today"
    assert got[1]["n_phones"] == 2
    assert got[2]["n_ips"] == 2
    assert got[3]["scrubbed"] == "mixed: [EMAIL] [PHONE] [IP] end"
    assert got[4]["n_emails"] == got[4]["n_phones"] == got[4]["n_ips"] == 0
    assert not got[4]["had_pii"]
    assert not got[5]["had_pii"], "near-miss patterns must not match"

    ok, msg = compare(out, run_oracle(_TX7_SQL, str(tmp_path / "docs")))
    assert ok, msg


def test_bm25_planted_relevance(spark):
    """Behavioral lock beyond the registered oracle: rare shared terms
    dominate (idf), and a long doc with the same matches ranks below the
    tight one (length normalization) — the two properties that make BM25
    BM25 and not raw term counting."""
    from samsa_spark.operators.text import bm25_topk

    rows = [
        (0, "zyxq wvut common"),  # the probe/query doc
        (25, "zyxq wvut common filler filler"),  # both rare terms, short
        (26, "zyxq common filler filler filler"),  # one rare term, short
        (27, "common filler filler filler filler"),  # common term only
        (28, "zyxq wvut common " + " ".join(["pad"] * 40)),  # both, long
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(docs, probe_max_id=20, k=4).collect()
    assert {r.q_id for r in out} == {0}
    order = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    assert order == [25, 28, 26, 27]


def test_gopher_repetition_symbol_alpha_rules(spark, tmp_path):
    """The corpus tables are single-line word salad (zero symbols, no dup
    lines — the registered tx6 query locks that no-op path); this locks the
    discriminating paths of the round-6 signals — duplicate-line fraction,
    symbol-to-word ratio, alphabetic-word fraction — on planted docs
    against hand values AND the DuckDB twin (the tx7 pattern)."""
    import pandas as pd

    from samsa_spark.operators.text import _TX6_SQL, gopher_rules
    from tests.oracle import compare, run_oracle

    # 40 words: one stopword + 39 distinct 7-char words -> every bigram
    # distinct (repetition rules pass), mean word length in [3, 10]
    good = "the " + " ".join(f"wordy{i:02d}" for i in range(39))
    rows = [
        (0, good),
        (1, "line one\nline two\nline one\nline one"),   # 2 dup lines of 4
        (2, "# heading with symbols ... and more ... #"), # 2 hashes + 2 ellipses
        (3, "12 34 56 78 90 11 22 33 44 55"),             # zero alpha words
        (4, good + "\n" + good),                          # 1 dup line of 2
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    (tmp_path / "docs").mkdir()
    pdf.to_parquet(tmp_path / "docs" / "documents.parquet", index=False)

    out = gopher_rules(spark.createDataFrame(pdf))
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["dup_line_frac"] == 0.0 and got[0]["symbol_word_ratio"] == 0.0
    assert got[0]["alpha_word_frac"] == 1.0 and got[0]["passes"]
    assert got[1]["dup_line_frac"] == 0.5          # 4 lines, 2 distinct
    assert got[2]["symbol_word_ratio"] == 0.444444  # 4 symbols / 9 words
    assert got[3]["alpha_word_frac"] == 0.0
    assert not got[3]["passes"]
    assert got[4]["dup_line_frac"] == 0.5
    assert not got[4]["passes"], "dup-line fraction 0.5 must fail the 0.3 cap"

    ok, msg = compare(out, run_oracle(_TX6_SQL, str(tmp_path / "docs")))
    assert ok, msg


def test_corpus_card_estimates_bound_by_exact(spark):
    """cs1's sketches vs the exact values they estimate: HLL distinct
    within 3x the configured rsd, GK percentiles within rank tolerance of
    the exact percentile neighborhood, exact columns exactly right — and
    the HLL estimate invariant under repartitioning (mergeable sketch)."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.text import corpus_card

    docs = tables.load(spark, SF_SMALL, "documents")
    card = {r.source: r for r in corpus_card(docs).collect()}
    toks = F.size(F.split("text", " "))
    exact = {
        r.source: r
        for r in docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(toks.cast("bigint")).alias("total_tokens"),
            F.countDistinct(F.sha2("text", 256)).alias("nd"),
            F.expr(
                "percentile(size(split(text, ' ')), array(0.45, 0.5, 0.55,"
                " 0.85, 0.9, 0.95, 0.97, 0.99, 1.0))"
            ).alias("pcts"),
        )
        .collect()
    }
    assert set(card) == set(exact)
    for src, c in card.items():
        e = exact[src]
        assert c.n_docs == e.n_docs
        assert c.total_tokens == e.total_tokens
        assert abs(c.approx_distinct_contents - e.nd) <= max(2, 0.15 * e.nd)
        lo, mid, hi = e.pcts[0], e.pcts[1], e.pcts[2]
        assert lo <= c.p50_tokens <= hi, (src, c.p50_tokens, (lo, mid, hi))
        assert e.pcts[3] <= c.p90_tokens <= e.pcts[5]
        assert e.pcts[6] <= c.p99_tokens <= e.pcts[8]
    again = {
        r.source: r.approx_distinct_contents
        for r in corpus_card(docs.repartition(11)).collect()
    }
    assert again == {s: c.approx_distinct_contents for s, c in card.items()}


def test_compression_signals_exact_parity_and_discrimination(spark):
    """tx9: zlib_bytes must equal Python zlib on the same strings (same C
    zlib in this container), raw_bytes must be UTF-8 byte length (not char
    count), and the ratio must discriminate a highly repetitive doc from a
    high-entropy one."""
    import zlib

    import pandas as pd

    from samsa_spark import tables
    from samsa_spark.operators.text import compression_signals

    docs = tables.load(spark, SF_SMALL, "documents").limit(50)
    got = {r.doc_id: r for r in compression_signals(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        want = len(zlib.compress(row.text.encode("utf-8"), 6))
        assert got[row.doc_id].zlib_bytes == want
        assert got[row.doc_id].raw_bytes == len(row.text.encode("utf-8"))

    rep = "copy paste boilerplate " * 200
    rand = " ".join(f"w{i * 2654435761 % 999983}" for i in range(600))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [rep, rand]})
    )
    r = {x.doc_id: x.compression_ratio for x in compression_signals(df).collect()}
    assert r[1] < 0.05 < 0.3 < r[2], r


def test_classifier_score_trained_weights_path(spark):
    """cls1 with a real (token, weight) model table: score must equal the
    Python-computed sigmoid of the mean weight (OOV tokens contribute 0),
    and the 0.5 threshold must separate good from bad docs."""
    import math

    import pandas as pd

    from samsa_spark.operators.text import classifier_score

    w = spark.createDataFrame(
        pd.DataFrame({"token": ["good", "great", "bad"], "weight": [2.0, 3.0, -4.0]})
    )
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "good great good",          # mean 7/3 -> keep
                    "bad bad unseen",           # mean -8/3 -> drop
                    "unseen tokens only here",  # mean 0 -> sigmoid .5 -> keep
                    "",                         # token-less -> NULL score, drop
                ],
            }
        )
    )
    got = {r.doc_id: r for r in classifier_score(docs, weights=w).collect()}

    def sig(x):
        return round(1 / (1 + math.exp(-x)), 6)

    assert got[0].clf_score == sig(7 / 3) and got[0].keep
    assert got[1].clf_score == sig(-8 / 3) and not got[1].keep
    assert got[2].clf_score == sig(0.0) and got[2].keep
    assert got[3].clf_score is None and not got[3].keep
    assert got[3].n_scored_tokens == 0 and got[0].n_scored_tokens == 3


def test_classifier_score_standin_matches_python_model(spark):
    """The hash stand-in path recomputed in pure Python (hashlib sha256,
    same 24-bit prefix scaling) must agree exactly after the 6dp round."""
    import hashlib
    import math

    import pandas as pd

    from samsa_spark.operators.text import classifier_score

    texts = {0: "alpha beta gamma", 1: "one one one one", 2: "zz"}
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = {r.doc_id: r.clf_score for r in classifier_score(docs).collect()}
    for d, t in texts.items():
        toks = [x for x in t.split(" ") if x]
        hs = [
            int(hashlib.sha256(x.encode()).hexdigest()[:6], 16) for x in toks
        ]
        mean_w = sum(hs) / len(hs) / float(1 << 23) - 1
        want = round(1 / (1 + math.exp(-mean_w)), 6)
        assert got[d] == pytest.approx(want, abs=1e-9), (d, got[d], want)


def test_tok1_oracle_match(spark):
    ok, msg = check_query(spark, "tok1_bpe_pair_counts", SF_SMALL)
    assert ok, msg


def test_bpe_pair_counts_hand_computed(spark):
    """The BPE statistic on a corpus small enough to count by hand:
    pair counts are word-frequency-weighted, within-word only, and the
    top pair is the one the first merge would pick."""
    import pandas as pd

    from samsa_spark.operators.text import bpe_pair_counts

    # "low" x3, "lower" x1  ->  ('l','o'): 4, ('o','w'): 4, ('w','e'): 1,
    # ('e','r'): 1. Single-char words contribute nothing.
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["low low lower a", "low a a"]})
    )
    got = {(r["left"], r["right"]): r.pair_count for r in bpe_pair_counts(docs).collect()}
    assert got == {("l", "o"): 4, ("o", "w"): 4, ("w", "e"): 1, ("e", "r"): 1}


def test_text_ops_unicode_parity(spark):
    """Cross-engine unicode contract on planted CJK/emoji/combining-mark
    docs: tx1's four counts (codepoint length, UTF-8 bytes, whitespace
    split, ASCII regex tokens) must match DuckDB exactly — the encodings
    where engines classically diverge (UTF-16 code units vs codepoints vs
    graphemes)."""
    import duckdb
    import pandas as pd

    from samsa_spark.operators.text import _TX1_SQL, token_counts
    from tests.oracle import compare

    rows = [
        (0, "汉字测试 四个 词"),                      # CJK, 3 ws-tokens
        (1, "emoji 🙂 and 👍🏽 mixed"),               # astral-plane + modifier
        (2, "café combining acute"),           # e + U+0301
        (3, "tabs\tand  double  spaces"),
        (4, "ascii only words here"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = con.execute(_TX1_SQL).fetchdf()
    ok, msg = compare(token_counts(spark.createDataFrame(pdf)), oracle)
    assert ok, msg
    # spot-check the invariants the comparison relies on
    got = {r.doc_id: r for r in token_counts(spark.createDataFrame(pdf)).collect()}
    assert got[1].n_chars_computed == len(rows[1][1]), "codepoints, not code units"
    assert got[1].n_bytes == len(rows[1][1].encode("utf-8"))
    assert got[2].n_chars_computed == len("café combining acute")


def test_cs2_mergeable_card_merge_equals_whole(spark):
    """The incremental-stats contract: merging per-batch partial cards must
    give EXACTLY the card of the union corpus (HLL set union is exact on
    the sketch), three-way splits included, and the estimate must bound
    the exact distinct count like cs1's."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.text import corpus_card_partial, merge_corpus_cards

    docs = tables.load(spark, SF_SMALL, "documents")
    whole = {
        r.source: (r.n_docs, r.total_tokens, r.approx_distinct_contents)
        for r in merge_corpus_cards(corpus_card_partial(docs)).collect()
    }
    thirds = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    merged = {
        r.source: (r.n_docs, r.total_tokens, r.approx_distinct_contents)
        for r in merge_corpus_cards(*[corpus_card_partial(t) for t in thirds]).collect()
    }
    assert merged == whole
    exact = {
        r.source: r.nd
        for r in docs.groupBy("source")
        .agg(F.countDistinct(F.sha2("text", 256)).alias("nd"))
        .collect()
    }
    for src, (_, _, est) in whole.items():
        assert abs(est - exact[src]) <= max(2, 0.15 * exact[src])


def test_cs2_rows_only_query_runs(spark):
    from tests.oracle import check_query

    ok, msg = check_query(spark, "cs2_mergeable_card", SF_SMALL)
    assert ok, msg


def test_hh1_oracle_match(spark):
    ok, msg = check_query(spark, "hh1_heavy_ngrams", SF_SMALL)
    assert ok, msg


def test_hh1_planted_skew_hand_computed(spark):
    """Threshold heavy hitters on a corpus with known counts: the planted
    boilerplate trigram must surface with its exact count; everything under
    the threshold must not, including items the sketch tracked as
    candidates (the exact-rescan false-positive removal)."""
    import pandas as pd

    from samsa_spark.operators.text import heavy_ngrams

    boiler = "all rights reserved"
    rows = [(i, f"doc {i} body {boiler}") for i in range(30)]
    rows += [(100 + i, f"unique text number {i} here") for i in range(10)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        r.gram: r.n_occurrences
        for r in heavy_ngrams(docs, n=3, min_count=25).collect()
    }
    # "body all rights" and "all rights reserved" occur 30x; nothing else
    # reaches 25 ("doc <i> body" is unique per doc).
    assert got == {"body all rights": 30, "all rights reserved": 30}


def test_hh1_candidate_coverage_under_eviction(spark):
    """The no-false-negative contract with a sketch FAR smaller than the
    keyspace: 500 distinct background grams against max_tracked=64 still
    must surface the planted heavy hitter exactly — eviction can only
    inflate sketch counts, never drop a true heavy above the error bound."""
    import pandas as pd

    from samsa_spark.operators.text import heavy_ngrams

    rows = [(i, "spark eats boilerplate fast") for i in range(200)]
    rows += [(1000 + i, f"filler {i} noise {i * 7} pad {i * 13}") for i in range(500)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        r.gram: r.n_occurrences
        for r in heavy_ngrams(
            docs, n=3, min_count=150, max_candidates=32, max_tracked=64
        ).collect()
    }
    assert got == {"spark eats boilerplate": 200, "eats boilerplate fast": 200}


def test_hh2_merge_equals_single_pass_and_exact(spark):
    """While max_tracked exceeds the distinct-gram count the sketch never
    evicts: combine(thirds) must EQUAL a single-pass sketch over the whole
    corpus, and both must equal exact group-by counts."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.text import (
        _ngram_frame,
        merge_topk_sketches,
        topk_sketch_partial,
    )

    docs = tables.load(spark, SF_SMALL, "documents")
    whole = {
        r.gram: r.est_count
        for r in merge_topk_sketches(topk_sketch_partial(docs), k=10).collect()
    }
    thirds = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    merged = {
        r.gram: r.est_count
        for r in merge_topk_sketches(
            *[topk_sketch_partial(t) for t in thirds], k=10
        ).collect()
    }
    assert merged == whole
    exact = {
        r.gram: r.n
        for r in _ngram_frame(docs, 3)
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "gram")
        .limit(40)
        .collect()
    }
    for gram, est in whole.items():
        assert exact[gram] == est, (gram, est, exact.get(gram))


def test_hh2_rows_only_query_runs(spark):
    from tests.oracle import check_query

    ok, msg = check_query(spark, "hh2_mergeable_topk", SF_SMALL)
    assert ok, msg


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Tiny alphabet + short docs: gram collisions, threshold boundaries, and
# sub-n docs occur constantly; hypothesis shrinks any counterexample.
_hh_doc_strategy = st.lists(
    st.lists(st.sampled_from("ab"), min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=10,
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=_hh_doc_strategy,
    n=st.integers(min_value=2, max_value=3),
    min_count=st.integers(min_value=1, max_value=4),
)
def test_hh1_matches_brute_force_on_random_corpora(spark, texts, n, min_count):
    """hh1 (sketch candidates + exact rescan) must equal the brute-force
    n-gram count model for every corpus/threshold, including min_count=1
    (every gram is a heavy hitter — the candidate list must cover them
    all) and empty-gram corpora."""
    from collections import Counter

    from samsa_spark.operators.text import heavy_ngrams

    want = Counter()
    for t in texts:
        toks = [x for x in t.split(" ") if x]
        for i in range(len(toks) - n + 1):
            want[" ".join(toks[i : i + n])] += 1
    want = {g: c for g, c in want.items() if c >= min_count}

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.gram: r.n_occurrences
        for r in heavy_ngrams(df, n=n, min_count=min_count).collect()
    }
    assert got == want


def _py_bpe_train(word_freqs: dict[str, int], n_merges: int):
    """Independent reference BPE trainer (Sennrich et al. 2016): count
    adjacent symbol pairs weighted by word frequency, merge the argmax
    (ties: lexicographic), repeat."""
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, sym in vocab.items():
            f = word_freqs[w]
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        for w, sym in vocab.items():
            out, prev = [], None
            for s in sym:
                if prev == a and s == b:
                    out.append(a + b)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = s
            if prev is not None:
                out.append(prev)
            vocab[w] = out
    return merges, vocab


def test_tok2_matches_python_reference_trainer(spark):
    """The learned merge sequence (order, pairs, and counts) must equal the
    independent pure-Python trainer on the classic BPE corpus — including
    merges of already-merged symbols (multi-char pairs)."""
    import pandas as pd

    from samsa_spark.operators.text import train_bpe_merges

    texts = ["low low low lower lower", "newest newest widest low", "new new newest"]
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    want, _ = _py_bpe_train(wf, 8)

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = [
        (r.left, r.right, r.pair_count)
        for r in train_bpe_merges(docs, n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want
    assert any(len(a) > 1 or len(b) > 1 for a, b, _ in got), (
        "fixture too small: no multi-char merge exercised"
    )


def test_tok2_deterministic_under_repartition(spark):
    import pandas as pd

    from samsa_spark.operators.text import train_bpe_merges

    texts = ["spark spark sharded shard", "shard spark sharded streams"]
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1], "text": texts}))
    a = [tuple(r) for r in train_bpe_merges(docs, n_merges=6).orderBy("merge_rank").collect()]
    b = [
        tuple(r)
        for r in train_bpe_merges(docs.repartition(7), n_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    assert a == b and len(a) == 6


def test_tok2_first_merge_equals_tok1_top_pair(spark):
    """tok1 is tok2's first iteration by construction: the top tok1 pair
    must be the rank-0 learned merge on the gate corpus."""
    from samsa_spark import tables
    from samsa_spark.operators.text import bpe_pair_counts, train_bpe_merges

    docs = tables.load(spark, SF_SMALL, "documents")
    top = bpe_pair_counts(docs, top=1).collect()[0]
    first = train_bpe_merges(docs, n_merges=1).collect()[0]
    assert (first.left, first.right, first.pair_count) == (
        top["left"],
        top["right"],
        top.pair_count,
    )


def _py_bpe_train_batched(word_freqs: dict[str, int], n_merges: int, batch: int):
    """Independent reference for BATCHED BPE with train_bpe_merges's exact
    selection rule: per pass, sort the count table by (count desc, left,
    right), consider only the first 4*want+8 rows (the Spark collect
    bound), greedily keep symbol-disjoint pairs (no shared left/right and
    neither symbol equal to an already-chosen pair's concat), apply them
    all to the pass-start vocab, recount."""
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        counts: dict[tuple[str, str], int] = {}
        for w, sym in vocab.items():
            f = word_freqs[w]
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: 4 * want + 8]
        used: set[str] = set()
        new_syms: set[str] = set()
        chosen = []
        for (a, b), c in top:
            if len(chosen) == want:
                break
            if {a, b} & (used | new_syms):
                continue
            used.update((a, b))
            new_syms.add(a + b)
            chosen.append((a, b, c))
        merges.extend(chosen)
        pair_set = {(a, b): a + b for a, b, _ in chosen}
        for w, sym in vocab.items():
            out, prev = [], None
            for s in sym:
                if prev is not None and (prev, s) in pair_set:
                    out.append(pair_set[(prev, s)])
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = s
            if prev is not None:
                out.append(prev)
            vocab[w] = out
    return merges, vocab


def test_tok2_batched_matches_python_batched_trainer(spark):
    """batch=M must equal the independent batched Python trainer (same
    selection rule) — and batch=1 must stay byte-identical to the strict
    sequential trainer, the exactness contract of the default."""
    import pandas as pd

    from samsa_spark.operators.text import train_bpe_merges

    texts = ["low low low lower lower", "newest newest widest low", "new new newest"]
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    for m in (3, 8):
        want, _ = _py_bpe_train_batched(wf, 8, m)
        got = [
            (r.left, r.right, r.pair_count)
            for r in train_bpe_merges(docs, n_merges=8, batch=m)
            .orderBy("merge_rank")
            .collect()
        ]
        assert got == want, (m, got, want)
    # M=1 == strict sequential (the batched trainer degenerates to it too)
    seq, _ = _py_bpe_train(wf, 8)
    got1 = [
        (r.left, r.right, r.pair_count)
        for r in train_bpe_merges(docs, n_merges=8, batch=1)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got1 == seq


def test_tok2_batched_deterministic_under_repartition(spark):
    import pandas as pd

    from samsa_spark.operators.text import train_bpe_merges

    texts = ["spark spark sharded shard", "shard spark sharded streams"]
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1], "text": texts}))
    a = [
        tuple(r)
        for r in train_bpe_merges(docs, n_merges=6, batch=4)
        .orderBy("merge_rank")
        .collect()
    ]
    b = [
        tuple(r)
        for r in train_bpe_merges(docs.repartition(7), n_merges=6, batch=4)
        .orderBy("merge_rank")
        .collect()
    ]
    assert a == b and len(a) == 6


def test_apply_bpe_encodes_like_reference(spark):
    """apply_bpe must reproduce the reference encoder on every word (the
    trained vocab IS the reference encoding of the training words), and
    token concatenation must round-trip the input characters."""
    import pandas as pd

    from samsa_spark.operators.text import apply_bpe, train_bpe_merges

    texts = ["low low low lower lower", "newest newest widest low", "new new newest"]
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    merges_ref, vocab_ref = _py_bpe_train(wf, 8)

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        r.doc_id: (list(r.tokens), r.n_tokens)
        for r in apply_bpe(docs, [(a, b) for a, b, _ in merges_ref]).collect()
    }
    for i, t in enumerate(texts):
        want = [s for w in t.split(" ") if w for s in vocab_ref[w]]
        assert got[i][0] == want, (i, got[i][0], want)
        assert got[i][1] == len(want)
        assert "".join(got[i][0]) == t.replace(" ", "")


def test_tok2_rows_only_query_runs(spark):
    from tests.oracle import check_query

    ok, msg = check_query(spark, "tok2_bpe_train", SF_SMALL)
    assert ok, msg


def test_cs3_overlap_exact_on_planted_sources(spark):
    """Theta-sketch set algebra is EXACT below the sketch's nominal
    entries: planted sources with known shared/unique contents must give
    exact intersection/difference/union/Jaccard, invariant under
    repartitioning (theta keeps the k minimum hashes — deterministic)."""
    import pandas as pd

    from samsa_spark.operators.text import corpus_overlap

    rows = []
    for i in range(30):
        rows.append((len(rows), f"shared {i}", "a"))
        rows.append((len(rows), f"shared {i}", "b"))  # 30 common contents
    for i in range(20):
        rows.append((len(rows), f"only a {i}", "a"))
    for i in range(10):
        rows.append((len(rows), f"only b {i}", "b"))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    )
    for d in (docs, docs.repartition(7)):
        got = corpus_overlap(d).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.source_a, r.source_b) == ("a", "b")
        assert (r.est_common, r.est_a_only, r.est_b_only, r.est_union) == (
            30.0,
            20.0,
            10.0,
            60.0,
        )
        assert r.est_jaccard == 0.5


def test_cs3_rows_only_query_runs(spark):
    from tests.oracle import check_query

    ok, msg = check_query(spark, "cs3_corpus_overlap", SF_SMALL)
    assert ok, msg


def test_cs2_merged_quantiles_bound_exact(spark):
    """The KLL half of the mergeable card: at gate scale (n per source <
    k) the sketch stores values exactly, so merged p50/p95 must land on
    actual per-source token counts inside the exact inter-quantile
    neighborhood, and merge(thirds) must agree with the whole-corpus
    card."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.text import corpus_card_partial, merge_corpus_cards

    docs = tables.load(spark, SF_SMALL, "documents")
    whole = {
        r.source: (r.approx_p50_tokens, r.approx_p95_tokens)
        for r in merge_corpus_cards(corpus_card_partial(docs)).collect()
    }
    thirds = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    merged = {
        r.source: (r.approx_p50_tokens, r.approx_p95_tokens)
        for r in merge_corpus_cards(*[corpus_card_partial(t) for t in thirds]).collect()
    }
    assert merged == whole
    exact = {
        s: sorted(v)
        for s, v in (
            docs.select("source", F.size(F.split("text", " ")).alias("n"))
            .groupBy("source")
            .agg(F.collect_list("n").alias("ns"))
            .rdd.map(lambda r: (r.source, list(r.ns)))
            .collect()
        )
    }
    for s, (p50, p95) in whole.items():
        ns = exact[s]
        lo50, hi50 = ns[int(0.35 * len(ns))], ns[min(int(0.65 * len(ns)), len(ns) - 1)]
        assert lo50 <= p50 <= hi50, (s, p50, lo50, hi50)
        lo95 = ns[int(0.85 * len(ns))]
        assert lo95 <= p95 <= ns[-1], (s, p95, lo95, ns[-1])


def test_hh1_sketch_and_groupby_forms_agree(spark):
    """The two hh1 plans (sketch-candidates+rescan vs plain partial-agg
    group-by) are the same operator — identical output on the gate corpus
    (the PLANS.md heavy sweep picks between them by keyspace regime)."""
    from samsa_spark import tables
    from samsa_spark.operators.text import heavy_ngrams

    docs = tables.load(spark, SF_SMALL, "documents")
    a = {(r.gram, r.n_occurrences) for r in heavy_ngrams(docs).collect()}
    b = {(r.gram, r.n_occurrences) for r in heavy_ngrams(docs, sketch=False).collect()}
    assert a == b and a


def test_sketch_partials_roundtrip_parquet(spark, tmp_path):
    """The incremental claim behind cs2/hh2 — 'yesterday's partials
    persist as small parquet' — requires the binary sketch columns to
    survive a parquet write/read and still merge: merged(from-disk
    halves) must equal merged(in-memory halves) for both the HLL card
    and the frequent-items top-k."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.text import (
        corpus_card_partial,
        merge_corpus_cards,
        merge_topk_sketches,
        topk_sketch_partial,
    )

    docs = tables.load(spark, SF_SMALL, "documents")
    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)

    pa, pb = str(tmp_path / "card_a"), str(tmp_path / "card_b")
    corpus_card_partial(half_a).write.parquet(pa)
    corpus_card_partial(half_b).write.parquet(pb)
    from_disk = {
        tuple(r)
        for r in merge_corpus_cards(
            spark.read.parquet(pa), spark.read.parquet(pb)
        ).collect()
    }
    in_mem = {
        tuple(r)
        for r in merge_corpus_cards(
            corpus_card_partial(half_a), corpus_card_partial(half_b)
        ).collect()
    }
    assert from_disk == in_mem and from_disk

    ta, tb = str(tmp_path / "topk_a"), str(tmp_path / "topk_b")
    topk_sketch_partial(half_a).write.parquet(ta)
    topk_sketch_partial(half_b).write.parquet(tb)
    disk_topk = {
        (r.gram, r.est_count)
        for r in merge_topk_sketches(
            spark.read.parquet(ta), spark.read.parquet(tb), k=10
        ).collect()
    }
    mem_topk = {
        (r.gram, r.est_count)
        for r in merge_topk_sketches(
            topk_sketch_partial(half_a), topk_sketch_partial(half_b), k=10
        ).collect()
    }
    assert disk_topk == mem_topk and disk_topk


from hypothesis import HealthCheck as _HC2  # noqa: E402


@settings(max_examples=10, deadline=None, suppress_health_check=list(_HC2))
@given(
    texts=st.lists(
        st.lists(
            st.lists(st.sampled_from("abc"), min_size=1, max_size=5).map("".join),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    n_merges=st.integers(min_value=1, max_value=5),
)
def test_tok2_matches_reference_on_random_corpora(spark, texts, n_merges):
    """tok2 vs the independent Python trainer on random small-alphabet
    corpora: merge ties, single-char words, and early exhaustion (fewer
    pairs than n_merges) occur constantly; hypothesis shrinks any
    counterexample."""
    from tests.test_text import _py_bpe_train

    from samsa_spark.operators.text import train_bpe_merges

    wf: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    want, _ = _py_bpe_train(wf, n_merges)

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.left, r.right, r.pair_count)
        for r in train_bpe_merges(df, n_merges=n_merges).orderBy("merge_rank").collect()
    ]
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(_HC2))
@given(
    texts=st.lists(
        st.lists(
            st.lists(st.sampled_from("abc"), min_size=1, max_size=5).map("".join),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    n_merges=st.integers(min_value=1, max_value=5),
    batch=st.integers(min_value=2, max_value=4),
)
def test_tok2_batched_matches_reference_on_random_corpora(spark, texts, n_merges, batch):
    """Batched tok2 vs the batched Python model on random small-alphabet
    corpora — disjointness skips, pass-boundary interactions, and early
    exhaustion all occur; hypothesis shrinks any divergence."""
    from tests.test_text import _py_bpe_train_batched

    from samsa_spark.operators.text import train_bpe_merges

    wf: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    want, _ = _py_bpe_train_batched(wf, n_merges, batch)

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.left, r.right, r.pair_count)
        for r in train_bpe_merges(df, n_merges=n_merges, batch=batch)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want


def test_pmi1_oracle_match(spark):
    from tests.oracle import check_query

    ok, msg = check_query(spark, "pmi1_collocations", SF_SMALL)
    assert ok, msg


def test_pmi1_planted_collocation_and_support_floor(spark):
    """A pair that ALWAYS co-occurs ('aa bb') must out-PMI pairs of
    independently frequent words, and a pair below the relative support
    floor must not appear at all regardless of its PMI."""
    from samsa_spark.operators.text import pmi_collocations

    rows = []
    # 30 docs gluing aa->bb (the collocation), amid common filler
    for i in range(30):
        rows.append((i, "aa bb the of the of"))
    # 30 docs where cc and dd are frequent but never adjacent to each other
    for i in range(30, 60):
        rows.append((i, "cc the dd of cc the dd"))
    # one doc with a unique adjacent pair -> huge PMI but support 1
    rows.append((60, "zz qq"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # support floor: pair must hold >= 1/40 of all bigrams
    out = pmi_collocations(docs, k=10, support_denom=40).collect()
    pairs = {(r.w1, r.w2): r for r in out}
    assert ("aa", "bb") in pairs
    assert ("zz", "qq") not in pairs  # support-floored out
    top = min(out, key=lambda r: r.rank)
    assert (top.w1, top.w2) == ("aa", "bb")
    # independence -> PMI near 0; the glued pair must dominate it
    for key in [("cc", "the"), ("the", "dd"), ("of", "cc")]:
        if key in pairs:
            assert pairs[key].pmi < pairs[("aa", "bb")].pmi


def test_psi1_oracle_match(spark):
    from tests.oracle import check_query

    ok, msg = check_query(spark, "psi1_quality_drift", SF_SMALL)
    assert ok, msg


def test_psi1_planted_shift_dominates_and_identical_sources_near_zero(spark):
    """A source whose quality distribution is genuinely shifted must carry
    a PSI an order of magnitude above sources drawn from the same
    distribution (which sit near 0 — the PSI identity), and PSI must be
    content-blind: a source with all-NEW text but the same quality profile
    stays near 0 (the cs3-overlap contrast)."""
    from samsa_spark.operators.text import quality_drift

    same = "the quick brown fox jumps over the lazy dog again and again"
    fresh = "a quiet green bird walks under the tall oak tree every day"
    shifted = "zzzz9 !!!! #### 0000 xx@@ %%%% ~~~~ &&&& ???? ++++"
    rows = []
    i = 0
    for _ in range(40):
        rows.append((i, same, "srcA")); i += 1
    for _ in range(40):
        rows.append((i, fresh, "srcB")); i += 1  # new content, same profile
    # the outlier is SMALL so each healthy source's "rest" stays mostly
    # healthy — PSI is vs-rest, so a large outlier would inflate everyone
    for _ in range(10):
        rows.append((i, shifted, "srcC")); i += 1  # shifted quality profile
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in quality_drift(docs).collect()}
    assert set(got) == {"srcA", "srcB", "srcC"}
    assert got["srcC"].psi > 0.25  # conventionally "shifted"
    assert got["srcC"].psi > 5 * max(abs(got["srcA"].psi), abs(got["srcB"].psi))
    # content-blind: srcB's text is all-new vs srcA but same profile, so
    # their drift scores agree (symmetric construction)
    assert abs(got["srcA"].psi - got["srcB"].psi) < 0.05


def _py_bm25(rows, probe_max_id=20, k=5, k1=1.2, b=0.75):
    """Independent plain-Python BM25 — deliberately written from the
    textbook formula with its own code shape (dicts + math.log), so a
    structural bug shared by the Spark expression and the SQL twin
    (note-27's shared-formula blindness) cannot hide here."""
    import math

    corpus = {d: t.split(" ") for d, t in rows if d >= probe_max_id}
    queries = {d: t.split(" ") for d, t in rows if d < probe_max_id}
    n = len(corpus)
    dl = {d: len(ts) for d, ts in corpus.items()}
    avgdl = sum(dl.values()) / n
    df: dict = {}
    for ts in corpus.values():
        for w in set(ts):
            df[w] = df.get(w, 0) + 1
    out = {}
    for q, qts in queries.items():
        scores: dict = {}
        for w in set(qts):
            if w not in df:
                continue
            idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
            for d, ts in corpus.items():
                tf = ts.count(w)
                if tf == 0:
                    continue
                denom = tf + k1 * (1 - b + b * dl[d] / avgdl)
                scores[d] = scores.get(d, 0.0) + round(idf * tf * (k1 + 1) / denom, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[q] = [(d, round(s, 6)) for d, s in ranked]
    return out


def test_bm25_matches_independent_python_model_on_random_corpora(spark):
    """Model check on random corpora: Spark BM25 == the independent
    Python implementation (scores to 6dp, full rank order)."""
    import random

    for seed in (3, 17, 92):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]
        rows = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(3, 25))))
            for i in range(60)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        from samsa_spark.operators.text import bm25_topk

        got: dict = {}
        for r in bm25_topk(docs).collect():
            got.setdefault(r.q_id, []).append((r.rank, r.doc_id, round(r.score, 6)))
        got = {q: [(d, s) for _, d, s in sorted(v)] for q, v in got.items()}
        want = _py_bm25(rows)
        want = {q: v for q, v in want.items() if v}
        assert got == want, f"seed {seed}"


def test_pmi_matches_independent_python_model_on_random_corpora(spark):
    """Model check: pmi1's candidate set, counts, and rounded PMI values
    against an independent plain-Python implementation."""
    import math
    import random

    for seed in (5, 41):
        rng = random.Random(seed)
        vocab = [f"t{i}" for i in range(12)]
        rows = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(2, 15))))
            for i in range(40)
        ]
        # python model
        bigrams: dict = {}
        uni: dict = {}
        B = 0
        T = 0
        for _, t in rows:
            ts = t.split(" ")
            for w in ts:
                uni[w] = uni.get(w, 0) + 1
                T += 1
            for a, b2 in zip(ts, ts[1:]):
                bigrams[(a, b2)] = bigrams.get((a, b2), 0) + 1
                B += 1
        denom = 50
        cands = {p: c for p, c in bigrams.items() if c * denom >= B}
        scored = {
            p: round(math.log((c / B) / ((uni[p[0]] / T) * (uni[p[1]] / T))), 6)
            for p, c in cands.items()
        }
        ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        want = [(p[0], p[1], cands[p], s) for p, s in ranked]

        from samsa_spark.operators.text import pmi_collocations

        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = [
            (r.w1, r.w2, r.pair_count, round(r.pmi, 6))
            for r in sorted(
                pmi_collocations(docs, k=10, support_denom=denom).collect(),
                key=lambda r: r.rank,
            )
        ]
        assert got == want, f"seed {seed}"


def test_psi_matches_independent_python_model_on_random_corpora(spark):
    """Model check: psi1 vs an independent Python implementation of the
    whole pipeline (tx2 score, 3-dp rounding, clamped binning, Laplace
    smoothing, 6-dp term rounding) on random corpora."""
    import math
    import random

    from samsa_spark.operators.text import _STOP_EN, quality_drift

    def py_score(text):
        n_chars = len(text)
        alpha = sum(1 for c in text if c.isalpha() and ord(c) < 128)
        # tx2's alpha regex is [A-Za-z]; isalpha over ascii matches it
        spaces = text.count(" ")
        toks = text.split(" ")
        n_toks = len(toks)
        stop = sum(1 for t in toks if t in _STOP_EN)
        return (
            0.4 * (alpha / n_chars)
            + 0.3 * (stop / n_toks)
            + 0.3 * (1.0 - abs((n_chars - spaces) / n_toks - 5.0) / 10.0)
        )

    for seed in (7, 23):
        rng = random.Random(seed)
        words = ["the", "of", "and", "alpha", "beta", "x9", "zz!!", "qqqq"]
        rows = [
            (
                i,
                " ".join(rng.choices(words, k=rng.randint(2, 12))),
                f"s{rng.randint(0, 3)}",
            )
            for i in range(80)
        ]
        counts: dict = {}
        ns: dict = {}
        for _, t, s in rows:
            b = min(max(int(math.floor(round(py_score(t), 3) * 10)), 0), 9)
            counts[(s, b)] = counts.get((s, b), 0) + 1
            ns[s] = ns.get(s, 0) + 1
        total = sum(ns.values())
        gb = {b: sum(c for (s2, b2), c in counts.items() if b2 == b) for b in range(10)}
        want = {}
        for s, n in ns.items():
            psi = 0.0
            for b in range(10):
                sc = counts.get((s, b), 0)
                ps = (sc + 1.0) / (n + 10)
                pr = (gb[b] - sc + 1.0) / (total - n + 10)
                psi += round((ps - pr) * math.log(ps / pr), 6)
            want[s] = (n, round(psi, 6))

        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {r.source: (r.n_docs, round(r.psi, 6)) for r in quality_drift(docs).collect()}
        assert got == want, f"seed {seed}"


# --- cls2: in-engine classifier training ------------------------------------


def _planted_label_corpus(spark, n=200, seed=3):
    """Binary-labeled corpus with a real signal: label-1 docs draw half
    their tokens from a 'good' vocabulary, label-0 from a 'bad' one, both
    mixed with shared filler — separable, but not trivially (the filler
    buckets carry no label information)."""
    import random

    rng = random.Random(seed)
    good = [f"good{i}" for i in range(30)]
    bad = [f"bad{i}" for i in range(30)]
    common = [f"filler{i}" for i in range(50)]
    rows = []
    for i in range(n):
        y = i % 2
        pool = good if y else bad
        toks = [rng.choice(pool) for _ in range(8)] + [
            rng.choice(common) for _ in range(8)
        ]
        rng.shuffle(toks)
        rows.append((i, " ".join(toks), y))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def _numpy_trainer(docs, n_features, iters, lr):
    """Independently coded full-batch logistic trainer (the note-27
    shared-formula antidote): same math as cls2, separate implementation
    path — dense feature matrix, hashlib bucket hash, vectorized GD."""
    import hashlib

    import numpy as np

    X = np.zeros((len(docs), n_features))
    y = np.zeros(len(docs))
    for r, (text, label) in enumerate(docs):
        toks = [t for t in text.split(" ") if t != ""]
        for t in toks:
            b = int(hashlib.sha256(t.encode()).hexdigest()[:8], 16) % n_features
            X[r, b] += 1.0
        X[r] /= len(toks)
        y[r] = label
    w = np.zeros(n_features)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * (X.T @ (p - y)) / len(docs)
    return w


def test_cls2_matches_independent_numpy_trainer(spark):
    """The Spark gradient loop must reproduce the independently coded
    numpy trainer's weights to float tolerance on the same corpus and
    hyperparameters (token -> bucket -> weight checked per vocab token)."""
    import hashlib

    from samsa_spark.operators.text import train_classifier

    docs = _planted_label_corpus(spark)
    nf, iters, lr = 64, 10, 5.0
    got = {
        r.token: r.weight
        for r in train_classifier(
            docs, n_features=nf, iters=iters, lr=lr
        ).collect()
    }
    rows = [(r.text, r.label) for r in docs.collect()]
    w = _numpy_trainer(rows, nf, iters, lr)
    assert len(got) == 110  # 30 good + 30 bad + 50 filler
    for tok, wt in got.items():
        b = int(hashlib.sha256(tok.encode()).hexdigest()[:8], 16) % nf
        assert abs(wt - w[b]) < 1e-9, (tok, wt, w[b])


def test_cls2_weights_separate_planted_labels_through_cls1(spark):
    """The composition the operator exists for: cls2's weights fed to
    cls1's broadcast-join scorer must classify HELD-OUT planted docs at
    >= 0.9 accuracy (train on 3/4, test on the held-out quarter)."""
    import pyspark.sql.functions as F

    from samsa_spark.operators.text import classifier_score, train_classifier

    docs = _planted_label_corpus(spark, n=400)
    train = docs.where(F.col("doc_id") % 4 != 0)
    test = docs.where(F.col("doc_id") % 4 == 0)
    w = train_classifier(train, n_features=256, iters=40, lr=100.0)
    scored = classifier_score(test.select("doc_id", "text"), weights=w)
    joined = scored.join(test.select("doc_id", "label"), "doc_id").collect()
    acc = sum(1 for r in joined if int(r.keep) == r.label) / len(joined)
    assert acc >= 0.9, f"held-out accuracy {acc}"


def test_cls2_registry_query_runs_and_is_cls1_consumable(spark):
    """The registered rows-only form (English-vs-rest on the fixture lang
    column) returns one weight per vocabulary token and plugs straight
    into cls1 without error."""
    from samsa_spark import registry
    from samsa_spark import tables
    from samsa_spark.operators.text import classifier_score

    w = registry.all_queries()["cls2_train_classifier"](spark, SF_SMALL)
    rows = w.collect()
    assert len(rows) > 0
    assert {c for c in w.columns} == {"token", "weight"}
    assert len({r.token for r in rows}) == len(rows)  # one row per token
    docs = tables.load(spark, SF_SMALL, "documents")
    out = classifier_score(docs, weights=w)
    assert out.count() == docs.count()


def test_tok3_registry_encode_matches_python_train_encode_composition(spark):
    """The registered train->encode loop (tok3) against the full Python
    composition: batched-Python-train 8 merges on the gate corpus's word
    frequencies, Python-encode every word greedily in rank order, compare
    per-doc BPE token counts exactly."""
    from samsa_spark import registry, tables

    docs = tables.load(spark, SF_SMALL, "documents").select("doc_id", "text")
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    wf: dict[str, int] = {}
    for _, t in rows:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    merges, _ = _py_bpe_train_batched(wf, 8, 4)
    ml = [(a, b) for a, b, _ in merges]

    def enc_word(w: str) -> int:
        sym = list(w)
        for a, b in ml:
            out, prev = [], None
            for s in sym:
                if prev == a and s == b:
                    out.append(a + b)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = s
            if prev is not None:
                out.append(prev)
            sym = out
        return len(sym)

    cache: dict[str, int] = {}
    want = {}
    for i, t in rows:
        n = 0
        for w in t.split(" "):
            if w:
                if w not in cache:
                    cache[w] = enc_word(w)
                n += cache[w]
        want[i] = n

    got = {
        r.doc_id: r.n_tokens
        for r in registry.all_queries()["tok3_bpe_encode"](spark, SF_SMALL).collect()
    }
    assert got == want


def test_tx8_oracle_match(spark):
    ok, msg = check_query(spark, "tx8_collapse_runs", SF_SMALL)
    assert ok, msg


def test_tx8_collapses_planted_runs_and_preserves_runfree_text(spark):
    """Planted runs collapse to max_run occurrences in place; run-free text
    round-trips byte-identical with n_removed = 0; non-consecutive repeats
    are NOT runs and survive; consecutive empty tokens (double spaces)
    collapse under the same rule."""
    from samsa_spark.operators.text import collapse_runs

    rows = [
        (0, "ha ha ha ha done"),
        (1, "clean text with no runs"),
        (2, "a b a b a"),
        (3, "x  y   z"),  # empty-token runs from consecutive spaces
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in collapse_runs(docs).collect()}
    assert got[0].text_clean == "ha ha done" and got[0].n_removed == 2
    assert got[1].text_clean == rows[1][1] and got[1].n_removed == 0
    assert got[2].text_clean == rows[2][1] and got[2].n_removed == 0
    # "x", "", "y", "", "", "z": the lone "" between x/y survives (run of
    # 1 <= 2), the double "" between y/z keeps both (run of 2) — nothing
    # removed at max_run=2; at max_run=1 the double gap loses one token.
    assert got[3].n_removed == 0 and got[3].text_clean == rows[3][1]
    got1 = {r.doc_id: r for r in collapse_runs(docs, max_run=1).collect()}
    assert got1[0].text_clean == "ha done" and got1[0].n_removed == 3
    assert got1[3].text_clean == "x  y  z" and got1[3].n_removed == 1


def test_tx10_oracle_match(spark):
    ok, msg = check_query(spark, "tx10_typo_pairs", SF_SMALL)
    assert ok, msg


def test_tx10_planted_typos_and_blocking_completeness(spark):
    """(a) planted misspellings surface with their counts and distances;
    (b) the deletion-neighborhood blocking is COMPLETE: on a random small
    vocabulary the operator finds exactly the brute-force Python
    edit-distance pairs (the SymSpell theorem, checked not assumed)."""
    import random

    from samsa_spark.operators.text import typo_pairs

    docs = spark.createDataFrame(
        [
            (0, "spark spark spark sprak"),     # substitution-transposition at d=2
            (1, "query query qeury"),           # transposition (d=2 in plain lev)
            (2, "table tble"),                  # deletion (d=1)
            (3, "window window window"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.word_a, r.word_b): (r.count_a, r.count_b, r.dist)
        for r in typo_pairs(docs).collect()
    }
    assert got[("spark", "sprak")] == (3, 1, 2)
    assert got[("qeury", "query")] == (1, 2, 2)
    assert got[("table", "tble")] == (1, 1, 1)
    assert all("window" not in k for k in got)

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = random.Random(7)
    alphabet = "abcd"
    words = {"".join(rng.choices(alphabet, k=rng.randint(1, 6))) for _ in range(80)}
    rows = [(i, w) for i, w in enumerate(sorted(words))]
    vdocs = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        (a, b, lev(a, b))
        for a in words
        for b in words
        if a < b and lev(a, b) <= 2
    }
    got2 = {(r.word_a, r.word_b, r.dist) for r in typo_pairs(vdocs).collect()}
    assert got2 == want


# --- cls3: threshold-sweep classifier evaluation -----------------------------


def test_cls3_oracle_match(spark):
    from tests.oracle import check_query

    ok, msg = check_query(spark, "cls3_classifier_eval", SF_SMALL)
    assert ok, msg


def test_cls3_hand_confusion_counts(spark):
    """Planted scores/labels via an explicit weights model: weight +9 makes
    sigmoid(mean) ~= 1 (predict keep at every threshold), weight -9 ~= 0.
    Two good-looking docs scored high, one good-looking doc scored low,
    one junk doc scored high -> at threshold 0.5: tp=2, fn=1, fp=1, tn=1,
    prec=2/3, rec=2/3, f1=2/3."""
    import pyspark.sql.functions as F

    from samsa_spark.operators.text import classifier_eval, quality_score_col

    docs = spark.createDataFrame(
        [
            (0, "the and for are with his they this have from one word"),
            (1, "the and for are with his they this have from two words"),
            (2, "the and for are with his they this have from red rose"),
            (3, "zzzz9 !!!! ???? 00000 xx@@ ##qq zz!! 99!! q0q0 vv!!"),
            (4, "zzzz9 !!!! ???? 00000 xx@@ ##qq zz!! 99!! q0q0 ww!!"),
        ],
        "doc_id long, text string",
    )
    lab = {
        r.doc_id: r.l
        for r in docs.select(
            "doc_id", (F.round(quality_score_col(), 6) >= 0.5).alias("l")
        ).collect()
    }
    assert lab[0] and lab[1] and lab[2] and not lab[3] and not lab[4]
    # per-token weights: docs 0/1 and junk doc 3 scored HIGH, docs 2/4 LOW
    w = []
    for d, hi in [(0, True), (1, True), (2, False), (3, True), (4, False)]:
        toks = docs.where(F.col("doc_id") == d).collect()[0].text.split(" ")
        for t in toks:
            if t not in {x[0] for x in w}:
                w.append((t, 9.0 if hi else -9.0))
    # first-doc-wins on shared tokens: the stopwords all carry +9 (doc 0
    # registered them), so mixed-sign means land wherever they land — the
    # python replica below computes the same means, making the expected
    # confusion exact without hand-picking separable vocab.
    wdf = spark.createDataFrame(w, "token string, weight double")
    got = {
        float(r.threshold): r
        for r in classifier_eval(docs, weights=wdf).collect()
    }
    r = got[0.5]
    assert (r.tp + r.fn, r.fp + r.tn) == (3, 2)  # label marginals fixed
    assert r.tp + r.fp + r.fn + r.tn == 5
    # exact confusion depends on the mixed-sign means; lock the ratio
    # arithmetic instead against an independent python computation
    import math

    scores = {}
    for d in range(5):
        toks = docs.where(F.col("doc_id") == d).collect()[0].text.split(" ")
        wm = {t: wt for t, wt in w}
        mean_w = sum(wm[t] for t in toks) / len(toks)
        scores[d] = round(1.0 / (1.0 + math.exp(-mean_w)), 6)
    for thr, row in got.items():
        tp = sum(1 for d in range(5) if scores[d] >= thr and lab[d])
        fp = sum(1 for d in range(5) if scores[d] >= thr and not lab[d])
        fn = sum(1 for d in range(5) if scores[d] < thr and lab[d])
        tn = sum(1 for d in range(5) if scores[d] < thr and not lab[d])
        assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn), thr
        if tp + fp:
            assert row.prec == round(tp / (tp + fp), 6)
        else:
            assert row.prec is None
        if tp + fn:
            assert row.rec == round(tp / (tp + fn), 6)
        if 2 * tp + fp + fn:
            assert row.f1 == round(2.0 * tp / (2 * tp + fp + fn), 6)
        assert row.acc == round((tp + tn) / 5, 6)


# --- uni1: unigram-LM tokenizer training -------------------------------------


def _model_unigram(word_freqs, max_piece_len=6, iterations=2, floor_num=1, floor_den=2):
    """Independent single-node trainer: same MEAN-relative candidate floor
    (note 51 — the substring universe grows with the corpus), hard-EM and
    ascending-split strict-improvement Viterbi as the engine contract."""
    import math

    cand = {}
    for w, fr in word_freqs.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_piece_len) + 1):
                cand[w[i:j]] = cand.get(w[i:j], 0) + fr
    tot = sum(cand.values())
    kept = {
        p: c
        for p, c in cand.items()
        if len(p) == 1 or c * floor_den * len(cand) >= floor_num * tot
    }
    total = sum(kept.values())
    logp = {p: math.log(c / total) for p, c in kept.items()}
    counts = dict(kept)

    def viterbi(w, pieces, lmax):
        n = len(w)
        dp = [0.0] + [float("-inf")] * n
        back = [0] * (n + 1)
        for i in range(1, n + 1):
            for j in range(max(0, i - lmax), i):
                if dp[j] == float("-inf") or w[j:i] not in pieces:
                    continue
                s = dp[j] + pieces[w[j:i]]
                if s > dp[i]:
                    dp[i], back[i] = s, j
        out, i = [], n
        while i > 0:
            out.append(w[back[i]:i])
            i = back[i]
        return out[::-1]

    for _ in range(iterations):
        lmax = max(len(p) for p in logp)
        used = {}
        for w, fr in word_freqs.items():
            for p in viterbi(w, logp, lmax):
                used[p] = used.get(p, 0) + fr
        total = sum(used.values())
        logp = {p: math.log(c / total) for p, c in used.items()}
        counts = used
    return counts, logp


def test_uni1_matches_independent_trainer(spark):
    from samsa_spark.operators.text import train_unigram_pieces

    docs = spark.createDataFrame(
        [(0, "abab abab cd"), (1, "abab cd cd x"), (2, "ababx abab")],
        "doc_id long, text string",
    )
    got = {
        r.piece: (r.piece_count, r.logprob)
        for r in train_unigram_pieces(docs, top_n=1000).collect()
    }
    wf = {"abab": 4, "cd": 3, "x": 1, "ababx": 1}
    counts, logp = _model_unigram(wf)
    want = {p: (c, round(logp[p], 6)) for p, c in counts.items()}
    assert got == want
    # the repeated whole word must survive as one piece at full frequency
    assert got["abab"][0] >= 4


def test_uni1_planted_piece_survives_universe_growth(spark):
    """The note-51 detector for uni1 (rows-only, so the three-scale oracle
    sweep never sees it): the candidate-piece universe grows with the
    corpus, so a fraction-of-total floor would silently prune a
    high-frequency planted piece as unique junk words pile up. The
    mean-relative floor must keep the planted repeated word as one piece
    at every corpus size."""
    from samsa_spark.operators.text import train_unigram_pieces

    for n_junk in (10, 200, 2000):
        # planted: 'zqzq' repeated 30x; junk: unique 6-char words, freq 1,
        # each contributing ~21 new one-off candidate substrings
        junk = [f"w{i:05d}" for i in range(n_junk)]
        docs = spark.createDataFrame(
            [(0, " ".join(["zqzq"] * 30)), (1, " ".join(junk))],
            "doc_id long, text string",
        )
        got = {r.piece for r in train_unigram_pieces(docs, top_n=100000).collect()}
        assert "zqzq" in got, f"planted piece pruned at n_junk={n_junk}"


def test_uni1_mass_conservation_on_fixture(spark):
    """Hard-EM segmentations partition every word: sum(count x len(piece))
    must equal the corpus' total token characters."""
    from samsa_spark import tables
    from samsa_spark.operators.text import train_unigram_pieces

    docs = tables.load(spark, SF_SMALL, "documents")
    rows = train_unigram_pieces(docs, top_n=100000).collect()
    got_chars = sum(r.piece_count * len(r.piece) for r in rows)
    want_chars = docs.selectExpr(
        "sum(length(replace(text, ' ', ''))) AS c"
    ).collect()[0].c
    assert got_chars == want_chars
