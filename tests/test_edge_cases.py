"""Edge cases no fixture row exercises: empty inputs, sub-shingle-length
documents, single-key logs, null text."""

from __future__ import annotations

import pyspark.sql.functions as F

EV_SCHEMA = "user_id long, ts_us long, event_id long, event_type string, value double, props string"
DOC_SCHEMA = "doc_id long, text string"


def test_compact_empty_log(spark):
    from samsa_spark.operators.state import compact_latest

    empty = spark.createDataFrame([], EV_SCHEMA)
    assert compact_latest(empty).count() == 0


def test_compact_single_row(spark):
    from samsa_spark.operators.state import compact_latest

    one = spark.createDataFrame([(1, 10, 0, "click", 1.0, "{}")], EV_SCHEMA)
    rows = compact_latest(one).collect()
    assert len(rows) == 1 and rows[0].last_event_type == "click"


def test_shingles_short_docs(spark):
    """Documents shorter than the shingle width produce no postings (guard
    branch), and the Jaccard join simply yields no pairs for them."""
    from samsa_spark.operators.dedup import ngram_jaccard_pairs, shingle_postings

    docs = spark.createDataFrame(
        [(1, "one"), (2, "one two"), (3, "one two three"), (4, "one two three")],
        DOC_SCHEMA,
    )
    postings = shingle_postings(docs)
    by_doc = {r.doc_id: r["count"] for r in postings.groupBy("doc_id").count().collect()}
    assert 1 not in by_doc and 2 not in by_doc  # too short
    assert by_doc[3] == 1 and by_doc[4] == 1
    pairs = ngram_jaccard_pairs(docs).collect()
    assert [(p.doc_a, p.doc_b, p.jaccard) for p in pairs] == [(3, 4, 1.0)]


def test_simhash_short_and_single_token_docs(spark):
    """Bigram fallback: single-token docs hash their unigram; identical
    short docs still collide."""
    from samsa_spark.operators.dedup import simhash_fingerprints

    docs = spark.createDataFrame([(1, "solo"), (2, "solo"), (3, "a b")], DOC_SCHEMA)
    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
    assert fps[1] == fps[2]
    assert set(fps) == {1, 2, 3}


def test_upsert_merge_empty_updates(spark):
    from samsa_spark.operators.state import compact_latest, upsert_merge

    ev = spark.createDataFrame([(1, 10, 0, "click", 1.0, "{}")], EV_SCHEMA)
    state = compact_latest(ev)
    empty = spark.createDataFrame([], EV_SCHEMA)
    merged = upsert_merge(state, empty)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in state.collect()}


def test_exact_dedup_null_safe(spark):
    """exact dedup on a frame containing duplicate and unique texts."""
    from samsa_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame([(1, "same"), (2, "same"), (3, "diff")], DOC_SCHEMA)
    out = {r.doc_id: (r.canonical_id, r.is_dup, r.n_copies) for r in exact_dedup(docs).collect()}
    assert out[1] == (1, False, 2)
    assert out[2] == (1, True, 2)
    assert out[3] == (3, False, 1)


def test_point_lookup_missing_key(spark):
    from samsa_spark.operators.state import point_lookup

    ev = spark.createDataFrame([(1, 10, 0, "click", 1.0, "{}")], EV_SCHEMA)
    assert point_lookup(ev, key=999).count() == 0


def test_statetable_apply_on_empty_state(spark):
    from samsa_spark.api import StateTable
    from samsa_spark.operators.state import compact_latest

    empty = spark.createDataFrame([], EV_SCHEMA)
    ev = spark.createDataFrame([(1, 10, 0, "click", 1.0, "{}")], EV_SCHEMA)
    merged = StateTable.from_log(empty).apply(ev)
    assert {tuple(r) for r in merged.to_df().collect()} == {
        tuple(r) for r in compact_latest(ev).collect()
    }


def test_salted_join_empty_sides(spark):
    from samsa_spark.operators.scale import salted_join

    facts = spark.createDataFrame([], "k long, event_id long")
    dim = spark.createDataFrame([(1, "x")], "k long, attr string")
    assert salted_join(facts, dim, "k").count() == 0
    facts2 = spark.createDataFrame([(1, 10)], "k long, event_id long")
    empty_dim = spark.createDataFrame([], "k long, attr string")
    assert salted_join(facts2, empty_dim, "k").count() == 0


def test_ivf_single_label_corpus(spark):
    """One label -> one cell -> IVF degrades to brute force over the cell,
    still returns ranked results."""
    import numpy as np

    from samsa_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(7)
    rows = [(i, "only", [float(x) for x in rng.randn(64)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    out = ivf_topk(emb, n_probes=3, k=2).collect()
    qids = {r.q_id for r in out}
    assert qids == {0, 1, 2}
    assert all(r.vec_id != r.q_id for r in out)


def test_resize_and_frames_on_tiny_payloads(spark):
    """Payload smaller than the budget / one frame: resize keeps all bytes,
    frame sampling emits exactly one (short) frame."""
    from samsa_spark.operators.multimodal import resize_media, sample_frames

    media = spark.createDataFrame(
        [(1, "image/png", b"abc"), (2, "video/mp4", b"")],
        "doc_id long, media_type string, content binary",
    )
    rs = {r.doc_id: r for r in resize_media(media, 8, 8).collect()}
    assert bytes(rs[1].content) == b"abc" and rs[1].n_bytes_out == 3
    assert rs[2].n_bytes_out == 0
    fr = sample_frames(media, every_k=3).collect()
    assert len(fr) == 1 and fr[0].doc_id == 1 and bytes(fr[0].frame) == b"abc"


def test_equidepth_constant_column(spark):
    """All-equal values: every cutpoint coincides, all rows land in one
    bucket (cutpoint tie semantics) instead of crashing or splitting."""
    from samsa_spark.operators.pipeline_ops import equidepth_histogram

    docs = spark.createDataFrame([(i, 100) for i in range(20)], "doc_id long, n_chars int")
    rows = equidepth_histogram(docs).collect()
    assert len(rows) == 1 and rows[0].n_docs == 20 and rows[0].bucket == 1


def test_prep_stage_ops_on_empty_and_degenerate_docs(spark):
    """tx7/ck1/lm1 on empty frames and degenerate text: no rows -> no rows
    (no crash), empty-string docs still chunk/score without dividing by
    zero (split('') yields [''] — one empty token on both engines)."""
    from samsa_spark.operators.pipeline_ops import chunk_overlap, unigram_logprob
    from samsa_spark.operators.text import pii_scrub

    empty = spark.createDataFrame([], DOC_SCHEMA)
    assert pii_scrub(empty).count() == 0
    assert chunk_overlap(empty).count() == 0
    assert unigram_logprob(empty).count() == 0

    degenerate = spark.createDataFrame([(1, ""), (2, "x")], DOC_SCHEMA)
    assert pii_scrub(degenerate).count() == 2
    chunks = chunk_overlap(degenerate).collect()
    assert {(r.doc_id, r.chunk_idx, r.chunk_text) for r in chunks} == {
        (1, 0, ""),
        (2, 0, "x"),
    }
    lm = {r.doc_id: r for r in unigram_logprob(degenerate).collect()}
    assert lm[1].n_tokens == 1 and lm[2].n_tokens == 1
    # two singleton token types over a 2-token stream: logprob = ln(1/2)
    import math

    assert abs(lm[1].avg_logprob - round(math.log(0.5), 6)) < 1e-9
