"""Training-pipeline operators vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle import check_query

PIPE_QUERIES = [
    "vec1_label_centroids",
    "tf1_tfidf_top_terms",
    "sp1_deterministic_split",
    "pk1_pack_sequences",
    "pk2_pack_chunked",
    "pp1_prep_pipeline",
    "ck1_chunk_overlap",
    "lm1_unigram_logprob",
    "ds1_shuffle_shards",
    "qf1_quality_quantile",
]


def test_chunk_overlap_shape(spark):
    """Chunk arithmetic locked on constructed docs: starts every S tokens,
    last chunk short, <=W-token doc yields one full-copy chunk."""
    import pandas as pd

    from samsa_spark.operators.pipeline_ops import chunk_overlap

    toks41 = " ".join(f"t{i}" for i in range(41))
    toks16 = " ".join(f"s{i}" for i in range(16))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": [toks41, toks16, "one"]})
    )
    out = chunk_overlap(df)  # W=16, S=12
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # 41 tokens -> ceil((41-16)/12)=3 extra -> starts 0,12,24,36; last is short
    assert sorted(i for d, i in rows if d == 1) == [0, 1, 2, 3]
    assert rows[(1, 0)].n_chunk_tokens == 16
    assert rows[(1, 0)].chunk_text.split(" ")[0] == "t0"
    assert rows[(1, 1)].chunk_text.split(" ")[0] == "t12", "stride-12 overlap"
    assert rows[(1, 3)].n_chunk_tokens == 5
    assert rows[(1, 3)].chunk_text == "t36 t37 t38 t39 t40"
    assert all(r.n_doc_tokens == 41 for (d, _), r in rows.items() if d == 1)
    # exactly-W and tiny docs -> a single chunk equal to the doc
    assert sorted(i for d, i in rows if d == 2) == [0]
    assert rows[(2, 0)].chunk_text == toks16
    assert rows[(3, 0)].chunk_text == "one"


@pytest.mark.parametrize("name", PIPE_QUERIES)
def test_oracle_match(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg


def test_custom_group_agg_matches_builtin(spark):
    """applyInPandas least-squares slope ~= built-in regr_slope."""
    from samsa_spark import tables
    from samsa_spark.operators.advanced import user_value_trends
    from samsa_spark.operators.pipeline_ops import user_trend_custom

    ev = tables.load(spark, SF_SMALL, "events")
    custom = {r.user_id: r.slope for r in user_trend_custom(ev).collect()}
    builtin = {r.user_id: r.slope for r in user_value_trends(ev).collect()}
    assert set(custom) == set(builtin)
    for u, s in builtin.items():
        assert abs(custom[u] - s) < 1e-4, f"user {u}: custom={custom[u]} builtin={s}"


@pytest.mark.parametrize(
    "name", ["sm1_stratified_sample", "sm2_mixture_sample", "nt1_equidepth_histogram"]
)
def test_oracle_match_sampling(spark, name):
    ok, msg = check_query(spark, name, SF_SMALL)
    assert ok, msg


def test_mixture_sample_budget_and_temperature(spark):
    """sm2 semantics on the real corpus: (a) sampled tokens track the
    budget fraction, (b) temperature < 1 upweights small sources (their
    acceptance rate is >= the biggest source's), (c) the sample is
    invariant under repartitioning (hash-threshold, not rand())."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import mixture_sample

    docs = tables.load(spark, SF_SMALL, "documents")
    out = mixture_sample(docs, temperature=0.7, budget_frac=0.5).collect()
    total = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    sampled = sum(r.n_tokens for r in out)
    # hash acceptance is a Bernoulli draw per doc: allow sampling noise
    assert 0.35 * total <= sampled <= 0.65 * total, (sampled, total)
    rates = {r.source: r.rate for r in out}
    toks = {r.source: r.src_tokens for r in out}
    small, big = min(toks, key=toks.get), max(toks, key=toks.get)
    assert rates[small] >= rates[big]
    again = mixture_sample(docs.repartition(13), temperature=0.7, budget_frac=0.5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_prep_pipeline_mixture_stage(spark):
    """pp1's opt-in mixture stage reproduces sm2's acceptance set exactly
    (stage and registered query share _mixture_accept by construction, but
    the stage must also compose with the quality filter upstream)."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import (
        _mixture_accept,
        prep_pipeline,
    )

    docs = tables.load(spark, SF_SMALL, "documents")
    staged = prep_pipeline(docs, mixture_temperature=0.7, mixture_budget_frac=0.5)
    n_staged = sum(r.n_docs for r in staged.collect())

    # Model: run the pipeline's own upstream (quality filter + exact dedup)
    # then the shared acceptance core on the survivors.
    n_chars = F.length("text")
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    filtered = docs.select(
        "doc_id", "source", "text", F.round(alpha / n_chars, 6).alias("q")
    ).where((n_chars >= 50) & (F.col("q") >= 0.5))
    canon = filtered.groupBy(F.sha2("text", 256).alias("sha")).agg(
        F.min("doc_id").alias("keep_id")
    )
    kept = filtered.join(canon, filtered.doc_id == canon.keep_id, "left_semi")
    want = _mixture_accept(
        kept.select("doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")),
        0.7,
        0.5,
    ).count()
    assert n_staged == want


def test_key_hash_survives_huge_doc_ids_under_ansi(spark):
    """A 100 TB corpus has doc_ids past 2^32; the unmasked Knuth multiply
    overflows bigint there and ANSI mode (Spark 4 default) throws. The
    masked hash must (a) not throw, (b) agree with the DuckDB form, and
    (c) be the identity transform of the old hash for small ids."""
    import duckdb

    from samsa_spark.operators.pipeline_ops import _KEY_HASH_SQL, _key_hash

    ids = [1, 123, 2**31 - 1, 2**31, 2**32 + 17, 5_000_000_000, 2**62 + 3]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.h
        for r in df.select("doc_id", _key_hash("doc_id").alias("h")).collect()
    }
    want = {
        i: duckdb.sql(
            f"SELECT {_KEY_HASH_SQL.format(col=str(i))} AS h"
        ).fetchall()[0][0]
        for i in ids
    }
    assert got == want
    # identity with the legacy unmasked hash below 2^31
    for i in (1, 123, 2**31 - 1):
        assert got[i] == (i * 2654435761) % 1_000_003


def test_split_and_sample_run_on_huge_doc_ids(spark):
    """sp1/sm1 end-to-end on synthetic rows whose doc_id exceeds 2^32 —
    the exact case the unmasked hash turned into an ANSI overflow error."""
    from samsa_spark.operators.pipeline_ops import deterministic_split, stratified_sample

    rows = [(2**32 + i * 7919, "en" if i % 2 else "de", "t" * 10) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    split_rows = deterministic_split(docs).collect()
    assert sum(r.n_docs for r in split_rows) == 50
    assert {r.split for r in split_rows} <= {"train", "test"}
    sampled = stratified_sample(docs, per_lang=5).collect()
    assert {r.lang for r in sampled} == {"en", "de"}
    assert all(r.n_sampled == 5 for r in sampled)


def test_prep_pipeline_fuzzy_stage_removes_planted_near_dups(spark):
    """pp1's opt-in fuzzy stage (dd3 MinHash-LSH between exact dedup and
    split) must be equivalent to physically deleting the planted near-dups:
    ground truth is prep_pipeline over the corpus with the near-dup rows
    removed by hand. Rows-only rationale: the stage rides xxhash64
    signatures, which DuckDB cannot compute, so like dd3 it is checked here
    rather than by the driver's SQL oracle."""
    from samsa_spark.operators.pipeline_ops import prep_pipeline

    def words(tag):
        return " ".join(f"{tag}tok{i}" for i in range(40))

    base = [(i, "en", words(f"d{i}")) for i in range(1, 7)]
    near_1 = words("d1").rsplit(" ", 1)[0] + " changedtail"       # ~0.85 Jaccard vs doc 1
    near_3 = words("d3").replace("d3tok20", "changedmid")          # ~0.86 Jaccard vs doc 3
    extra = [
        (101, "en", near_1),
        (102, "en", words("d2")),   # exact dup of doc 2 -> exact stage drops it
        (103, "en", near_3),
        (104, "en", "1234567890 " * 10),  # fails the alpha-ratio quality filter
    ]
    schema = "doc_id long, lang string, text string"
    docs_all = spark.createDataFrame(base + extra, schema)
    docs_pruned = spark.createDataFrame(base + extra[1:2], schema)  # bases + exact dup only

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    fuzzy = prep_pipeline(docs_all, fuzzy_min_est_jaccard=0.5)
    truth = prep_pipeline(docs_pruned, fuzzy_min_est_jaccard=None)
    assert rows(fuzzy) == rows(truth)
    assert sum(r.n_docs for r in fuzzy.collect()) == 6  # all six bases survive

    plain = prep_pipeline(docs_all)
    assert sum(r.n_docs for r in plain.collect()) == 8  # near-dups survive without fuzzy


def test_prep_pipeline_decontamination_stage(spark):
    """pp1's decontamination stage must equal physically deleting the docs
    that share a shingle with the benchmark frame — ground truth is the
    pipeline over the hand-pruned corpus."""
    from samsa_spark.operators.pipeline_ops import prep_pipeline

    def words(tag):
        return " ".join(f"{tag}tok{i}" for i in range(40))

    bench = spark.createDataFrame(
        [(900, "en", "alpha beta gamma delta epsilon zeta")],
        "doc_id long, lang string, text string",
    )
    corpus_rows = [
        (1, "en", words("d1")),
        (2, "en", words("d2") + " alpha beta gamma tail"),  # leaks a benchmark shingle
        (3, "en", words("d3")),
        (4, "en", "intro alpha beta gamma delta outro"),    # leaks two
    ]
    schema = "doc_id long, lang string, text string"
    corpus = spark.createDataFrame(corpus_rows, schema)
    clean = spark.createDataFrame([corpus_rows[0], corpus_rows[2]], schema)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    got = prep_pipeline(corpus, decontaminate_against=bench)
    truth = prep_pipeline(clean)
    assert rows(got) == rows(truth)
    assert sum(r.n_docs for r in got.collect()) == 2


def test_chunk_overlap_coverage_property(spark):
    """Invariants over random docs: every token index lands in >=1 chunk,
    full chunks overlap their successor by exactly W-S tokens, chunk 0
    starts at token 0, and reassembling stride-slices reproduces the doc."""
    import random

    import pandas as pd

    from samsa_spark.operators.pipeline_ops import _CHUNK_S, _CHUNK_W, chunk_overlap

    rng = random.Random(7)
    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(rng.randint(1, 80))))
        for i in range(25)
    ]
    out = chunk_overlap(spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"])))
    by_doc: dict[int, list] = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in docs:
        toks = text.split(" ")
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        assert chunks[0].chunk_idx == 0
        covered = set()
        for r in chunks:
            start = r.chunk_idx * _CHUNK_S
            piece = toks[start : start + _CHUNK_W]
            assert r.chunk_text == " ".join(piece), (doc_id, r.chunk_idx)
            assert r.n_chunk_tokens == len(piece)
            covered.update(range(start, start + len(piece)))
        assert covered == set(range(len(toks))), f"doc {doc_id}: gap in coverage"
        for a, b in zip(chunks, chunks[1:]):
            if a.n_chunk_tokens == _CHUNK_W:
                assert a.chunk_text.split(" ")[_CHUNK_S:] == b.chunk_text.split(" ")[: _CHUNK_W - _CHUNK_S]


def test_shuffle_shards_is_a_seeded_permutation(spark):
    """ds1: every doc appears exactly once with a contiguous per-shard
    sequence; the order is stable for a seed and genuinely different across
    seeds (an epoch reshuffle, not a rotation)."""
    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import shuffle_shards

    docs = tables.load(spark, SF_SMALL, "documents").select("doc_id")
    n = docs.count()

    a = shuffle_shards(docs, n_shards=8, seed=1).collect()
    assert len(a) == n and len({r.doc_id for r in a}) == n
    by_shard: dict[int, list] = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.seq)
    for shard, seqs in by_shard.items():
        assert sorted(seqs) == list(range(1, len(seqs) + 1)), f"shard {shard} gaps"

    again = shuffle_shards(docs, n_shards=8, seed=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, again)), "same seed must be stable"

    b = shuffle_shards(docs, n_shards=8, seed=2).collect()
    order_a = [r.doc_id for r in sorted(a, key=lambda r: (r.shard, r.seq))]
    order_b = [r.doc_id for r in sorted(b, key=lambda r: (r.shard, r.seq))]
    assert order_a != order_b, "different seeds must permute differently"

    # a rotation also satisfies !=; a FRESH permutation flips the relative
    # order of ~half of all pairs. Sample pairs and require real inversions
    # (an additive seed mix — the bug this guards — flips almost none).
    pos_a = {d: i for i, d in enumerate(order_a)}
    pos_b = {d: i for i, d in enumerate(order_b)}
    import itertools

    sample = order_a[:: max(1, len(order_a) // 40)]
    pairs = list(itertools.combinations(sample, 2))
    flips = sum(
        1
        for x, y in pairs
        if (pos_a[x] < pos_a[y]) != (pos_b[x] < pos_b[y])
    )
    assert flips / len(pairs) >= 0.2, f"only {flips}/{len(pairs)} pair inversions"


def test_full_prep_to_shards_integration(spark):
    """The whole corpus-prep path in one run: quality filter ->
    decontaminate -> exact dedup -> substring (dominated-span) dedup ->
    fuzzy (MinHash) dedup -> semantic (SemDeDup) dedup -> split, then
    write_shards materializes the survivors. Ground truth: the survivor
    set is computed by hand from the planted corpus."""
    import os
    import tempfile

    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from samsa_spark.operators.pipeline_ops import prep_pipeline, write_shards

    def words(tag):
        return " ".join(f"{tag}tok{i}" for i in range(40))

    bench = spark.createDataFrame(
        [(900, "en", "alpha beta gamma delta epsilon zeta")],
        "doc_id long, lang string, text string",
    )
    corpus_rows = [
        (1, "en", "web", words("d1")),                                  # survives
        (2, "en", "web", words("d2")),                                  # survives
        (3, "en", "web", words("d3")),                                  # survives
        (4, "en", "web", words("d4") + " alpha beta gamma tail"),       # decontaminated
        (5, "en", "web", words("d2")),                                  # exact dup of 2
        (6, "en", "web", words("d3").replace("d3tok20", "changedmid")), # fuzzy dup of 3
        (7, "en", "web", words("d7")),                                  # semantic dup of 1 (below)
        (8, "en", "web", "1234567890 " * 10),                           # quality-filtered
        # 19-token prefix lifted verbatim from doc 1 + 10 unique tokens:
        # dominated fraction 19/29 >= 0.5 -> dropped by the substring stage
        # (doc 1, the corpus-first occurrence, is untouched).
        (9, "en", "web", " ".join(words("d1").split(" ")[:19])
            + " " + " ".join(f"d9uniq{i}" for i in range(10))),
    ]
    docs = spark.createDataFrame(
        corpus_rows, "doc_id long, lang string, source string, text string"
    )

    rng = np.random.RandomState(3)
    base_vec = rng.randn(32)
    base_vec /= np.linalg.norm(base_vec)
    vecs = {}
    for i, _, _, _ in corpus_rows:
        v = base_vec + rng.randn(32) * 0.01 if i in (1, 7) else rng.randn(32)
        vecs[i] = v / np.linalg.norm(v)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        StructType(
            [
                StructField("vec_id", LongType()),
                StructField("embedding", ArrayType(FloatType())),
            ]
        ),
    )

    stats = prep_pipeline(
        docs,
        decontaminate_against=bench,
        # corpus-relative quality stage wired in composition: keep_frac=1.0
        # puts the cutpoint at the per-source MIN (ties kept), so the stage
        # runs — source threads through, cutpoints broadcast — without
        # perturbing the hand-modeled survivor set below.
        quality_quantile_keep=1.0,
        substring_dedup_min_tokens=8,
        substring_max_dup_frac=0.5,
        fuzzy_min_est_jaccard=0.5,
        semantic_dedup_embeddings=emb,
        semantic_min_cos=0.9,
        # only 4 docs reach the semantic stage; cells must stay below that
        # or every vector seeds its own cell and no pair is ever generated
        semantic_cells=2,
    )
    assert sum(r.n_docs for r in stats.collect()) == 3  # docs 1, 2, 3

    # materialize the same survivor set (smallest-id-wins at every stage)
    survivors = docs.where("doc_id in (1, 2, 3)")
    base = tempfile.mkdtemp(prefix="samsa-e2e-")
    manifest = write_shards(survivors, base, max_records_per_file=2)
    back = spark.read.parquet(os.path.join(base, "data"))
    assert {r.doc_id for r in back.collect()} == {1, 2, 3}
    assert sum(r.n_rows for r in manifest.collect()) == 3


def test_epoch_shuffled_loader_contract(spark, tmp_path):
    """write_shards -> read_shards_shuffled: the loop a trainer actually
    runs. Two epochs (seeds) must yield DISTINCT consumption orders over
    the IDENTICAL doc set; a re-read of an epoch reproduces it exactly;
    and the split filter still prunes partitions under the order overlay."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import (
        read_shards_shuffled,
        write_shards,
    )

    docs = tables.load(spark, SF_SMALL, "documents").select("doc_id", "source", "lang", "text")
    path = str(tmp_path / "shards")
    write_shards(docs, path)

    def epoch(seed):
        out = read_shards_shuffled(spark, path, split="train", seed=seed).collect()
        order = [r.doc_id for r in sorted(out, key=lambda r: (r.shard, r.seq))]
        return out, order

    e1, order1 = epoch(1)
    e2, order2 = epoch(2)
    # identical doc set, each exactly once, with full payload attached
    assert sorted(r.doc_id for r in e1) == sorted(r.doc_id for r in e2)
    assert len({r.doc_id for r in e1}) == len(e1)
    assert all(r.text is not None and r.lang is not None for r in e1)
    # distinct permutations across epochs, stable within an epoch
    assert order1 != order2
    _, order1b = epoch(1)
    assert order1 == order1b
    # train partition only (the split column comes from the layout)
    assert {r.split for r in e1} == {"train"}
    # the split filter reaches the scan as a partition filter
    plan = (
        read_shards_shuffled(spark, path, split="train", seed=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "train" in plan


def test_curriculum_shards_oracle_and_semantics(spark):
    """ds2: exact oracle parity, plus the curriculum contract — within a
    shard, sequence order never ascends in quality tier, and a different
    seed reshuffles within tiers but never across them."""
    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import curriculum_shards

    ok, msg = check_query(spark, "ds2_curriculum_shards", SF_SMALL)
    assert ok, msg

    docs = tables.load(spark, SF_SMALL, "documents")
    a = curriculum_shards(docs, seed=1).collect()
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.seq)
        tiers = [r.q_tier for r in rows]
        assert tiers == sorted(tiers, reverse=True), f"shard {shard} tier order"

    b = curriculum_shards(docs, seed=2).collect()
    tier_of_a = {r.doc_id: r.q_tier for r in a}
    assert {r.doc_id: r.q_tier for r in b} == tier_of_a, "tiers are seed-independent"
    # seed must reorder within at least one tier
    order_a = [r.doc_id for r in sorted(a, key=lambda r: (r.shard, r.seq))]
    order_b = [r.doc_id for r in sorted(b, key=lambda r: (r.shard, r.seq))]
    assert order_a != order_b


def test_mixture_expand_oracle_and_upsampling(spark):
    """sm3: exact oracle parity, plus the upsample contract — with
    budget_frac=1 and temperature<1, the smallest source's rate exceeds 1
    (docs repeat) while the biggest is downsampled, expected sampled
    tokens track rate x src_tokens per source, and the expansion is
    invariant under repartitioning."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import _mixture_rates, mixture_expand

    ok, msg = check_query(spark, "sm3_mixture_expand", SF_SMALL)
    assert ok, msg

    docs = tables.load(spark, SF_SMALL, "documents")
    d = docs.select("doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens"))
    rates = {
        r.source: (r.rate, r.src_tokens)
        for r in _mixture_rates(d, 0.7, 1.0, cap=False).collect()
    }
    small = min(rates, key=lambda s: rates[s][1])
    big = max(rates, key=lambda s: rates[s][1])
    assert rates[small][0] > 1.0, "smallest source must upsample"
    assert rates[big][0] < 1.0, "biggest source must downsample"

    out = mixture_expand(docs, temperature=0.7, budget_frac=1.0).collect()
    per_src = {}
    for r in out:
        per_src.setdefault(r.source, [0, 0])
        per_src[r.source][0] += 1
        per_src[r.source][1] += r.n_tokens
    for s, (rate, src_tokens) in rates.items():
        want = rate * src_tokens
        got = per_src.get(s, [0, 0])[1]
        assert abs(got - want) <= max(0.35 * want, 200), (s, got, want)
    # every (doc, copy) unique; copies contiguous from 0
    seen = {}
    for r in out:
        seen.setdefault(r.doc_id, []).append(r.copy)
    for d_id, copies in seen.items():
        assert sorted(copies) == list(range(len(copies))), d_id

    again = mixture_expand(docs.repartition(11), temperature=0.7, budget_frac=1.0).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pack_assignments_oracle_and_consistency_with_pk2(spark):
    """pk3: exact oracle parity, and consistency with pk2's bin stats —
    per bin, pk3's docs/token sums equal pk2's, offsets stay under the
    budget, and each bin's doc offsets tile contiguously from 0."""
    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import (
        pack_assignments,
        pack_sequences_chunked,
    )

    ok, msg = check_query(spark, "pk3_pack_assignments", SF_SMALL)
    assert ok, msg

    docs = tables.load(spark, SF_SMALL, "documents")
    assign = pack_assignments(docs).collect()
    stats = {(r.source, r.bin): r for r in pack_sequences_chunked(docs).collect()}
    by_bin = {}
    for r in assign:
        assert 0 <= r.offset < 512, (r.doc_id, r.offset)
        by_bin.setdefault((r.source, r.bin), []).append(r)
    assert set(by_bin) == set(stats)
    for key, rows in by_bin.items():
        s = stats[key]
        assert len(rows) == s.n_docs
        assert sum(r.n_tokens for r in rows) == s.bin_tokens
        rows.sort(key=lambda r: r.doc_id)
        # Within a bin the stream is contiguous: next offset = prev offset
        # + prev tokens. (A bin's FIRST doc need not sit at offset 0 —
        # greedy packing assigns by start position, so a doc overflowing
        # the previous bin pushes this bin's first doc to a later offset.)
        for a, b in zip(rows, rows[1:]):
            assert b.offset == a.offset + a.n_tokens, key


def test_quality_quantile_filter_semantics(spark):
    """qf1 on a planted two-source corpus: keeps exactly the top half of
    each source by tx2 score (ties at the cutpoint kept), cutpoints are
    per-source (a doc that survives in a junk-heavy source would fail in a
    clean source), and the kept set is invariant under repartitioning."""
    import pandas as pd

    from samsa_spark.operators.pipeline_ops import quality_quantile_filter

    good = "the quick brown fox is a good and fine text for the test today"
    ok_ = "some plain words here with the usual mix of a few fillers now"
    junk = "#### @@@@ !!!! 1234 %%%% ^^^^ &&&& **** ;;;; ::: ~~~ ```"
    worse = "0000 1111 2222 3333 4444 5555 6666 7777 8888 9999 ++++ ===="
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
                "source": ["a"] * 4 + ["b"] * 4,
                # source a: two clean, two junk; source b: all junk-ish but
                # with an internal ranking — per-source cutpoints must keep
                # b's best two even though they'd fail a's cutpoint.
                "text": [good, ok_, junk, worse, ok_, good, junk, worse],
            }
        )
    )
    kept = {r.doc_id for r in quality_quantile_filter(df, keep_frac=0.5).collect()}
    assert kept == {1, 2, 5, 6}
    again = {
        r.doc_id
        for r in quality_quantile_filter(df.repartition(7), keep_frac=0.5).collect()
    }
    assert again == kept
    # ties at the cutpoint are kept: duplicate the cut-doc's text so the
    # median lands ON a value shared by two docs -> both survive
    df2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "source": ["a"] * 4,
                "text": [good, ok_, ok_, junk],
            }
        )
    )
    kept2 = {r.doc_id for r in quality_quantile_filter(df2, keep_frac=0.5).collect()}
    assert {2, 3} <= kept2 and 4 not in kept2


def test_prep_pipeline_quality_quantile_stage(spark):
    """pp1's opt-in qf1 stage: drops roughly the bottom half of each
    source (>=50% kept by cutpoint-tie semantics, well under 100%), and
    the missing-source contract raises the actionable error."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import prep_pipeline

    docs = tables.load(spark, SF_SMALL, "documents")
    base = prep_pipeline(docs).agg(F.sum("n_docs")).collect()[0][0]
    staged = (
        prep_pipeline(docs, quality_quantile_keep=0.5)
        .agg(F.sum("n_docs"))
        .collect()[0][0]
    )
    assert 0.4 * base <= staged <= 0.9 * base, (staged, base)
    with _pytest.raises(ValueError, match="source"):
        prep_pipeline(docs.drop("source"), quality_quantile_keep=0.5)


def test_quality_quantile_matches_model_on_random_corpora(spark):
    """qf1 vs a pure-Python model of the exact same semantics (tx2 score
    arithmetic in IEEE order, half-away 3-dp quantization, numpy linear
    median, 6-dp cutpoint, >= compare) on randomized corpora — locks the
    engine-vs-model agreement the fixed-testdata oracle can't probe."""
    import random

    import numpy as np
    import pandas as pd

    from samsa_spark.operators.pipeline_ops import quality_quantile_filter
    from samsa_spark.operators.text import _STOP_EN

    rng = random.Random(7)
    vocab = list(_STOP_EN)[:6] + ["fox", "data", "%%%", "123", "zq", "####", "run"]

    def model_score(text: str) -> float:
        n_chars = len(text)
        alpha = sum(1 for c in text if c.isascii() and c.isalpha())
        spaces = text.count(" ")
        toks = text.split(" ")
        stop = sum(1 for t in toks if t in _STOP_EN)
        mtl = (n_chars - spaces) / len(toks)
        s = 0.4 * (alpha / n_chars) + 0.3 * (stop / len(toks)) + 0.3 * (
            1.0 - abs(mtl - 5.0) / 10.0
        )
        return float(np.floor(s * 1000 + 0.5) / 1000)  # half-away 3-dp

    for trial in range(3):
        rows = []
        for i in range(90):
            n = rng.randint(1, 12)
            rows.append(
                (
                    i,
                    f"s{rng.randint(0, 2)}",
                    " ".join(rng.choice(vocab) for _ in range(n)),
                )
            )
        pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
        want = set()
        for src, grp in pdf.groupby("source"):
            qs = grp["text"].map(model_score)
            cut = np.floor(np.percentile(qs.to_numpy(), 50) * 1e6 + 0.5) / 1e6
            want |= set(grp.loc[qs >= cut, "doc_id"])
        df = spark.createDataFrame(pdf)
        got = {
            r.doc_id
            for r in quality_quantile_filter(df, keep_frac=0.5).collect()
        }
        assert got == want, f"trial {trial}: {sorted(got ^ want)}"


def test_prep_pipeline_line_dedup_and_classifier_stages(spark):
    """The two round-7 opt-in stages compose: the line stage rewrites text
    BEFORE anything else (so docs that differ only by corpus-repeated
    boilerplate collapse in exact dedup), and the classifier stage drops
    docs scoring under the threshold with the given model."""
    import pandas as pd
    import pyspark.sql.functions as F

    from samsa_spark.operators.pipeline_ops import prep_pipeline

    body_a = "the quick brown fox jumps over the lazy dog " * 3
    body_b = "pack my box with five dozen liquor jugs now " * 3
    boiler = "subscribe to our newsletter today please"
    rows = [
        # docs 0/1: same body line (2x < min_count -> kept), different
        # position of the shared boilerplate line (3x -> removed) -> the
        # docs become identical only AFTER the line stage.
        (0, "en", "web", f"{boiler}\n{body_a}"),
        (1, "en", "web", f"{body_a}\n{boiler}"),
        (2, "en", "web", f"{body_b}\n{boiler}\nunique trailing sentence here"),
        # doc 3: spam tokens the classifier model scores down.
        (3, "en", "web", "spam spam spam " + body_a + " extended"),
        # doc 4: clean control.
        (4, "en", "web", "a wholly distinct document body " * 4),
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "source", "text"])
    )

    base = prep_pipeline(docs)
    n_base = sum(r.n_docs for r in base.collect())
    assert n_base == 5  # all distinct without the line stage

    lined = prep_pipeline(docs, line_dedup_min_count=3)
    n_lined = sum(r.n_docs for r in lined.collect())
    # boiler occurs 3x -> removed everywhere -> docs 0 and 1 become
    # byte-identical and exact dedup collapses them.
    assert n_lined == 4

    w = spark.createDataFrame(
        pd.DataFrame({"token": ["spam"], "weight": [-10.0]})
    )
    both = prep_pipeline(docs, line_dedup_min_count=3, classifier_weights=w)
    n_both = sum(r.n_docs for r in both.collect())
    assert n_both == 3  # doc 3's mean weight is deeply negative -> dropped

    # token accounting must reflect the CLEANED text: the staged total must
    # be strictly below the stage-free total for the same surviving docs.
    t_base = sum(r.total_tokens for r in base.collect())
    t_lined = sum(r.total_tokens for r in lined.collect())
    assert t_lined < t_base


def test_lm2_oracle_match(spark):
    from tests.oracle import check_query

    ok, msg = check_query(spark, "lm2_bigram_logprob", SF_SMALL)
    assert ok, msg


def test_lm2_is_order_sensitive_unlike_lm1(spark):
    """The point of the bigram model: a doc that is a token-level shuffle
    of common text scores LOWER than the original (unseen transitions),
    while lm1's unigram score is identical for both by construction. Also:
    a one-token doc gets n_bigrams=0 and a NULL score."""
    import pandas as pd

    from samsa_spark.operators.pipeline_ops import bigram_logprob, unigram_logprob

    fluent = "the cat sat on the mat and the dog sat on the rug"
    toks = fluent.split(" ")
    shuffled = " ".join(
        toks[i] for i in [7, 2, 9, 0, 12, 4, 1, 10, 3, 6, 5, 8, 11]
    )
    corpus = [(i, fluent) for i in range(8)] + [(100, shuffled), (200, "solo")]
    docs = spark.createDataFrame(pd.DataFrame(corpus, columns=["doc_id", "text"]))

    lm2 = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    lm1 = {r.doc_id: r.avg_logprob for r in unigram_logprob(docs).collect()}
    assert lm2[100].avg_logprob < lm2[0].avg_logprob, "shuffle must score lower"
    assert lm1[100] == lm1[0], "unigram is order-blind by construction"
    assert lm2[200].n_bigrams == 0 and lm2[200].avg_logprob is None


def test_prep_pipeline_all_stages_compose(spark):
    """Every opt-in stage enabled AT ONCE — the interaction smoke no
    single-stage test covers: line dedup -> quality filter -> classifier ->
    quantile -> decontaminate -> exact dedup -> substring -> fuzzy ->
    semantic -> mixture must run as one plan over the real corpus, be
    deterministic across reruns, and keep no more docs than the stage-free
    pipeline."""
    import pandas as pd

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import prep_pipeline

    docs = tables.load(spark, SF_SMALL, "documents")
    emb = tables.load(spark, SF_SMALL, "embeddings")
    bench = docs.where("doc_id < 5").select("doc_id", "lang", "text")
    w = spark.createDataFrame(
        pd.DataFrame({"token": ["the", "a"], "weight": [0.6, 0.4]})
    )

    kwargs = dict(
        line_dedup_min_count=3,
        classifier_weights=w,
        classifier_min_score=0.4,
        quality_quantile_keep=0.9,
        decontaminate_against=bench,
        substring_dedup_min_tokens=13,
        fuzzy_min_est_jaccard=0.6,
        semantic_dedup_embeddings=emb,
        semantic_min_cos=0.45,
        semantic_cells=4,
        mixture_temperature=0.7,
        mixture_budget_frac=0.8,
    )
    out1 = sorted(map(tuple, prep_pipeline(docs, **kwargs).collect()))
    out2 = sorted(map(tuple, prep_pipeline(docs, **kwargs).collect()))
    assert out1 == out2, "full stage stack must be deterministic"
    cols = prep_pipeline(docs, **kwargs).columns
    n_idx = cols.index("n_docs")
    n_all = sum(r[n_idx] for r in out1)
    n_base = sum(r.n_docs for r in prep_pipeline(docs).collect())
    assert 0 < n_all <= n_base
    # the decontaminated benchmark docs can never survive into the shards
    assert n_all <= n_base - bench.count() + 1  # ±1: bench docs may fail base gates anyway


def test_sampling_hash_independent_of_split(spark):
    """Regression (round-7 self-review): sampling and split previously
    thresholded the SAME _key_hash, nesting the events — a source accepted
    at rate <= 0.8 kept only low-hash docs, every one labeled 'train', and
    mixture output had an EMPTY test split. With the independent sampling
    hash, both splits appear among accepted docs at ~train_pct proportion,
    and sm1's per-stratum sample likewise spans both splits."""
    import pyspark.sql.functions as F

    from samsa_spark.operators.pipeline_ops import (
        _key_hash,
        _mixture_accept,
        _sample_hash,
        _split_expr,
    )

    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.lit("web").alias("source"),
        F.lit(100).alias("n_tokens"),
    )
    acc = _mixture_accept(docs, temperature=1.0, budget_frac=0.5).select(
        "doc_id", _split_expr(80).alias("split")
    )
    frac = {r.split: r.c for r in acc.groupBy("split").agg(F.count("*").alias("c")).collect()}
    total = sum(frac.values())
    assert 0.4 * 4000 < total < 0.6 * 4000, "rate ~0.5 sanity"
    test_frac = frac.get("test", 0) / total
    assert 0.12 < test_frac < 0.28, (
        f"test fraction {test_frac:.3f} must track train_pct=80 — a "
        "collapse toward 0 means sampling and split hashes re-correlated"
    )
    # and the two hashes genuinely differ row-by-row
    diff = docs.where(
        _key_hash("doc_id") != _sample_hash("doc_id")
    ).count()
    assert diff > 3900


def test_sp2_oracle_match(spark):
    from tests.conftest import SF_SMALL
    from tests.oracle import check_query

    ok, msg = check_query(spark, "sp2_temporal_split", SF_SMALL)
    assert ok, msg


def test_sp2_boundary_hour_is_tie_inclusive(spark):
    """The discrete cutpoint is an actual hour value and the whole cut
    hour lands in train: events in the cut hour -> train, the next hour ->
    test, and the train fraction is >= train_frac."""
    import pandas as pd

    from samsa_spark.operators.pipeline_ops import _SP2_HOUR_US, temporal_split

    H = _SP2_HOUR_US
    # 10 hours, one event each + one extra event inside hour 7
    rows = [(i, i * H + 7) for i in range(10)] + [(100, 7 * H + 123)]
    ev = spark.createDataFrame(pd.DataFrame(rows, columns=["event_id", "ts_us"]))
    got = {r.event_id: r.split for r in temporal_split(ev, train_frac=0.8).collect()}
    # 11 events over hours 0..9; the smallest hour with cume_dist >= 0.8
    # is hour 7 (9/11 = 0.818): hours <= 7 -> train (cut hour inclusive),
    # hours 8 and 9 -> test.
    assert got[100] == "train" and got[7] == "train"
    assert got[8] == "test" and got[9] == "test"
    n_train = sum(1 for s in got.values() if s == "train")
    assert n_train / len(got) >= 0.8


def test_sp2_no_future_leakage(spark):
    """Every train timestamp must precede every test timestamp — the
    property the operator exists for, checked on the gate corpus."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import temporal_split
    from tests.conftest import SF_SMALL

    ev = tables.load(spark, SF_SMALL, "events")
    sp = temporal_split(ev)
    agg = {
        r.split: (r.lo, r.hi, r.n)
        for r in sp.groupBy("split")
        .agg(F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi"), F.count("*").alias("n"))
        .collect()
    }
    assert agg["train"][1] < agg["test"][0], "future leaked into train"
    total = agg["train"][2] + agg["test"][2]
    assert agg["train"][2] / total >= 0.8


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    hours=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=40),
    frac_pct=st.integers(min_value=1, max_value=99),
)
def test_sp2_matches_python_percentile_disc_model(spark, hours, frac_pct):
    """sp2 vs the SQL-standard percentile_disc definition implemented
    independently in Python: cut = smallest hour whose cume_dist >= frac;
    every event at or before the cut hour is train. Duplicate hours and
    extreme fractions occur constantly."""
    import pandas as pd

    from samsa_spark.operators.pipeline_ops import _SP2_HOUR_US, temporal_split

    frac = frac_pct / 100.0
    rows = [(i, h * _SP2_HOUR_US + (i % 97)) for i, h in enumerate(hours)]
    ev = spark.createDataFrame(pd.DataFrame(rows, columns=["event_id", "ts_us"]))
    got = {r.event_id: r.split for r in temporal_split(ev, train_frac=frac).collect()}

    hs = sorted(hours)
    n = len(hs)
    cut = next(h for i, h in enumerate(hs, start=1) if i / n >= frac)
    want = {i: ("train" if h <= cut else "test") for i, (h) in enumerate(hours)}
    assert got == want


def test_is1_oracle_match(spark):
    ok, msg = check_query(spark, "is1_importance_resample", SF_SMALL)
    assert ok, msg


def test_is1_selects_target_lookalike_docs(spark):
    """The operator's point (DSIR): pool docs written in the target
    domain's vocabulary must outweigh and outselect pool docs that share
    nothing with it — and the keep fraction is honored on the quantized
    weight grid."""
    from samsa_spark.operators.pipeline_ops import importance_resample

    target_words = "alpha beta gamma delta epsilon"
    other_words = "rock paper scissors lizard spock"
    rows = []
    for i in range(10):  # the target domain corpus
        rows.append((i, target_words, "tgt"))
    for i in range(10, 20):  # pool docs that look like the target
        rows.append((i, target_words + " zeta", "pool"))
    for i in range(20, 30):  # pool docs that look nothing like it
        rows.append((i, other_words, "pool"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # keep_frac=0.25 places the percentile_disc cutpoint INSIDE the
    # lookalike group's (tied) weight, so tie-inclusion keeps exactly the
    # lookalike docs — with 0.5 the cut would land on the unrelated group's
    # weight and ties would keep everything (discrete-quantile semantics).
    out = importance_resample(docs, target_source="tgt", keep_frac=0.25).collect()
    assert {r.doc_id for r in out} == set(range(10, 30))
    lookalike = [r for r in out if r.doc_id < 20]
    unrelated = [r for r in out if r.doc_id >= 20]
    assert min(r.weight for r in lookalike) > max(r.weight for r in unrelated)
    assert all(r.kept for r in lookalike)
    assert not any(r.kept for r in unrelated)


def test_sp3_oracle_match(spark):
    ok, msg = check_query(spark, "sp3_kfold_split", SF_SMALL)
    assert ok, msg


def test_sp3_folds_uniform_inside_sp1_train(spark):
    """Note-27 composition check: the fold (modulus cut of the key hash)
    must stay near-uniform INSIDE sp1's train split (threshold cut of
    the same hash) — the modulus/threshold pair must not nest the way
    two thresholds did in the sm1 bug."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import _key_hash, _split_expr

    docs = tables.load(spark, SF_SMALL, "documents")
    both = docs.select(
        (_key_hash("doc_id") % 5).cast("int").alias("fold"),
        _split_expr(80).alias("split"),
    )
    counts = {
        (r.split, r.fold): r.n
        for r in both.groupBy("split", "fold").agg(F.count("*").alias("n")).collect()
    }
    train = [counts.get(("train", f), 0) for f in range(5)]
    assert min(train) > 0
    # uniform-ish: no fold holds less than half the mean within train
    assert min(train) >= 0.5 * (sum(train) / 5), train


def test_lm3_oracle_match(spark):
    ok, msg = check_query(spark, "lm3_interpolated_logprob", SF_SMALL)
    assert ok, msg


def test_lm3_fixes_both_parent_failure_modes(spark):
    """The mixture's reason to exist: (a) unlike lm2's raw conditional, a
    rare context cannot tank a doc to -inf-ish — the unigram floor keeps
    the mixture finite and moderate; (b) unlike lm1, ORDER matters: a
    shuffled word salad of common words scores below the fluent ordering
    of the same words."""
    from samsa_spark.operators.pipeline_ops import (
        bigram_logprob,
        interpolated_logprob,
        unigram_logprob,
    )

    fluent = "the cat sat on the mat"
    # same multiset of words, scrambled order (each bigram rare/unseen-ish)
    salad = "mat the on sat cat the"
    rows = [(i, fluent) for i in range(20)] + [(20, salad)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lm3 = {r.doc_id: r.avg_interp_logprob for r in interpolated_logprob(docs).collect()}
    assert lm3[20] < lm3[0], "order-blindness: salad must score below fluent"
    lm1 = {r.doc_id: r.avg_logprob for r in unigram_logprob(docs).collect()}
    assert abs(lm1[20] - lm1[0]) < 1e-6, "lm1 is order-blind by construction"
    lm2 = {r.doc_id: r.avg_logprob for r in bigram_logprob(docs).collect()}
    # the salad's observed-but-rare bigrams take the full conditional hit in
    # lm2; the mixture softens it with the unigram floor
    assert lm3[20] > lm2[20], "mixture must sit above the raw conditional"


def test_lm4_oracle_match(spark):
    ok, msg = check_query(spark, "lm4_kneser_ney_logprob", SF_SMALL)
    assert ok, msg


def _py_kn(rows, d=0.75):
    """Independent pure-Python interpolated Kneser-Ney (note-27 antidote:
    written from the formula, sharing no code with the Spark/SQL twins)."""
    import math
    from collections import Counter

    c2: Counter = Counter()
    for _, t in rows:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            c2[(a, b)] += 1
    c1: Counter = Counter()
    n1f: Counter = Counter()
    n1b: Counter = Counter()
    for (a, b), c in c2.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    nt = float(len(c2))
    out = {}
    for i, t in rows:
        w = t.split(" ")
        lps = [
            math.log(
                max(c2[(a, b)] - d, 0.0) / c1[a]
                + (d * (n1f[a] / c1[a])) * (n1b[b] / nt)
            )
            for a, b in zip(w, w[1:])
        ]
        out[i] = (len(lps), round(sum(lps) / len(lps), 6) if lps else None)
    return out


def test_lm4_matches_independent_python_model_on_random_corpora(spark):
    import random

    from samsa_spark.operators.pipeline_ops import kneser_ney_logprob

    for seed in (3, 17, 92):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]
        rows = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(1, 25))))
            for i in range(60)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (
                r.n_bigrams,
                None if r.avg_kn_logprob is None else round(r.avg_kn_logprob, 6),
            )
            for r in kneser_ney_logprob(docs).collect()
        }
        assert got == _py_kn(rows), f"seed {seed}"


def test_lm4_discriminates_where_raw_mle_is_blind(spark):
    """KN's reason to exist over the raw conditional: two deterministic
    continuations (c2 == c1, so lm2 scores both ln(1) = 0, blind) get
    DIFFERENT KN scores — the discount + continuation terms see through
    the raw MLE tie. And like lm2/lm3, word order still matters."""
    from samsa_spark.operators.pipeline_ops import (
        bigram_logprob,
        kneser_ney_logprob,
    )

    # 'york' follows three distinct contexts once each; 'francisco' follows
    # one context four times. Each scored doc is a single deterministic
    # bigram: raw MLE ties them at ln(1) = 0. (Not four york contexts: at
    # 4+4 the discount and continuation terms coincide at ln(0.85) exactly.)
    rows = [(i, f"x{i} york") for i in range(3)]
    rows += [(10 + i, "s1 francisco") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lm2 = {r.doc_id: r.avg_logprob for r in bigram_logprob(docs).collect()}
    assert abs(lm2[0] - lm2[10]) < 1e-9 and abs(lm2[0]) < 1e-9
    lm4 = {r.doc_id: r.avg_kn_logprob for r in kneser_ney_logprob(docs).collect()}
    assert lm4[0] != lm4[10], "KN must split the raw-MLE tie"
    # short docs: no bigrams -> 0 / NULL (lm2/lm3's contract)
    one = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
    r = kneser_ney_logprob(one).collect()[0]
    assert r.n_bigrams == 0 and r.avg_kn_logprob is None


def test_ws1_oracle_match(spark):
    from tests.conftest import SF_SMALL
    from tests.oracle import check_query

    ok, msg = check_query(spark, "ws1_weighted_sample", SF_SMALL)
    assert ok, msg


def test_ws1_selection_tracks_weights(spark):
    """Efraimidis-Spirakis: with a 100x weight ratio the heavy class must
    dominate the draw (the hash-uniform u is decorrelated from the id
    parity used to assign weights)."""
    from samsa_spark.operators.pipeline_ops import weighted_sample

    rows = [(i, 2000 if i % 2 == 0 else 20) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    top = weighted_sample(df, n=20).collect()
    heavy = sum(1 for r in top if r.doc_id % 2 == 0)
    assert heavy >= 15
    # keys are valid (ln(u)/w <= 0) and ordered best-first
    keys = [r.skey for r in top]
    assert all(k <= 0 for k in keys) and keys == sorted(keys, reverse=True)


# --- ppl1: CCNet perplexity bucketing ----------------------------------------


def test_ppl1_oracle_match(spark):
    ok, msg = check_query(spark, "ppl1_perplexity_buckets", SF_SMALL)
    assert ok, msg


def test_ppl1_bucket_semantics(spark):
    """Buckets are monotone in the quantized score within each language
    (tail <= middle <= head with boundary ties falling low), cover every
    doc exactly once, and land near thirds."""
    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import perplexity_buckets

    docs = tables.load(spark, SF_SMALL, "documents")
    got = perplexity_buckets(docs).collect()
    assert len(got) == docs.count()
    order = {"tail": 0, "middle": 1, "head": 2}
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (round(r.avg_logprob, 3), order[r.bucket]))
        seq = [order[r.bucket] for r in rows]
        assert seq == sorted(seq), f"{lang}: buckets not monotone in score"
        n = len(rows)
        counts = {b: sum(1 for r in rows if r.bucket == b) for b in order}
        if n >= 9:  # thirds are meaningful only with enough docs
            for b, c in counts.items():
                assert c >= 1, f"{lang}: empty {b} bucket"
            # disc cutpoints with ties keep each bucket within a loose band
            assert counts["tail"] <= 2 * n / 3 and counts["head"] <= 2 * n / 3


def test_ppl1_planted_rare_tokens_land_in_tail(spark):
    """A doc made of corpus-unique gibberish tokens must score the lowest
    mean logprob of its language and therefore sit in the tail bucket;
    a doc repeating the most common tokens sits in head."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import perplexity_buckets

    docs = tables.load(spark, SF_SMALL, "documents").select("doc_id", "text", "lang")
    lang = docs.first().lang
    common = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t").count().orderBy(F.desc("count")).first().t
    )
    extra = spark.createDataFrame(
        [
            (900001, "zqxv1 zqxv2 zqxv3 zqxv4 zqxv5 zqxv6", lang),
            (900002, " ".join([common] * 12), lang),
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r.doc_id: r
        for r in perplexity_buckets(docs.unionByName(extra)).collect()
    }
    assert got[900001].bucket == "tail"
    assert got[900002].bucket == "head"
    assert got[900001].avg_logprob < got[900002].avg_logprob


def test_ppl1_deterministic_under_repartition(spark):
    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import perplexity_buckets

    docs = tables.load(spark, SF_SMALL, "documents")
    a = {tuple(r) for r in perplexity_buckets(docs).collect()}
    b = {tuple(r) for r in perplexity_buckets(docs.repartition(7)).collect()}
    assert a == b and a


def test_pp3_oracle_match(spark):
    from tests.oracle import check_query

    ok, msg = check_query(spark, "pp3_prep_funnel", SF_SMALL)
    assert ok, msg


def test_pp3_funnel_invariants(spark):
    """Stage counts must be monotone through the filters, the split rows
    must sum to the dedup row, and every rule must agree with pp1's own
    building blocks (same quality expression, same canonical rule, same
    masked-hash split) on a planted corpus with known drop counts."""
    from samsa_spark.operators.pipeline_ops import prep_funnel

    rows = [
        (1, "a" * 60),                      # passes quality; unique
        (2, "a" * 60),                      # exact dup of 1 -> dropped at dedup
        (3, "b" * 60),                      # unique
        (4, "x" * 10),                      # too short -> quality drop
        (5, "1234567890" * 6),              # alpha ratio 0 -> quality drop
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.stage: (r.stage_idx, r.n_docs, r.kept_frac) for r in prep_funnel(docs).collect()}
    assert got["ingest"] == (0, 5, 1.0)
    assert got["quality_filter"] == (1, 3, 0.6)
    assert got["exact_dedup"] == (2, 2, 0.4)
    assert got["split_train"][1] + got["split_test"][1] == got["exact_dedup"][1]
