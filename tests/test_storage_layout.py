"""Storage-layout scale levers, with the plan as the assertion:

1. bucketed tables — both join sides bucketed by the key means a
   co-located join with NO Exchange (the 100 TB repeated-join layout;
   samsa's per-partition state files are the degenerate single-node form
   of the same idea).
2. partitioned writes — directory partitioning turns a filter into
   PartitionFilters: pruned directories are never listed, let alone read.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL


def _formatted_plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bucketed_join_has_no_exchange(spark):
    from samsa_spark import tables

    wh = tempfile.mkdtemp(prefix="samsa-wh-")
    ev = tables.load(spark, SF_SMALL, "events").select("user_id", "event_id", "value")
    cust = tables.load(spark, SF_SMALL, "customer").select("c_custkey", "c_mktsegment")

    # external tables (explicit path): warehouse dir is a static conf
    ev.write.mode("overwrite").option("path", os.path.join(wh, "ev_b")).bucketBy(
        8, "user_id"
    ).sortBy("user_id").saveAsTable("ev_b")
    cust.withColumnRenamed("c_custkey", "user_id").write.mode("overwrite").option(
        "path", os.path.join(wh, "cust_b")
    ).bucketBy(8, "user_id").saveAsTable("cust_b")

    j = spark.table("ev_b").join(spark.table("cust_b"), "user_id")
    plan = _formatted_plan(j)
    # co-located: SortMergeJoin/ShuffledHashJoin over bucketed scans with no
    # shuffle exchange anywhere (disable broadcast to force the join shape)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _formatted_plan(spark.table("ev_b").join(spark.table("cust_b"), "user_id"))
        assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
        n = spark.table("ev_b").join(spark.table("cust_b"), "user_id").count()
        assert n == 1000  # every event's user is a customer key
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_partitioned_write_prunes(spark):
    from samsa_spark import tables

    base = tempfile.mkdtemp(prefix="samsa-part-")
    path = os.path.join(base, "events_by_type")
    ev = tables.load(spark, SF_SMALL, "events").select("user_id", "event_id", "event_type", "value")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)

    df = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    plan = _formatted_plan(df)
    assert "PartitionFilters" in plan and "purchase" in plan
    # pruned read returns exactly the partition's rows
    assert df.count() == ev.where("event_type = 'purchase'").count()


def test_write_shards_roundtrip_manifest_and_pruning(spark):
    """write_shards (round-5 verdict #5): read-back equals input, every
    shard file respects the record cap, the manifest accounts for every row
    and byte, and a split filter prunes partitions at the scan."""
    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import write_shards

    base = tempfile.mkdtemp(prefix="samsa-shards-")
    docs = tables.load(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    cap = 40  # force multiple files per split at this corpus size
    manifest = write_shards(docs, base, by_source=True, max_records_per_file=cap)

    back = spark.read.parquet(os.path.join(base, "data"))
    want = sorted(tuple(r) for r in docs.collect())
    got = sorted(tuple(r) for r in back.select(*docs.columns).collect())
    assert got == want, "shard read-back lost or altered rows"

    rows = manifest.collect()
    assert len(rows) > 2
    assert all(r.n_rows <= cap for r in rows), "maxRecordsPerFile violated"
    assert sum(r.n_rows for r in rows) == docs.count()
    assert all(r.n_bytes > 0 and r.min_doc_id <= r.max_doc_id for r in rows)
    # deterministic split: every doc in exactly one split, stable on rerun
    splits = {r.split for r in rows}
    assert splits == {"train", "test"}

    pruned = back.where(F.col("split") == "train")
    plan = _formatted_plan(pruned)
    assert "PartitionFilters" in plan and "train" in plan
    n_train = pruned.count()
    assert 0 < n_train < docs.count()
    # manifest agrees with the pruned scan
    assert n_train == sum(r.n_rows for r in rows if r.split == "train")

    # the loader helper applies the same filters as partition filters
    from samsa_spark.operators.pipeline_ops import read_shards

    via_helper = read_shards(spark, base, split="train")
    plan2 = _formatted_plan(via_helper)
    assert "PartitionFilters" in plan2 and "train" in plan2
    assert via_helper.count() == n_train
    one_source = read_shards(spark, base, split="train", source="wiki")
    assert "wiki" in _formatted_plan(one_source)


def test_compact_shards_merges_small_files_and_preserves_rest(spark):
    """compact_shards: fragment ONE split into tiny files, compact — the
    fragmented split collapses to target-sized files, the untouched split's
    files are byte-identical, the data roundtrips exactly, the patched
    manifest matches the files on disk, pruning still works, and a second
    call is a no-op (idempotence)."""
    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import (
        _shard_manifest,
        compact_shards,
        read_shards,
        write_shards,
    )

    base = tempfile.mkdtemp(prefix="samsa-compact-")
    docs = tables.load(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    write_shards(docs, base)
    want = sorted(tuple(r) for r in docs.collect())

    # Fragment the train split only (dynamic overwrite replaces just it),
    # then refresh the manifest to match the fragmented layout.
    data_path = os.path.join(base, "data")
    train = spark.read.parquet(data_path).where(F.col("split") == "train")
    train = train.localCheckpoint()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            train.repartition(1, "split")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 5)
            .partitionBy("split")
            .parquet(data_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = spark.read.parquet(data_path)
    _shard_manifest(back, ["split"]).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "manifest")
    )
    m0 = spark.read.parquet(os.path.join(base, "manifest")).collect()
    test_files_before = {(r.file, r.n_bytes) for r in m0 if r.split == "test"}
    n_train_files_before = sum(1 for r in m0 if r.split == "train")
    assert n_train_files_before > 10, "fixture failed to fragment"

    m1 = compact_shards(spark, base, target_bytes=1 << 30).collect()
    assert sum(1 for r in m1 if r.split == "train") == 1, "train not compacted"
    assert {(r.file, r.n_bytes) for r in m1 if r.split == "test"} == test_files_before, (
        "untouched split's files changed"
    )
    got = sorted(tuple(r) for r in read_shards(spark, base).select(*docs.columns).collect())
    assert got == want, "compaction lost or altered rows"
    # patched manifest matches the files actually on disk
    disk = sorted(
        tuple(r)
        for r in _shard_manifest(spark.read.parquet(data_path), ["split"]).collect()
    )
    assert sorted(tuple(r) for r in m1) == disk
    # pruning survives compaction
    plan = _formatted_plan(read_shards(spark, base, split="train"))
    assert "PartitionFilters" in plan and "train" in plan
    # idempotence: nothing left to do, file set unchanged
    m2 = compact_shards(spark, base, target_bytes=1 << 30).collect()
    assert {(r.file, r.n_bytes) for r in m2} == {(r.file, r.n_bytes) for r in m1}


def test_compact_shards_respects_target_bytes(spark):
    """With a small target, compaction must still reduce the file count but
    keep files near the target (maxRecordsPerFile derived from the
    manifest's bytes/rows ratio) rather than collapsing to one giant file."""
    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import compact_shards, write_shards

    base = tempfile.mkdtemp(prefix="samsa-compact2-")
    docs = tables.load(spark, SF_SMALL, "documents").select("doc_id", "text", "source")
    write_shards(docs, base, max_records_per_file=5)
    m0 = spark.read.parquet(os.path.join(base, "manifest")).collect()
    t = {}
    for r in m0:
        t[r.split] = t.get(r.split, 0) + r.n_bytes
    target = max(t.values()) // 3  # aim for ~3 files in the big split
    m1 = compact_shards(spark, base, target_bytes=int(target)).collect()
    by_split = {}
    for r in m1:
        by_split.setdefault(r.split, []).append(r)
    before = {s: 0 for s in by_split}
    for r in m0:
        before[r.split] += 1
    for s, rows in by_split.items():
        assert len(rows) < before[s], f"split {s} not reduced"
    assert sum(r.n_rows for r in m1) == docs.count()


def test_append_shards_adds_batch_without_touching_existing(spark):
    """append_shards: existing files byte-identical, batch rows land in
    the same deterministic split they'd get on day one, the patched
    manifest matches disk (validate_shards empty), and reads see the
    union."""
    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import (
        _split_expr,
        append_shards,
        read_shards,
        validate_shards,
        write_shards,
    )

    base = tempfile.mkdtemp(prefix="samsa-append-")
    docs = tables.load(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    day1 = docs.where(F.col("doc_id") % 2 == 0)
    day2 = docs.where(F.col("doc_id") % 2 == 1)
    write_shards(day1, base)
    m0 = {(r.file, r.n_bytes) for r in spark.read.parquet(base + "/manifest").collect()}

    m1 = append_shards(day2, base)
    m1_rows = m1.collect()
    assert {(r.file, r.n_bytes) for r in m1_rows} > m0, "old rows must be kept verbatim"
    assert all((r.file, r.n_bytes) in {(x.file, x.n_bytes) for x in m1_rows} for r in spark.read.parquet(base + "/manifest").collect())

    got = sorted(tuple(r) for r in read_shards(spark, base).select(*docs.columns).collect())
    assert got == sorted(tuple(r) for r in docs.collect())
    # split assignment identical to a from-scratch write
    want_split = {
        r.doc_id: r.split
        for r in docs.withColumn("split", _split_expr(80)).collect()
    }
    back = spark.read.parquet(base + "/data")
    assert {r.doc_id: r.split for r in back.select("doc_id", "split").collect()} == want_split
    assert validate_shards(spark, base).count() == 0


def test_validate_shards_flags_every_problem_class(spark):
    import shutil

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import validate_shards, write_shards

    base = tempfile.mkdtemp(prefix="samsa-validate-")
    docs = tables.load(spark, SF_SMALL, "documents").select("doc_id", "text", "source")
    write_shards(docs, base, max_records_per_file=100)
    assert validate_shards(spark, base).count() == 0

    # unlisted_file: copy a data file under a new name
    import glob as g

    f = g.glob(os.path.join(base, "data", "split=train", "*.parquet"))[0]
    shutil.copy(f, f.replace(".parquet", "-rogue.parquet"))
    # missing_on_disk: delete a test-split file
    f2 = g.glob(os.path.join(base, "data", "split=test", "*.parquet"))[0]
    os.remove(f2)
    spark.catalog.refreshByPath(os.path.join(base, "data"))
    probs = {r.problem for r in validate_shards(spark, base).collect()}
    assert probs == {"unlisted_file", "missing_on_disk"}


def test_incremental_prep_recipe_lifecycle(spark):
    """The daily-batch composition the shard layout exists for: day-1
    write; day-2 batch deduped against day-1 contents, appended; compact;
    validate clean; epoch read sees exactly the distinct union."""
    from samsa_spark import tables
    from samsa_spark.operators.dedup import dedup_against
    from samsa_spark.operators.pipeline_ops import (
        append_shards,
        compact_shards,
        read_shards,
        validate_shards,
        write_shards,
    )

    base = tempfile.mkdtemp(prefix="samsa-incr-")
    docs = tables.load(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    day1 = docs.where(F.col("doc_id") % 3 == 0)
    # day-2 batch: new docs + exact re-crawls of day-1 content
    dup = day1.limit(20).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    day2 = docs.where(F.col("doc_id") % 3 == 1).unionByName(dup)

    write_shards(day1, base)
    flags = dedup_against(day2, read_shards(spark, base))
    fresh = day2.join(
        flags.where(~F.col("in_reference")).select("doc_id"), "doc_id"
    )
    assert fresh.count() == day2.count() - 20, "re-crawled contents must drop"
    append_shards(fresh, base)
    compact_shards(spark, base, target_bytes=1 << 30)
    assert validate_shards(spark, base).count() == 0
    texts = {r.text for r in read_shards(spark, base).collect()}
    want = {r.text for r in day1.collect()} | {r.text for r in day2.collect()}
    assert texts == want


def test_funnel_on_bucketed_events_has_no_exchange(spark):
    """The PLANS.md claim behind fu1's design: on a user_id-bucketed
    layout the whole funnel chain (three conditional-min aggregates +
    their joins) runs WITHOUT any shuffle exchange — every aggregate and
    join keys on the bucketing column."""
    from samsa_spark import tables
    from samsa_spark.operators.advanced import funnel_stages

    wh = tempfile.mkdtemp(prefix="samsa-funnel-b-")
    ev = tables.load(spark, SF_SMALL, "events").select(
        "user_id", "event_type", "ts_us"
    )
    ev.write.mode("overwrite").option("path", os.path.join(wh, "ev_fb")).bucketBy(
        8, "user_id"
    ).sortBy("user_id").saveAsTable("ev_fb")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fun = funnel_stages(spark.table("ev_fb"))
        plan = _formatted_plan(fun)
        assert "Exchange hashpartitioning" not in plan, "bucketed funnel shuffles"
        # and it still computes the same answer as the parquet path
        want = {tuple(r) for r in funnel_stages(ev).collect()}
        got = {tuple(r) for r in fun.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_read_shards_pruned_skips_files_and_stays_exact(spark):
    """Manifest-stat file skipping: (a) pruned read == full read + filter on
    BOTH clustered and unclustered layouts (stats are sound regardless);
    (b) on the cluster_by layout a narrow doc_id range touches a strict
    minority of the split's files while the unclustered layout's
    overlapping ranges prune nothing; (c) stats stay sound across
    append_shards."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import (
        append_shards,
        read_shards,
        read_shards_pruned,
        write_shards,
    )

    docs = tables.load(spark, SF_SMALL, "documents")
    n = docs.count()
    lo, hi = 10, 10 + n // 20  # ~5% of the id space

    def rows(df):
        return sorted(tuple(r) for r in df.select("doc_id", "text").collect())

    # The negative control scrambles input order (hash sort) — the fixture
    # arrives doc_id-ordered, which would make even an unclustered write
    # accidentally tight on doc_id.
    scrambled = docs.orderBy(F.sha2("text", 256))
    for cluster, source in ((None, scrambled), ("doc_id", docs)):
        path = tempfile.mkdtemp(prefix=f"shards-prune-{cluster}-")
        manifest = write_shards(
            source, path, max_records_per_file=50, cluster_by=cluster
        )
        want = rows(read_shards(spark, path).where(F.col("doc_id").between(lo, hi)))
        pruned = read_shards_pruned(spark, path, lo, hi)
        got = rows(pruned)
        assert got == want and len(got) > 0
        if cluster == "doc_id":
            # the scan itself (not just the manifest math) touches a
            # strict minority of the layout's files
            n_all = len(read_shards(spark, path).inputFiles())
            assert len(pruned.inputFiles()) * 3 <= n_all
        total = manifest.where("split = 'train'").count()
        hit = manifest.where(
            (F.col("split") == "train")
            & (F.col("max_doc_id") >= lo)
            & (F.col("min_doc_id") <= hi)
        ).count()
        if cluster == "doc_id":
            assert hit * 3 <= total, f"clustered layout should skip: {hit}/{total}"
            # (c) append keeps stats sound: new batch, disjoint id range
            batch = docs.select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                *[c for c in docs.columns if c != "doc_id"],
            )
            append_shards(batch, path)
            got2 = rows(read_shards_pruned(spark, path, 1_000_000 + lo, 1_000_000 + hi))
            want2 = rows(
                read_shards(spark, path).where(
                    F.col("doc_id").between(1_000_000 + lo, 1_000_000 + hi)
                )
            )
            assert got2 == want2 and len(got2) > 0
        else:
            assert hit == total  # unclustered: every file's range overlaps
    # empty-intersection fast path returns an empty frame with the schema
    assert read_shards_pruned(spark, path, -50, -10).count() == 0


def test_delete_from_shards_rewrites_only_hit_files(spark):
    """Targeted delete: (a) result == original minus the id set, (b) files
    without hits keep their exact paths (byte-untouched), (c) the manifest
    stays consistent (validate_shards clean), (d) on a clustered layout
    the rewrite set is a strict minority of files, (e) deleting absent ids
    is a no-op."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import (
        delete_from_shards,
        read_shards,
        validate_shards,
        write_shards,
    )

    docs = tables.load(spark, SF_SMALL, "documents")
    path = tempfile.mkdtemp(prefix="shards-delete-")
    write_shards(docs, path, max_records_per_file=50, cluster_by="doc_id")
    before_manifest = spark.read.parquet(f"{path}/manifest")
    before_files = {r.file for r in before_manifest.select("file").collect()}

    victims = [5, 6, 7, 8, 9, 10, 11, 12]
    manifest = delete_from_shards(spark, path, victims)

    got = sorted(r.doc_id for r in read_shards(spark, path).select("doc_id").collect())
    want = sorted(
        r.doc_id
        for r in docs.where(~F.col("doc_id").isin(victims)).select("doc_id").collect()
    )
    assert got == want

    after_files = {r.file for r in manifest.select("file").collect()}
    surviving_old = before_files & after_files
    rewritten = before_files - after_files
    # contiguous victim range on a clustered layout: most files untouched
    assert len(rewritten) * 3 <= len(before_files)
    assert len(surviving_old) > 0
    assert validate_shards(spark, path).count() == 0

    # no-op delete: ids nowhere in the layout
    m2 = delete_from_shards(spark, path, [10_000_000, 10_000_001])
    assert {r.file for r in m2.select("file").collect()} == after_files
    assert read_shards(spark, path).count() == len(want)


def test_drop_shards_where_file_level_retention(spark):
    """rt1 retention: dropping a source removes exactly its files (no data
    file read, no rewrite — surviving files keep their paths), the
    manifest stays consistent with disk (validate_shards clean), readers
    stop seeing the dropped rows, and a no-match predicate is a no-op."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import (
        drop_shards_where,
        read_shards,
        validate_shards,
        write_shards,
    )

    docs = tables.load(spark, SF_SMALL, "documents")
    victim = docs.first().source
    path = tempfile.mkdtemp(prefix="shards-retain-")
    write_shards(docs, path, by_source=True, max_records_per_file=50)
    before = spark.read.parquet(f"{path}/manifest")
    before_files = {r.file for r in before.select("file").collect()}
    victim_files = {
        r.file for r in before.where(F.col("source") == victim).select("file").collect()
    }
    assert victim_files and victim_files < before_files

    manifest = drop_shards_where(spark, path, f"source = '{victim}'")
    after_files = {r.file for r in manifest.select("file").collect()}
    assert after_files == before_files - victim_files  # survivors untouched
    for f in victim_files:
        assert not os.path.exists(f.removeprefix("file://").removeprefix("file:"))
    assert validate_shards(spark, path).count() == 0
    got = read_shards(spark, path)
    assert got.where(F.col("source") == victim).count() == 0
    assert got.count() == docs.where(F.col("source") != victim).count()

    # no-op: predicate matches nothing; manifest unchanged
    m2 = drop_shards_where(spark, path, "n_rows < 0")
    assert {r.file for r in m2.select("file").collect()} == after_files


def test_drop_shards_where_reclaims_crash_orphans(spark):
    """The crash-recovery contract (round-10 advice): a file left on disk
    after the manifest was patched but before the FS delete ran (or an
    interrupted compact's uncommitted output) is invisible to readers and
    flagged unlisted by validate_shards — and ANY later drop_shards_where
    run, including one whose predicate matches nothing, reclaims it."""
    import shutil

    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import (
        drop_shards_where,
        validate_shards,
        write_shards,
    )

    docs = tables.load(spark, SF_SMALL, "documents")
    path = tempfile.mkdtemp(prefix="shards-orphan-")
    write_shards(docs, path, by_source=True, max_records_per_file=100)
    manifest = spark.read.parquet(f"{path}/manifest")
    some = manifest.first().file.removeprefix("file://").removeprefix("file:")
    # simulate the crash window: a data file exists that no manifest row
    # lists (copy a real part under an un-manifested name)
    orphan = os.path.join(os.path.dirname(some), "part-orphan-crash.snappy.parquet")
    shutil.copyfile(some, orphan)
    bad = validate_shards(spark, path)
    assert bad.where(F.col("problem") == "unlisted_file").count() == 1
    before_files = {r.file for r in manifest.select("file").collect()}

    m2 = drop_shards_where(spark, path, "n_rows < 0")  # matches nothing
    assert {r.file for r in m2.select("file").collect()} == before_files
    assert not os.path.exists(orphan)  # reclaimed
    assert validate_shards(spark, path).count() == 0


def test_drop_shards_where_id_epoch_on_clustered_layout(spark):
    """On a cluster_by='doc_id' layout an id-epoch retention predicate
    (max_doc_id < cut) drops only whole files strictly below the cut —
    every surviving doc >= the cut's file boundary, and no row with
    doc_id >= cut is lost."""
    import pyspark.sql.functions as F

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import (
        drop_shards_where,
        read_shards,
        validate_shards,
        write_shards,
    )

    docs = tables.load(spark, SF_SMALL, "documents")
    path = tempfile.mkdtemp(prefix="shards-epoch-")
    write_shards(docs, path, max_records_per_file=50, cluster_by="doc_id")
    cut = 200
    manifest = drop_shards_where(spark, path, f"max_doc_id < {cut}")
    got = read_shards(spark, path)
    # nothing >= cut lost
    assert (
        got.where(F.col("doc_id") >= cut).count()
        == docs.where(F.col("doc_id") >= cut).count()
    )
    # every dropped row was < cut (file-level: some < cut may survive in
    # files straddling the boundary, but no surviving FILE is fully below)
    assert manifest.where(F.col("max_doc_id") < cut).count() == 0
    assert validate_shards(spark, path).count() == 0


def test_drop_shards_where_never_reclaims_committer_staging(spark):
    """Round-11 advice regression: part files inside a Hadoop committer's
    '_temporary/...' staging tree (an in-flight write) end in .parquet with
    an innocuous NAME — the reclaim must skip them by checking every path
    component under {path}/data, or any drop_shards_where call overlapping
    a running write silently deletes its output. A genuinely orphaned file
    in the same run must still be reclaimed."""
    import shutil

    from samsa_spark import tables
    from samsa_spark.operators.pipeline_ops import drop_shards_where, write_shards

    docs = tables.load(spark, SF_SMALL, "documents")
    path = tempfile.mkdtemp(prefix="shards-staging-")
    write_shards(docs, path, by_source=True, max_records_per_file=100)
    manifest = spark.read.parquet(f"{path}/manifest")
    some = manifest.first().file.removeprefix("file://").removeprefix("file:")
    staging_dir = os.path.join(
        path, "data", "_temporary", "0", "_temporary", "attempt_0001"
    )
    os.makedirs(staging_dir)
    staged = os.path.join(staging_dir, "part-00000-inflight.snappy.parquet")
    shutil.copyfile(some, staged)
    orphan = os.path.join(os.path.dirname(some), "part-orphan-xyz.snappy.parquet")
    shutil.copyfile(some, orphan)

    drop_shards_where(spark, path, "n_rows < 0")  # matches nothing
    assert os.path.exists(staged)  # staging output untouched
    assert not os.path.exists(orphan)  # true orphan still reclaimed
    shutil.rmtree(os.path.join(path, "data", "_temporary"))
