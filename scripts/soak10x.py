"""10x scale soak: build an sf1-equivalent synthetic corpus (every table
replicated 10x with join-consistent key shifts) and run the bench HEADLINE +
PIPELINE sections against it single-pass — the round-9 verdict's task 6:
validate the flat-in-N / linear-in-N claims where they matter instead of
arguing them from plan shapes.

Usage:  python scripts/soak10x.py [factor] [tier]   (default 10, "all")

tier "heavy" (round-13 verdict task 5) runs ONLY the heaviest-tier six —
dd2/dd3/dd17/sd1/pr1/mf1 — each once at 1x (sf0.1) and once at the
replicated sf1-equivalent corpus (factor x sf0.1; 10 x sf0.1 = 100x the
driver's sf0.01 gate), same session, so the wall ratios are same-day and
same-protocol.

Emits one JSON line per query and a final per-section summary line; paste
the section table into PLANS.md. Replication rules:

- region/nation: copied (dimension tables don't grow with scale).
- customer/orders/lineitem/part/supplier: replica r shifts every key by
  r * (max_key + 1) consistently across fact/dim pairs, so join fan-outs
  and group cardinalities grow 10x while per-key history stays realistic.
- events: user/event id spaces shift per replica (10x keys AND 10x rows);
  ts shifts by r microseconds so ordering stays unique.
- documents: replica 0 keeps the text, replicas 1..9 append a replica
  token — TRUE near-dup pairs grow ~45x per original doc (the dd2/dd16
  candidate-mass stress the verdict named).
- embeddings: vec ids shift; vectors get a tiny deterministic per-replica,
  per-coordinate perturbation (no exact duplicates, clusters preserved).

Queries run once each (single pass — this is a soak, not a floor
measurement; same-day bench floors at 1x are the comparison base), with
persistent-RDD cleanup between queries (CLAUDE.md note 39) so the ~60-query
session stays within one query's footprint.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"


def build_corpus(spark, out_dir: str, factor: int) -> None:
    import pyspark.sql.functions as F

    from samsa_spark import tables

    reps = spark.range(factor).select(F.col("id").alias("_r"))

    def rep(df):
        return df.crossJoin(F.broadcast(reps))

    def write(df, name):
        df.drop("_r").write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")

    def maxkey(df, col):
        return int(df.agg(F.max(col)).first()[0]) + 1

    for t in ("region", "nation"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    supp = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    C, O = maxkey(cust, "c_custkey"), maxkey(orders, "o_orderkey")
    P, S = maxkey(part, "p_partkey"), maxkey(supp, "s_suppkey")

    def shifted(df, shifts: dict[str, int]):
        out = rep(df)
        for col, width in shifts.items():
            out = out.withColumn(col, F.col(col) + F.col("_r") * F.lit(width))
        return out

    write(shifted(cust, {"c_custkey": C}), "customer")
    write(shifted(orders, {"o_orderkey": O, "o_custkey": C}), "orders")
    write(shifted(part, {"p_partkey": P}), "part")
    write(shifted(supp, {"s_suppkey": S}), "supplier")
    write(
        shifted(li, {"l_orderkey": O, "l_partkey": P, "l_suppkey": S}), "lineitem"
    )

    ev = tables.load(spark, SF_DIR, "events")
    U, E = maxkey(ev, "user_id"), maxkey(ev, "event_id")
    write(
        rep(ev).select(
            (F.col("event_id") + F.col("_r") * E).alias("event_id"),
            # NTZ wall-clock (isAdjustedToUTC=false), the only encoding
            # tables.load accepts — timestamp_micros would write an
            # adjusted-to-UTC instant and trip the loader's refusal.
            F.expr(
                "timestampadd(MICROSECOND, ts_us + _r,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).alias("ts"),
            (F.col("user_id") + F.col("_r") * U).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
        "events",
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    D = maxkey(docs, "doc_id")
    newtext = F.when(F.col("_r") == 0, F.col("text")).otherwise(
        F.concat_ws(" ", "text", F.concat(F.lit("rep"), F.col("_r")))
    )
    write(
        rep(docs).select(
            (F.col("doc_id") + F.col("_r") * D).alias("doc_id"),
            newtext.alias("text"),
            "lang",
            "source",
            F.length(newtext).cast("long").alias("n_chars"),
        ),
        "documents",
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    V = maxkey(emb, "vec_id")
    write(
        rep(emb).select(
            (F.col("vec_id") + F.col("_r") * V).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> x + CAST(_r AS FLOAT) * 1e-4"
                " * CAST(i % 5 - 2 AS FLOAT))"
            ).alias("embedding"),
            "label",
        ),
        "embeddings",
    )


def _free_persistent_rdds(spark, keep: set[int] = frozenset()) -> None:
    # keep: RDD ids of session-prebuilt artifacts (gx1's graph) — an
    # unpersisted localCheckpoint loses its blocks AND its lineage, so
    # freeing one mid-session breaks every later query that reads it
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for rid, rdd in m.items():
        if int(rid) not in keep:
            rdd.unpersist(False)


# The heaviest tier by 100x-scale exposure (round-13 verdict task 5):
# near-dup pair mass (dd2), banded sketch joins (dd3), suffix-array span
# dedup (dd17), semantic dedup's quantize+per-cell pairing (sd1), and the
# iterative graph/factorization loops (pr1, mf1).
HEAVY = [
    "dd2_ngram_jaccard",
    "dd3_minhash_lsh",
    "dd17_exact_spans",
    "sd1_semantic_dedup",
    "pr1_pagerank",
    "mf1_als_convergence",
]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    tier = sys.argv[2] if len(sys.argv) > 2 else "all"

    import bench
    from samsa_spark import registry
    from samsa_spark.session import get_spark

    spark = get_spark(
        "samsa-soak10x", extra_conf={"spark.driver.memory": "48g"}
    )
    if tier == "heavy":
        qs = dict(registry.all_queries())
        protected = {
            int(i) for i in spark.sparkContext._jsc.getPersistentRDDs().keys()
        }
        qs["d2_state_table"](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        qs["sim3_ann_topk_lsh"](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        results: dict[str, dict[str, float]] = {}
        for label, src in (("1x", None), (f"sf1_{factor}x", "build")):
            if src == "build":
                out = tempfile.mkdtemp(prefix=f"samsa-soak{factor}x-")
                t0 = time.time()
                build_corpus(spark, out, factor)
                print(
                    json.dumps({"build_sec": round(time.time() - t0, 1), "dir": out}),
                    flush=True,
                )
                sf = out
            else:
                sf = SF_DIR
            for name in HEAVY:
                t0 = time.time()
                qs[name](spark, sf).write.mode("overwrite").format("noop").save()
                dt = round(time.time() - t0, 2)
                results.setdefault(name, {})[label] = dt
                print(
                    json.dumps({"section": f"heavy_{label}", "query": name, "sec": dt}),
                    flush=True,
                )
                _free_persistent_rdds(spark, keep=protected)
        ratios = {
            n: round(v[f"sf1_{factor}x"] / v["1x"], 2) for n, v in results.items()
        }
        print(json.dumps({"factor": factor, "tier": "heavy", "ratios": ratios}), flush=True)
        spark.stop()
        return
    out = tempfile.mkdtemp(prefix=f"samsa-soak{factor}x-")
    t0 = time.time()
    build_corpus(spark, out, factor)
    print(json.dumps({"build_sec": round(time.time() - t0, 1), "dir": out}), flush=True)

    qs = dict(registry.all_queries())
    qs["shards_roundtrip"] = bench._shards_roundtrip
    from samsa_spark import tables
    from samsa_spark.operators.similarity import (
        graph_topk,
        kmeans_centroids,
        nsw_cell_graph,
    )

    emb0 = tables.load(spark, out, "embeddings")
    gx_cents = kmeans_centroids(emb0, k=32, iters=1, round_cents=6).localCheckpoint(
        eager=True
    )
    gx_graph = nsw_cell_graph(emb0, centroids=gx_cents).localCheckpoint(eager=True)

    def _gx1_prebuilt_query(spark, sf_dir):
        return graph_topk(
            tables.load(spark, sf_dir, "embeddings"),
            centroids=gx_cents,
            graph=gx_graph,
        )

    qs["gx1_prebuilt_query"] = _gx1_prebuilt_query
    gx_graph.count()  # materialize both artifacts before snapshotting ids
    protected = {int(i) for i in spark.sparkContext._jsc.getPersistentRDDs().keys()}
    sections = {
        "headline": list(bench.HEADLINE),
        "pipeline": list(bench.PIPELINE),
        # the named scale claims from the verdict: dd16 candidate mass and
        # the composed IVF-PQ search at 10x corpus
        "claims": ["dd16_prefix_jaccard", "qz4_ivf_pq_topk"],
        # round-11 additions (round-10 verdict task 8): the globally-exact
        # span dedup (chunk count AND bridge volume scale with corpus),
        # the winnowed detector, and the graph tier's build + query split
        "r10_tier": [
            "dd17_exact_spans",
            "dd18_winnow_spans",
            "gx1_graph_topk",
            "gx1_prebuilt_query",
        ],
    }
    # warm JVM codegen + the Python worker pool once
    qs["d2_state_table"](spark, out).write.mode("overwrite").format("noop").save()
    qs["sim3_ann_topk_lsh"](spark, out).write.mode("overwrite").format("noop").save()

    totals = {}
    for section, names in sections.items():
        sec_total = 0.0
        for name in names:
            t0 = time.time()
            qs[name](spark, out).write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 2)
            sec_total += dt
            print(json.dumps({"section": section, "query": name, "sec": dt}), flush=True)
            _free_persistent_rdds(spark, keep=protected)
        totals[section] = round(sec_total, 1)
    print(json.dumps({"factor": factor, "section_totals": totals}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
