"""Record linkage / entity resolution (er1): blocked fuzzy matching over a
catalog's name column, connected components at NAME-TYPE cardinality, and
a golden-record rollup per resolved entity.

The reference engine stores rows under opaque keys (samsa/db/rocksdb.py —
one key, one value; no notion of two keys naming the same real-world
thing); entity resolution is the operator a catalog/state-store user
reaches for the moment two feeds disagree on spelling. This is the
classic three-stage linkage pipeline (Fellegi–Sunter blocking/compare/
cluster, re-expressed Spark-first):

1. **Collapse to name types.** All matching runs on ``DISTINCT`` name
   strings, never on rows (lm1/tx10's type-cardinality argument): a
   100 TB catalog has billions of rows but orders of magnitude fewer
   distinct names, and the rollup joins the resolved map back in one
   equi-join.
2. **Token blocking.** Candidate pairs share at least one whitespace
   token (an equi-join on the token key — never a name cross join);
   survivors verify with the real ``levenshtein`` (both engines
   implement plain Levenshtein with identical values — the tx10
   parity check). Blocking IS the spec: a pair differing in every
   token is definitionally a different entity here, and the oracle
   mirrors the same blocking so both engines decide identically.
3. **Cluster + golden record.** Matched name pairs form a graph;
   :func:`samsa_spark.operators.dedup.propagate_min_labels` (the dd6/sd1
   core) resolves connected components by iterative min-label
   propagation at name-type cardinality, and the canonical entity name
   (smallest member, lexicographic — identical collation on ASCII in
   both engines) keys a hash-aggregate rollup: row count, variant
   count, brand/type spread, price extents.

Scale shape: the only per-row work is one equi-join against the resolved
name map (name-type cardinality; AQE broadcasts it while small — never
forced, note 55) and one combining hash aggregate. The match join, the
verify, and the label loop all run at name-type cardinality; per-block
pair counts are bounded by block token frequency (report skew via the
token histogram before raising ``max_dist``). The exact DuckDB twin uses
the dd6 recursive-CTE closure over the same blocked edge set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from samsa_spark import tables
from samsa_spark.operators.dedup import propagate_min_labels

# Shared default so the registered query and the oracle cannot drift
# (the LINE_DEDUP_MIN_COUNT rule). Edit distance 2 is the SymSpell-family
# default (tx10) — one typo plus one pluralization.
ER1_MAX_DIST = 2
# Label-propagation safety bound: convergence needs component-diameter
# iterations; fuzzy-name clusters are shallow (a chain needs every hop
# within edit distance 2 while still sharing a token). The loop exits on
# convergence — this only caps a pathological corpus.
ER1_MAX_ITER = 25


def resolve_entities(part: DataFrame, max_dist: int = ER1_MAX_DIST) -> DataFrame:
    """er1 — resolve fuzzy name variants in ``part`` to canonical entities
    and roll up one golden record per entity: ``(entity_name, n_parts,
    n_variants, n_brands, n_types, min_price, max_price)``."""
    spark = part.sparkSession
    # One name-type frame feeds the token explode (both join sides), the
    # node list, and nothing row-sized (note 12's reuse argument — but at
    # name-type cardinality a recompute is cheap, so no checkpoint here;
    # propagate_min_labels checkpoints its own loop state).
    names = part.select("p_name").distinct()
    toks = names.select(
        "p_name", F.explode(F.split("p_name", " ")).alias("tok")
    ).where(F.col("tok") != "")
    a, b = toks.alias("a"), toks.alias("b")
    cand = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.p_name") < F.col("b.p_name")))
        .select(F.col("a.p_name").alias("src"), F.col("b.p_name").alias("dst"))
        .distinct()
    )
    edges = cand.where(F.levenshtein("src", "dst") <= max_dist)
    # The propagation loop EXECUTES here (convergence count per iteration):
    # pin shuffle partitions so tiny name-type iterations don't run 200
    # tasks on a vanilla session (dd6's scoping pattern).
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        labels = propagate_min_labels(
            names.select(F.col("p_name").alias("id")), edges, max_iter=ER1_MAX_ITER
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    ent_map = labels.select(
        F.col("id").alias("p_name"), F.col("label").alias("entity_name")
    )
    return (
        part.join(ent_map, "p_name")
        .groupBy("entity_name")
        .agg(
            F.count("*").alias("n_parts"),
            F.countDistinct("p_name").alias("n_variants"),
            F.countDistinct("p_brand").alias("n_brands"),
            F.countDistinct("p_type").alias("n_types"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
        )
    )


_ER1_SQL = f"""
WITH RECURSIVE names AS (
  SELECT DISTINCT p_name FROM part
), toks AS (
  SELECT p_name, unnest(string_split(p_name, ' ')) AS tok FROM names
), cand AS (
  SELECT DISTINCT a.p_name AS src, b.p_name AS dst
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.p_name < b.p_name
  WHERE a.tok != ''
), edges AS (
  SELECT src, dst FROM cand WHERE levenshtein(src, dst) <= {ER1_MAX_DIST}
), sym AS (
  SELECT src AS a, dst AS b FROM edges
  UNION ALL
  SELECT dst AS a, src AS b FROM edges
), reach AS (
  SELECT p_name AS src, p_name AS dst FROM names
  UNION
  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
), lab AS (
  SELECT src AS p_name, min(dst) AS entity_name FROM reach GROUP BY src
)
SELECT l.entity_name,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT p.p_name) AS BIGINT) AS n_variants,
       CAST(count(DISTINCT p.p_brand) AS BIGINT) AS n_brands,
       CAST(count(DISTINCT p.p_type) AS BIGINT) AS n_types,
       min(p.p_retailprice) AS min_price,
       max(p.p_retailprice) AS max_price
FROM part p JOIN lab l USING (p_name)
GROUP BY 1
"""


# --- registry wiring -------------------------------------------------------


def build_queries():
    def _er1(spark: SparkSession, sf: str) -> DataFrame:
        return resolve_entities(tables.load(spark, sf, "part"))

    return {
        "er1_entity_resolution": (_er1, _ER1_SQL),
    }
