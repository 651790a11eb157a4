"""Record linkage (er1) and the mergeable quantile digest (qd1):
DuckDB-oracle parity plus the semantic claims — planted fuzzy variants
resolve into the right entities (and token-blocked non-matches don't),
and the digest estimate is within one bin width of the exact quantile.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from tests.oracle import check_query


def test_er1_oracle_match(spark):
    ok, msg = check_query(spark, "er1_entity_resolution", SF_SMALL)
    assert ok, msg


def test_qd1_oracle_match(spark):
    ok, msg = check_query(spark, "qd1_quantile_digest", SF_SMALL)
    assert ok, msg


def test_er2_oracle_match(spark):
    ok, msg = check_query(spark, "er2_incremental_entities", SF_SMALL)
    assert ok, msg


def test_er2_tiers_and_one_hop_contract(spark, tmp_path):
    """Exact variant -> entity at dist 0; new typo -> nearest variant's
    entity with its distance; unrelated names -> fresh entities resolved
    among themselves; and the one-hop contract: a name within reach of a
    MATCHED BATCH name but not of any MAP variant stays new."""
    from samsa_spark.operators.linkage import resolve_against_map, save_entity_map

    base = _parts(
        spark,
        [("red widget", "B", "T", 1, 1.0), ("red widgets", "B", "T", 2, 2.0),
         ("blue gear", "B", "T", 3, 3.0)],
    )
    p = str(tmp_path / "emap")
    save_entity_map(base, p)
    batch = _parts(
        spark,
        [
            ("red widgets", "B", "T", 4, 4.0),   # exact variant
            ("red widgett", "B", "T", 5, 5.0),   # fuzzy: lev 1 to 'red widget'
            ("green cog", "B", "T", 6, 6.0),     # new
            ("green cogs", "B", "T", 7, 7.0),    # new, clusters with green cog
            ("red widgettt", "B", "T", 8, 8.0),  # lev 2 to 'red widget' -> fuzzy
            ("red widgetttt", "B", "T", 9, 9.0),  # lev 3 to every MAP variant;
            # within lev 1 of batch-name 'red widgettt' — one-hop says NEW
        ],
    )
    out = {r.p_name: r for r in resolve_against_map(spark, p, batch).collect()}
    assert len(out) == 6
    assert out["red widgets"].entity_name == "red widget"
    assert out["red widgets"].match_dist == 0 and not out["red widgets"].is_new
    assert out["red widgett"].entity_name == "red widget"
    assert out["red widgett"].match_dist == 1 and not out["red widgett"].is_new
    assert out["red widgettt"].entity_name == "red widget"
    assert out["red widgettt"].match_dist == 2
    assert out["green cog"].is_new and out["green cogs"].is_new
    assert out["green cog"].entity_name == "green cog"
    assert out["green cogs"].entity_name == "green cog"
    assert out["green cog"].match_dist == -1
    # the one-hop contract: new entity despite chaining through a batch name
    assert out["red widgetttt"].is_new
    assert out["red widgetttt"].entity_name == "red widgetttt"


def _parts(spark, rows):
    return spark.createDataFrame(
        [(i, n, b, t, s, p) for i, (n, b, t, s, p) in enumerate(rows)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )


def test_er1_planted_variants_resolve(spark):
    """'red widget'/'red widgets'/'red widgett' are one entity (shared
    token + lev<=2); 'blue gear' stays its own; 'red gear' shares a token
    with the widget family but is beyond edit distance 2 of all of them."""
    from samsa_spark.operators.linkage import resolve_entities

    df = _parts(
        spark,
        [
            ("red widget", "B1", "T1", 1, 10.0),
            ("red widgets", "B1", "T1", 2, 11.0),
            ("red widgett", "B2", "T1", 3, 12.0),
            ("blue gear", "B1", "T2", 4, 20.0),
            ("red gear", "B1", "T2", 5, 21.0),
        ],
    )
    out = {r.entity_name: r for r in resolve_entities(df).collect()}
    # 'red gear'-'blue gear' share 'gear' and lev('red gear','blue gear')=3
    # -> separate; 'red gear'-'red widget' share 'red', lev=5 -> separate.
    assert set(out) == {"red widget", "blue gear", "red gear"}
    w = out["red widget"]
    assert w.n_parts == 3 and w.n_variants == 3 and w.n_brands == 2
    assert w.min_price == 10.0 and w.max_price == 12.0
    assert out["blue gear"].n_parts == 1 and out["red gear"].n_parts == 1


def test_er1_blocking_is_the_spec(spark):
    """A pair within edit distance 2 but sharing NO token does not merge —
    token blocking is part of the operator's definition (and the oracle's),
    not a silent recall bug."""
    from samsa_spark.operators.linkage import resolve_entities

    df = _parts(spark, [("ab cd", "B", "T", 1, 1.0), ("ax cx", "B", "T", 2, 2.0)])
    assert resolve_entities(df).count() == 2


def test_er1_transitive_chain_closes(spark):
    """a~b and b~c (each within distance 2, sharing tokens) must land in ONE
    entity even when lev(a, c) > 2 — the connected-components contract."""
    from samsa_spark.operators.linkage import resolve_entities

    df = _parts(
        spark,
        [
            ("steel bolt", "B", "T", 1, 1.0),
            ("steel bolts", "B", "T", 2, 2.0),
            ("steel boltss", "B", "T", 3, 3.0),  # lev to 'steel bolt' = 2
            ("steel boltsss", "B", "T", 4, 4.0),  # lev to 'steel bolt' = 3: chains via boltss
        ],
    )
    out = resolve_entities(df).collect()
    assert len(out) == 1 and out[0].n_parts == 4
    assert out[0].entity_name == "steel bolt"


def test_er2_ids_stable_across_batches(spark, tmp_path):
    """The frozen-map contract: two different batches resolved against the
    same saved map give IDENTICAL entity assignments for every name they
    share — batch composition can never move an existing entity id."""
    from samsa_spark.operators.linkage import resolve_against_map, save_entity_map

    base = _parts(
        spark,
        [("red widget", "B", "T", 1, 1.0), ("blue gear", "B", "T", 2, 2.0)],
    )
    p = str(tmp_path / "emap")
    save_entity_map(base, p)
    shared = [("red widgett", "B", "T", 10, 1.0), ("green cog", "B", "T", 11, 2.0)]
    b1 = _parts(spark, shared + [("blue gearr", "B", "T", 12, 3.0)])
    b2 = _parts(spark, shared + [("mauve sprocket", "B", "T", 13, 4.0)])
    r1 = {r.p_name: (r.entity_name, r.match_dist, r.is_new)
          for r in resolve_against_map(spark, p, b1).collect()}
    r2 = {r.p_name: (r.entity_name, r.match_dist, r.is_new)
          for r in resolve_against_map(spark, p, b2).collect()}
    for name in ("red widgett", "green cog"):
        assert r1[name] == r2[name], (name, r1[name], r2[name])
    assert r1["red widgett"] == ("red widget", 1, False)
    assert r1["green cog"] == ("green cog", -1, True)


def test_er2_append_closes_the_loop_and_is_idempotent(spark, tmp_path):
    """append_entity_map folds a batch's new entities into the map: the
    SAME batch re-resolved afterwards exact-matches at dist 0 with
    identical ids; a later variant one-hops onto the appended entity; and
    a retried append (at-least-once redelivery) appends nothing."""
    from samsa_spark.operators.linkage import (
        append_entity_map,
        resolve_against_map,
        save_entity_map,
    )

    base = _parts(spark, [("red widget", "B", "T", 1, 1.0)])
    p = str(tmp_path / "emap")
    save_entity_map(base, p)
    batch = _parts(spark, [("green cog", "B", "T", 2, 2.0)])
    r1 = resolve_against_map(spark, p, batch)
    appended = append_entity_map(spark, p, r1)
    assert [(r.p_name, r.entity_name) for r in appended.collect()] == [
        ("green cog", "green cog")
    ]
    # retry: same resolved output delivered again -> nothing new
    assert append_entity_map(spark, p, r1).isEmpty()
    # the same batch now exact-matches with a stable id
    r2 = {r.p_name: r for r in resolve_against_map(spark, p, batch).collect()}
    assert r2["green cog"].match_dist == 0 and not r2["green cog"].is_new
    assert r2["green cog"].entity_name == "green cog"
    # a later typo one-hops onto the appended entity
    later = _parts(spark, [("green cogs", "B", "T", 3, 3.0)])
    r3 = resolve_against_map(spark, p, later).collect()[0]
    assert (r3.entity_name, r3.match_dist, r3.is_new) == ("green cog", 1, False)


def test_qd1_estimate_within_one_bin_of_exact(spark):
    """The digest's whole point: the estimate's bin contains the exact
    quantile, so |est - exact| < width for every (group, q)."""
    from samsa_spark.operators.pipeline_ops import (
        QD1_BIN_WIDTH,
        QD1_QS,
        quantile_digest,
    )
    from samsa_spark import tables

    li = tables.load(spark, SF_SMALL, "lineitem")
    est = {
        (r.grp, r.q): r.est for r in quantile_digest(li).collect()
    }
    rows = li.select("l_returnflag", "l_extendedprice").collect()
    by_grp: dict[str, list[float]] = {}
    for r in rows:
        by_grp.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    for grp, vals in by_grp.items():
        vals.sort()
        for num, den, label in QD1_QS:
            # percentile_disc rule: smallest value with cume_dist >= q
            idx = math.ceil(num / den * len(vals)) - 1
            exact = vals[idx]
            e = est[(grp, label)]
            assert e <= exact < e + QD1_BIN_WIDTH, (grp, label, e, exact)


def test_qd1_digests_merge(spark):
    """Mergeability contract: bin counts built per shard and summed equal
    the one-shot digest, so the final quantile rows agree exactly when the
    corpus arrives split in halves vs whole."""
    from samsa_spark.operators.pipeline_ops import quantile_digest
    from samsa_spark import tables

    li = tables.load(spark, SF_SMALL, "lineitem")
    whole = {(r.grp, r.q): (r.bin, r.n) for r in quantile_digest(li).collect()}
    halves = li.where("l_orderkey % 2 = 0").unionByName(
        li.where("l_orderkey % 2 = 1")
    )
    split = {(r.grp, r.q): (r.bin, r.n) for r in quantile_digest(halves).collect()}
    assert whole == split
