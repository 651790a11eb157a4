"""Long-session block hygiene — the root-cause lock for the round-12 dd14
flake (PLANS.md "dd14 flake" entries): operator-internal localCheckpoints
die with the SESSION, not the query, so a multi-hundred-query sweep session
accumulates storage blocks until a broadcast build cannot get memory
(note 39) — which hits whichever broadcast-heavy query runs at the
tipping point (dd14 in rounds 9 and 12). The sweep harness therefore frees
ALL persistent RDDs between queries; these tests lock that mechanism —
the free actually empties the persistent-RDD map, the repro switch
actually disables it, and freeing between queries cannot break a LATER
query (each query rebuilds its own frames from scratch)."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def _load_sweep():
    spec = importlib.util.spec_from_file_location(
        "oracle_sweep", _REPO / "scripts" / "oracle_sweep.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _persistent_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_free_persistent_rdds_empties_the_block_map(spark, monkeypatch):
    sweep = _load_sweep()
    monkeypatch.delenv("SAMSA_SWEEP_NO_FREE", raising=False)
    frames = [
        spark.range(1000 * (i + 1)).selectExpr("id", "id * 2 AS v").localCheckpoint(eager=True)
        for i in range(3)
    ]
    assert _persistent_count(spark) >= 3
    sweep._free_persistent_rdds(spark)
    assert _persistent_count(spark) == 0
    # freed localCheckpoints lose blocks AND lineage (note 45) — the frames
    # list is deliberately dead here; a later query must not reuse them.
    del frames


def test_no_free_switch_disables_cleanup(spark, monkeypatch):
    """SAMSA_SWEEP_NO_FREE=1 is the deliberate-repro switch for the
    accumulation class — it must actually leave blocks resident."""
    sweep = _load_sweep()
    df = spark.range(500).localCheckpoint(eager=True)
    n_before = _persistent_count(spark)
    assert n_before >= 1
    monkeypatch.setenv("SAMSA_SWEEP_NO_FREE", "1")
    sweep._free_persistent_rdds(spark)
    assert _persistent_count(spark) == n_before
    monkeypatch.delenv("SAMSA_SWEEP_NO_FREE")
    sweep._free_persistent_rdds(spark)
    assert _persistent_count(spark) == 0
    del df


def test_between_query_free_does_not_poison_the_next_query(spark, monkeypatch):
    """The sweep's contract: a query's frames are dead once its compare
    returns, so the free cannot affect the NEXT query — which builds its
    own checkpoints fresh. Run a checkpoint-using operator, free, run it
    again: identical result, no freed-lineage error."""
    from samsa_spark import tables
    from samsa_spark.operators.mining import copurchase_rules

    sweep = _load_sweep()
    monkeypatch.delenv("SAMSA_SWEEP_NO_FREE", raising=False)
    li = tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    first = [tuple(r) for r in copurchase_rules(li).collect()]
    sweep._free_persistent_rdds(spark)
    second = [tuple(r) for r in copurchase_rules(li).collect()]
    assert first == second
    sweep._free_persistent_rdds(spark)
    assert _persistent_count(spark) == 0
