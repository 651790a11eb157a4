"""Multi-scale oracle sweep: run the ENTIRE oracle surface (the driver's
50-query window AND every demoted twin) against DuckDB at any scale
factor — the detector for the bug class CLAUDE.md note 29 records:
thresholds/caps that pass at the checked scales (pytest sf0.001, driver
sf0.01) but silently change meaning as data grows. hh1's candidate-cap
overflow at sf0.1 was caught exactly this way.

Usage:
    python scripts/oracle_sweep.py [sf_dir] [window|demoted|all]
    python scripts/oracle_sweep.py --round N

The first form prints one line per query and a SUMMARY line for one scale
(defaults /root/testdata/sf0.1, "all"); exit code 1 if anything failed.
The second form is the ROUND-CLOSE artifact (round-7 verdict item 2): it
sweeps the full oracle surface at sf0.001, sf0.01 AND sf0.1 in one
session and writes per-query pass/fail to ORACLE_SWEEP_r{NN}.json beside
CORRECTNESS_r{NN}.json — any multi-scale divergence fails the round.
Run one Spark job at a time either way (CLAUDE.md note 16).
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))

SCALES = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


def _connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        con.execute(
            f"CREATE VIEW {p.split('/')[-1].removesuffix('.parquet')}"
            f" AS SELECT * FROM '{p}'"
        )
    return con


def sweep(spark, sf_dir: str, which: str = "all", verbose: bool = True) -> dict[str, bool]:
    from oracle import compare

    from samsa_spark import registry

    con = _connect(sf_dir)
    aq, ao = registry.all_queries(), registry.all_oracle_sql()
    window = set(list(registry.queries())[:50])
    results: dict[str, bool] = {}
    for name, fn in aq.items():
        sql = ao.get(name)
        if sql is None:
            continue  # rows-only: ground truth lives in pytest
        in_window = name in window
        if which == "window" and not in_window:
            continue
        if which == "demoted" and in_window:
            continue
        try:
            ok, msg = compare(fn(spark, sf_dir), con.execute(sql).fetchdf())
        except Exception as ex:  # noqa: BLE001 — a sweep must not stop at query 3
            ok, msg = False, f"EXC {type(ex).__name__}: {ex}"
        if verbose:
            print(name, "OK" if ok else f"FAIL {msg}", flush=True)
        results[name] = ok
        _free_persistent_rdds(spark)
    return results


def _free_persistent_rdds(spark) -> None:
    """Operator-internal localCheckpoints die with the SESSION, not the
    query — across a ~370-query sweep session they accumulate until a
    broadcast build can't get memory (dd14 failed exactly this way at
    sf0.1 while passing standalone). Every query's frames are dead once
    its compare returns, so freeing ALL persistent RDDs between queries
    bounds the session to a single query's footprint.

    SAMSA_SWEEP_NO_FREE=1 disables the cleanup — the deliberate-repro
    switch for the note-39 accumulation class (round-13 dd14 experiment,
    PLANS.md), never for real sweeps."""
    import os

    if os.environ.get("SAMSA_SWEEP_NO_FREE") == "1":
        return
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(False)


def _sweep_spark(SparkSession):
    """Sweep session with the driver heap PINNED (default 16g) — a plain
    builder runs the whole local-mode engine at spark.driver.memory's 1g
    default (note 48; probed round 13: Runtime.maxMemory = 1024 MB),
    which means every pre-round-13 sweep ran the full oracle surface on a
    1 GiB JVM. The round-13 dd14 investigation (PLANS.md) could NOT
    reproduce the round-12 flake under any controlled combination — the
    sf0.1 'all' sweep passed at 4g+no-cleanup, 1g+cleanup, AND
    1g+no-cleanup — so the remaining suspect is a host-level transient
    (note 16's concurrent-load class), but running a 486-query sweep
    with ~100 MB of actual headroom is gratuitous fragility either way;
    the pin removes the memory-headroom factor entirely."""
    import os

    return (
        SparkSession.builder.master("local[16]")
        .appName("oracle-sweep")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .getOrCreate()
    )


def main() -> int:
    from pyspark.sql import SparkSession

    if len(sys.argv) > 1 and sys.argv[1] == "--round":
        n = int(sys.argv[2])
        spark = _sweep_spark(SparkSession)
        out: dict[str, object] = {}
        failed: list[str] = []
        for sf_dir in SCALES:
            label = sf_dir.rstrip("/").rsplit("/", 1)[-1]
            print(f"=== {label} ===", flush=True)
            res = sweep(spark, sf_dir, "all")
            out[label] = res
            failed.extend(f"{label}:{q}" for q, ok in res.items() if not ok)
        out["failed"] = failed
        path = _REPO / f"ORACLE_SWEEP_r{n:02d}.json"
        path.write_text(json.dumps(out, indent=1) + "\n")
        print(f"SUMMARY wrote {path} failed={failed}", flush=True)
        spark.stop()
        return 1 if failed else 0

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    spark = _sweep_spark(SparkSession)
    results = sweep(spark, sf_dir, which)
    bad = [q for q, ok in results.items() if not ok]
    print(f"SUMMARY sf_dir={sf_dir} which={which} failed={bad}", flush=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
