"""Multi-scale oracle sweep: run the ENTIRE oracle surface (the driver's
50-query window AND every demoted twin) against DuckDB at any scale
factor — the detector for the bug class CLAUDE.md note 29 records:
thresholds/caps that pass at the checked scales (pytest sf0.001, driver
sf0.01) but silently change meaning as data grows. hh1's candidate-cap
overflow at sf0.1 was caught exactly this way.

Usage:  python scripts/oracle_sweep.py [sf_dir] [window|demoted|all]

Defaults to /root/testdata/sf0.1 and "all". Prints one line per query
and a final SUMMARY line; exit code 1 if anything failed. Run it once
per round at sf0.1 (one Spark job at a time — CLAUDE.md note 16).
"""

from __future__ import annotations

import glob
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2] if len(sys.argv) > 2 else "all"

    import duckdb
    from pyspark.sql import SparkSession

    from oracle import compare
    from samsa_spark import registry

    spark = SparkSession.builder.master("local[16]").appName("oracle-sweep").getOrCreate()
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        con.execute(
            f"CREATE VIEW {p.split('/')[-1].removesuffix('.parquet')}"
            f" AS SELECT * FROM '{p}'"
        )

    aq, ao = registry.all_queries(), registry.all_oracle_sql()
    window = set(list(registry.queries())[:50])
    bad = []
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
        print(name, "OK" if ok else f"FAIL {msg}", flush=True)
        if not ok:
            bad.append(name)
    print(f"SUMMARY sf_dir={sf_dir} which={which} failed={bad}", flush=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
