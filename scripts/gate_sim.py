"""Driver-gate simulation: run the EXACT check the external driver runs —
a vanilla SparkSession (default 1 GiB heap, 200 shuffle partitions, no
project confs), `__spark_entry__.queries()`'s first 50 entries vs their
DuckDB oracles at sf0.01 — so a rotation or conf regression surfaces
BEFORE the round closes. Differs from oracle_sweep deliberately: that
harness pins 16g and covers all scales; this one replicates the driver's
own constraints (CLAUDE.md notes 9/48).

Usage: cd /tmp && python /root/repo/scripts/gate_sim.py
"""

from __future__ import annotations

import glob
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from oracle import compare

    sys.path.insert(0, str(_REPO))
    import __spark_entry__ as E

    spark = SparkSession.builder.master("local[16]").appName("gate-sim").getOrCreate()
    con = duckdb.connect()
    for p in glob.glob(f"{SF_DIR}/*.parquet"):
        con.execute(
            f"CREATE VIEW {p.split('/')[-1].removesuffix('.parquet')}"
            f" AS SELECT * FROM '{p}'"
        )
    qs, osql = E.queries(), E.oracle_sql()
    window = list(qs)[:50]
    entry_rows = E.entry(spark).count()
    print(f"entry rows: {entry_rows}", flush=True)
    failed = []
    for name in window:
        try:
            ok, msg = compare(qs[name](spark, SF_DIR), con.execute(osql[name]).fetchdf())
        except Exception as ex:  # noqa: BLE001 — report, don't stop
            ok, msg = False, f"EXC {type(ex).__name__}: {ex}"
        print(name, "OK" if ok else f"FAIL {msg}", flush=True)
        if not ok:
            failed.append(name)
    print(f"SUMMARY window=50 failed={failed}", flush=True)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
