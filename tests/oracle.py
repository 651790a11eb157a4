"""Local stand-in for the driver's DuckDB correctness gate.

Runs a registered Spark query and its oracle SQL over the same sf dir and
compares row count, column names, and order-insensitive values (columns
sorted by name, rows sorted by their full tuple, cell-level normalization
for floats/decimals/timestamps).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import glob
import math

import duckdb


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return None
    # Tag the numeric class so an int column on one side and a float column
    # on the other (e.g. DuckDB HUGEINT -> pandas float64) is a mismatch.
    if isinstance(v, decimal.Decimal):
        return ("f", float(v))
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, 9))
    if isinstance(v, (_dt.datetime, _dt.date)):
        return str(v)
    # sequence check must precede the .item() scalar check: a numpy ARRAY
    # also has .item (which throws for size > 1).
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def _canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df_pandas[cols].itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return cols, rows


def compare(spark_df, oracle_pdf) -> tuple[bool, str]:
    spdf = spark_df.toPandas()
    c1, r1 = _canon(spdf)
    c2, r2 = _canon(oracle_pdf)
    if c1 != c2:
        return False, f"column mismatch: spark={c1} oracle={c2}"
    if len(r1) != len(r2):
        return False, f"row count mismatch: spark={len(r1)} oracle={len(r2)}"
    for i, (a, b) in enumerate(zip(r1, r2)):
        if a != b:
            return False, f"value mismatch at sorted row {i}: spark={a!r} oracle={b!r}"
    return True, f"ok ({len(r1)} rows)"


def check_query(spark, name: str, sf_dir: str) -> tuple[bool, str]:
    from samsa_spark import registry

    q = registry.all_queries()[name]
    sql = registry.all_oracle_sql().get(name)
    if sql is None:
        n = q(spark, sf_dir).count()
        return True, f"rows-only ({n} rows)"
    return compare(q(spark, sf_dir), run_oracle(sql, sf_dir))
