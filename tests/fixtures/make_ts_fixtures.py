"""Regenerate the committed timestamp-encoding fixtures.

The driver's testdata generator has shipped ``events.ts`` in two parquet
encodings across rounds — TIMESTAMP(NANOS) (rounds 1-4) and
TIMESTAMP(MICROS) isAdjustedToUTC=false (round 5+). ``tables.load``
normalizes either (plus an instant-typed read) to the same
``(ts TIMESTAMP_NTZ, ts_us BIGINT)`` contract. These tiny committed
fixtures keep every branch of that normalization under test regardless of
which encoding the current testdata generation happens to use.

Run from the repo root: ``python tests/fixtures/make_ts_fixtures.py``
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

HERE = Path(__file__).resolve().parent

# Microsecond epochs chosen to cover the epoch itself, negative values,
# and a realistic 2023 instant with sub-second precision.
TS_US = [0, 1_000_000, -1_000_000, 1_700_000_000_000_000, 1_700_000_000_123_456]

# The NANOS encoding can carry sub-microsecond residue that both Spark
# (integer div) and DuckDB (epoch_us) truncate away — give positive rows
# distinct residues so truncation bugs can't cancel out. The negative row
# stays residue-free: truncate-toward-zero (Spark div) vs floor differ
# there, and real testdata has no pre-epoch events to pin one semantic.
NS_RESIDUE = [0, 1, 0, 500, 789]


def _base_columns() -> dict[str, pa.Array]:
    n = len(TS_US)
    return {
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array([f"u{i % 2}" for i in range(n)], type=pa.string()),
        "value": pa.array([float(i) for i in range(n)], type=pa.float64()),
    }


def main() -> None:
    nanos = pa.table(
        {
            **_base_columns(),
            "ts": pa.array(
                [us * 1000 + r for us, r in zip(TS_US, NS_RESIDUE)],
                type=pa.timestamp("ns"),
            ),
        }
    )
    micros = pa.table(
        {**_base_columns(), "ts": pa.array(TS_US, type=pa.timestamp("us"))}
    )
    # isAdjustedToUTC=true variant: tables.load must REFUSE this (the DuckDB
    # oracle would read it as TIMESTAMPTZ and silently diverge).
    utc_adjusted = pa.table(
        {**_base_columns(), "ts": pa.array(TS_US, type=pa.timestamp("us", tz="UTC"))}
    )
    for sub, table in [
        ("ts_nanos", nanos),
        ("ts_micros", micros),
        ("ts_utc_adjusted", utc_adjusted),
    ]:
        out = HERE / sub / "events.parquet"
        out.parent.mkdir(parents=True, exist_ok=True)
        pq.write_table(table, out, version="2.6")
        print(out, pq.ParquetFile(out).schema.column(3).logical_type)


if __name__ == "__main__":
    main()
