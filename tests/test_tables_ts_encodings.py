"""Lock the dual-timestamp-encoding contract of ``tables.load``.

The driver's testdata generator flipped ``events.ts`` from parquet
TIMESTAMP(NANOS) (rounds 1-4) to TIMESTAMP(MICROS) (round 5+) mid-build;
whichever encoding the CURRENT testdata uses, the other branch of
``tables.load`` (tables.py) must not rot. These tests run every branch
against tiny committed fixtures (tests/fixtures/make_ts_fixtures.py):

- ``ts_nanos``   → LongType branch (read under nanosAsLong)
- ``ts_micros``  → TimestampNTZType branch (native NTZ inference)
- ``ts_micros`` with NTZ inference disabled → TimestampType instant branch
- ``ts_utc_adjusted`` → must raise (oracle would read TIMESTAMPTZ)

All wall-clock branches must yield byte-identical ``(event_id, ts, ts_us)``.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from samsa_spark import tables

FIXTURES = Path(__file__).resolve().parent / "fixtures"

# (ts_us, NANOS-only sub-microsecond residue) — keep in sync with
# make_ts_fixtures.py. Residue must truncate away identically on both
# Spark and DuckDB, so it never appears in the expected values.
EXPECTED_TS_US = [0, 1_000_000, -1_000_000, 1_700_000_000_000_000, 1_700_000_000_123_456]


def _load_rows(spark, sub: str, ntz_inference: bool = True):
    conf_key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, str(ntz_inference).lower())
    try:
        df = tables.load(spark, str(FIXTURES / sub), "events")
        return {
            r["event_id"]: (r["ts"], r["ts_us"])
            for r in df.select("event_id", "ts", "ts_us").collect()
        }
    finally:
        spark.conf.set(conf_key, prev)


@pytest.mark.parametrize(
    "sub,ntz_inference",
    [
        ("ts_nanos", True),  # LongType branch (nanosAsLong)
        ("ts_micros", True),  # TimestampNTZType branch
        ("ts_micros", False),  # TimestampType instant branch
    ],
    ids=["nanos-as-long", "micros-ntz", "micros-instant"],
)
def test_every_encoding_yields_identical_contract(spark, sub, ntz_inference):
    rows = _load_rows(spark, sub, ntz_inference)
    assert sorted(rows) == list(range(len(EXPECTED_TS_US)))
    for event_id, want_us in enumerate(EXPECTED_TS_US):
        ts, ts_us = rows[event_id]
        assert ts_us == want_us, f"event {event_id}: ts_us {ts_us} != {want_us}"
        # ts must be the same instant re-anchored as wall clock. Compare via
        # timedelta fields — total_seconds() loses precision at 1.7e15 µs.
        from datetime import datetime

        delta = ts - datetime(1970, 1, 1)
        got_us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        assert got_us == want_us, f"event {event_id}: ts {ts} != {want_us}µs"
        assert ts.tzinfo is None, "contract is TIMESTAMP_NTZ (naive)"


def test_branches_agree_pairwise(spark):
    nanos = _load_rows(spark, "ts_nanos", True)
    micros = _load_rows(spark, "ts_micros", True)
    instant = _load_rows(spark, "ts_micros", False)
    assert nanos == micros == instant


def test_utc_adjusted_encoding_is_refused(spark):
    with pytest.raises(ValueError, match="isAdjustedToUTC=true"):
        # With NTZ inference on, Spark types the column as an instant
        # (TimestampType) because the parquet flag says adjusted-to-UTC —
        # reaching the guarded branch.
        _load_rows(spark, "ts_utc_adjusted", True)


def test_oracle_parity_on_fixture(spark):
    """DuckDB reads the same fixtures; epoch_us(ts) must equal our ts_us.

    This is the property the whole contract exists for — the driver's
    correctness gate compares Spark results against DuckDB over the same
    parquet files.
    """
    duckdb = pytest.importorskip("duckdb")
    for sub in ["ts_nanos", "ts_micros"]:
        want = {
            r["event_id"]: r["ts_us"]
            for r in tables.load(spark, str(FIXTURES / sub), "events")
            .select("event_id", "ts_us")
            .collect()
        }
        got = dict(
            duckdb.sql(
                "SELECT event_id, epoch_us(ts) FROM "
                f"'{FIXTURES / sub / 'events.parquet'}'"
            ).fetchall()
        )
        assert got == want, sub
