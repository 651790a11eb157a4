"""File-format coverage (SURVEY.md §2.3 row 1): CSV and JSON round-trips
through the same operators — format is a scan/sink detail, not an operator
property. Also covers the approximate-sketch variants of exact aggregates
(the 100 TB path) within tolerance of the exact answers."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def base():
    d = tempfile.mkdtemp(prefix="samsa-fmt-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark):
    from samsa_spark import tables

    return tables.load(spark, SF_SMALL, "events").select(
        "user_id", "ts_us", "event_id", "event_type", "value"
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_roundtrip_compaction(spark, base, fmt):
    from samsa_spark.operators.state import compact_latest

    ev = _events(spark)
    path = os.path.join(base, fmt)
    writer = ev.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)

    reader = spark.read
    if fmt == "csv":
        back = reader.option("header", "true").schema(ev.schema).csv(path)
    elif fmt == "json":
        back = reader.schema(ev.schema).json(path)
    else:
        back = reader.orc(path)  # self-describing columnar, schema from footer

    want = {tuple(r) for r in compact_latest(ev, payload_cols=("event_type", "value")).collect()}
    got = {tuple(r) for r in compact_latest(back, payload_cols=("event_type", "value")).collect()}
    assert got == want


def test_approx_sketches_close_to_exact(spark):
    """approx_count_distinct (HLL) and approx_percentile (KLL-ish): the
    mergeable one-pass sketches that replace exact multi-distinct and
    sort-based percentiles at 100 TB. Checked within published error
    bounds against the exact answers."""
    from samsa_spark import tables

    li = tables.load(spark, SF_SMALL, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact_nd"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_nd"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_med"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx_med"),
    ).collect()[0]
    assert abs(row.approx_nd - row.exact_nd) / row.exact_nd < 0.06
    assert abs(row.approx_med - row.exact_med) / row.exact_med < 0.02


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    """Planted JSONL with malformed lines: clean rows parse fully, every
    bad line lands in quarantine verbatim (never dropped, never fatal),
    and good + quarantined counts conserve the input line count."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from samsa_spark.streaming.sources import read_jsonl

    lines = [
        '{"doc_id": 1, "text": "alpha"}',
        '{"doc_id": 2, "text": "beta"}',
        '{"doc_id": 3, "text": "gam',          # truncated mid-string
        'not json at all',
        '{"doc_id": 4, "text": "delta"}',
        '{"doc_id": "five", "text": "eps"}',   # type mismatch on long field
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    good, quarantine = read_jsonl(spark, str(p), schema)
    g = {r.doc_id: r.text for r in good.collect()}
    q = sorted(r.raw_line for r in quarantine.collect())
    assert g == {1: "alpha", 2: "beta", 4: "delta"}
    assert len(q) == 3 and 'not json at all' in q
    assert any(l.startswith('{"doc_id": "five"') for l in q)
    assert good.count() + quarantine.count() == len(lines)


def test_read_csv_quarantines_corrupt_lines(spark, tmp_path):
    """read_jsonl's quarantine contract on CSV: clean rows parse, rows with
    unparseable types, too many columns, or too few (PERMISSIVE CSV flags
    short rows as malformed — no silent null-padding) land in quarantine
    verbatim, and counts conserve the data-line total."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from samsa_spark.streaming.sources import read_csv

    lines = [
        "doc_id,text",
        "1,alpha",
        "2,beta",
        "notanumber,gamma",   # type mismatch on long field
        "4,delta,extra,cols", # too many columns
        "5",                  # too few columns
    ]
    p = tmp_path / "docs.csv"
    p.write_text("\n".join(lines) + "\n")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    good, quarantine = read_csv(spark, str(p), schema)
    g = {r.doc_id: r.text for r in good.collect()}
    q = sorted(r.raw_line for r in quarantine.collect())
    assert g == {1: "alpha", 2: "beta"}
    assert len(q) == 3
    assert any(l.startswith("notanumber") for l in q)
    assert any(l.startswith("4,delta") for l in q)
    assert "5" in q
    assert good.count() + quarantine.count() == 5
