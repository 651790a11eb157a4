"""Multimodal plumbing: oracle check for metadata-only path; Python
ground-truth for the mapInPandas decode stub."""

from __future__ import annotations

from tests.conftest import SF_SMALL
from tests.oracle import check_query


def test_mm1_oracle(spark):
    ok, msg = check_query(spark, "mm1_media_metadata", SF_SMALL)
    assert ok, msg


def _adler(content: bytes) -> int:
    a, b = 1, 0
    for byte in content:
        a = (a + byte) % 65521
        b = (b + a) % 65521
    return (b << 16) | a


def test_mm2_decode_matches_python(spark):
    from samsa_spark import tables
    from samsa_spark.operators.multimodal import as_media, decode_media

    docs = tables.load(spark, SF_SMALL, "documents")
    dec = {r.doc_id: r for r in decode_media(as_media(docs)).collect()}
    for r in docs.select("doc_id", "text").limit(25).collect():
        content = r.text.encode("utf-8")
        expect = _adler(content)
        got = dec[r.doc_id]
        assert got.n_bytes == len(content)
        assert got.checksum == expect, f"checksum mismatch for doc {r.doc_id}"
        assert got.width == 64 + expect % 1024
        assert got.height == 64 + (expect >> 10) % 1024


def test_mm2_stub_gate(spark):
    import pytest

    from samsa_spark import tables
    from samsa_spark.operators.multimodal import as_media, decode_media

    docs = tables.load(spark, SF_SMALL, "documents").limit(2)
    df = decode_media(as_media(docs), decode_stub=False)
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "NotImplementedError" in str(ei.value) or "real media decode" in str(ei.value)
