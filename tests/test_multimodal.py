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


def test_mm3_oracle(spark):
    ok, msg = check_query(spark, "mm3_resized_stats", SF_SMALL)
    assert ok, msg


def test_mm4_oracle(spark):
    ok, msg = check_query(spark, "mm4_frame_sample_stats", SF_SMALL)
    assert ok, msg


def test_resize_slices_real_bytes(spark):
    """The resize stub must emit the actual truncated payload, not just
    sizes: content == first w*h*3 bytes of the encoded text."""
    from samsa_spark import tables
    from samsa_spark.operators.multimodal import as_media, resize_media

    docs = tables.load(spark, SF_SMALL, "documents")
    out = {r.doc_id: r for r in resize_media(as_media(docs), 8, 8).collect()}
    budget = 8 * 8 * 3
    for r in docs.select("doc_id", "text").limit(20).collect():
        raw = r.text.encode("utf-8")
        got = out[r.doc_id]
        assert bytes(got.content) == raw[:budget]
        assert got.n_bytes_in == len(raw)
        assert got.n_bytes_out == min(len(raw), budget)
        assert (got.width, got.height) == (8, 8)


def test_frame_sampling_fan_out(spark):
    """1->N fan-out: every 3rd 256-byte frame, byte-exact, including the
    short final frame."""
    from samsa_spark import tables
    from samsa_spark.operators.multimodal import FRAME_BYTES, as_media, sample_frames

    docs = tables.load(spark, SF_SMALL, "documents")
    rows = sample_frames(as_media(docs), every_k=3).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for r in docs.select("doc_id", "text").limit(15).collect():
        raw = r.text.encode("utf-8")
        if not raw:
            assert r.doc_id not in by_doc
            continue
        frames = [raw[o : o + FRAME_BYTES] for o in range(0, len(raw), FRAME_BYTES)]
        want = {i: frames[i] for i in range(0, len(frames), 3)}
        got = {x.frame_idx: bytes(x.frame) for x in by_doc[r.doc_id]}
        assert got == want
        assert all(x.n_frames_total == len(frames) for x in by_doc[r.doc_id])


def test_mm2_stub_gate(spark):
    import pytest

    from samsa_spark import tables
    from samsa_spark.operators.multimodal import as_media, decode_media

    docs = tables.load(spark, SF_SMALL, "documents").limit(2)
    df = decode_media(as_media(docs), decode_stub=False)
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "NotImplementedError" in str(ei.value) or "real media decode" in str(ei.value)


def test_mm5_oracle_match(spark):
    from tests.conftest import SF_SMALL
    from tests.oracle import check_query

    ok, msg = check_query(spark, "mm5_interleaved_pack", SF_SMALL)
    assert ok, msg


def test_interleaved_pack_dual_budget_boundaries(spark):
    """Whichever budget binds first must close the bin: a token-heavy run
    advances bins on tokens while bytes are slack, a byte-heavy run (long
    unbroken words -> few tokens, many bytes) advances on bytes."""
    import pandas as pd

    from samsa_spark.operators.multimodal import interleaved_pack

    token_heavy = " ".join("t" for _ in range(30))      # 30 tokens, 59 bytes
    byte_heavy = "x" * 500                              # 1 token, 500 bytes
    rows = [(i, "tok", token_heavy) for i in range(10)] + [
        (100 + i, "byt", byte_heavy) for i in range(10)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    )
    out = {
        (r.source, r.bin): r
        for r in interleaved_pack(
            docs, budget_tokens=64, budget_media_bytes=1024
        ).collect()
    }
    # tok source: 30 tokens/doc, 64-token budget -> bins advance every ~2-3
    # docs on the TOKEN rule (bytes 59/doc never reach 1024 first).
    tok_bins = sorted(b for s, b in out if s == "tok")
    assert len(tok_bins) > 1
    assert all(out[("tok", b)].bin_tokens <= 64 + 30 for b in tok_bins)
    # byt source: 500 bytes/doc, 1024-byte budget -> bins advance every ~2-3
    # docs on the BYTE rule (1 token/doc never reaches 64 first).
    byt_bins = sorted(b for s, b in out if s == "byt")
    assert len(byt_bins) > 1
    assert all(out[("byt", b)].bin_media_bytes <= 1024 + 500 for b in byt_bins)
    # conservation: every doc lands in exactly one bin
    assert sum(r.n_docs for r in out.values()) == 20


def test_interleaved_pack_chunked_hierarchy(spark):
    """mm5's chunk_docs form: bins never span doc-id chunks, doc counts
    conserve, and a chunk size larger than the corpus reduces exactly to
    the global form (pk2's contract transposed)."""
    import pandas as pd

    from samsa_spark.operators.multimodal import interleaved_pack

    rows = [(i, "s", " ".join("w" for _ in range(30))) for i in range(40)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    )
    chunked = interleaved_pack(
        docs, budget_tokens=64, budget_media_bytes=10_000, chunk_docs=10
    ).collect()
    assert sum(r.n_docs for r in chunked) == 40
    for r in chunked:
        chunk = r.bin >> 20
        assert r.first_doc // 10 == chunk and r.last_doc // 10 == chunk, (
            "bin spans a chunk boundary"
        )
    huge = interleaved_pack(
        docs, budget_tokens=64, budget_media_bytes=10_000, chunk_docs=1_000_000
    ).collect()
    flat = interleaved_pack(docs, budget_tokens=64, budget_media_bytes=10_000).collect()
    assert sorted((r.bin, r.n_docs, r.bin_tokens) for r in huge) == sorted(
        (r.bin, r.n_docs, r.bin_tokens) for r in flat
    )
