"""Unified index lifecycle surface (round-11 verdict task 8).

Five persisted index families grew up in their own modules with slightly
different save/load/append/query/report/drift spellings. This module is
the ONE naming scheme a user needs — ``<verb>_<kind>`` over a shared
``path`` layout — delegating to the existing (still-supported) operator
functions, which remain the implementation and keep their tests:

======= =========== ======================================= ==============================
kind    backing     save / load / append                    query / report / drift
======= =========== ======================================= ==============================
ivf     similarity  save_ivf / load_ivf / append_ivf        query_ivf / report_ivf / drift_ivf
pq      similarity  save_pq / load_pq                       query_pq
graph   similarity  save_graph / load_graph / append_graph_ query_graph
text    text        save_text / load_text / append_text     query_text
dedup   dedup       save_dedup / append_dedup               query_dedup / drift_dedup
======= =========== ======================================= ==============================

Every ``save_*`` writes a one-row ``<path>/meta`` parquet recording the
build parameters (note 46: prebuilt-artifact params belong in a meta
file, not re-derivation or caller kwargs); :func:`read_meta` returns it
for any kind. Load-bearing parameter recovery stays where it already
lives — append_index reads the stored element type, ivf_pq_topk derives
the codebook stride (note 36), append_graph reads the graph meta — the
meta file adds the human/audit copy and cross-version validation
(append_dedup refuses an index whose recorded shingle width no longer
matches the library's).

All functions are THIN delegates: no new plan shapes, no new semantics.
The original names keep working everywhere (this module is the
consolidation, not a migration); roundtrip tests drive each kind through
the unified names in tests/test_index_surface.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from samsa_spark.operators import dedup as _dedup
from samsa_spark.operators import similarity as _sim
from samsa_spark.operators import text as _text


def _write_meta(spark: SparkSession, path: str, kind: str, **params) -> None:
    import json

    row = [(kind, json.dumps(params, sort_keys=True))]
    spark.createDataFrame(row, "kind string, params string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/meta_index")


def read_meta(spark: SparkSession, path: str) -> dict:
    """The build parameters any unified ``save_*`` recorded: ``{"kind":
    ..., **params}``. (The graph kind ALSO keeps its original typed
    ``<path>/meta`` frame — that one is load-bearing for append_graph and
    untouched here.)"""
    import json

    r = spark.read.parquet(f"{path}/meta_index").first()
    return {"kind": r.kind, **json.loads(r.params)}


# --- ivf ---------------------------------------------------------------------


def save_ivf(
    embeddings: DataFrame,
    path: str,
    cells: int = 32,
    iters: int = 4,
    quantize: bool = False,
) -> None:
    _sim.save_index(embeddings, path, cells=cells, iters=iters, quantize=quantize)
    _write_meta(
        embeddings.sparkSession, path, "ivf", cells=cells, iters=iters, quantize=quantize
    )


def load_ivf(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    cents, assign = _sim.load_index(spark, path)
    return {"centroids": cents, "assignments": assign}


def append_ivf(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    append_id: int | None = None,
) -> DataFrame:
    return _sim.append_index(spark, path, new_vectors, append_id=append_id)


def query_ivf(
    spark: SparkSession, path: str, n_probes: int = 20, k: int = 3
) -> DataFrame:
    return _sim.ivf_topk_prebuilt(spark, path, n_probes=n_probes, k=k)


def report_ivf(spark: SparkSession, path: str) -> DataFrame:
    return _sim.index_report(spark, path)


def drift_ivf(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/drift")


# --- pq ----------------------------------------------------------------------


def save_pq(
    embeddings: DataFrame,
    path: str,
    cells: int = 32,
    iters: int = 1,
    m: int | None = None,
    n_cents: int | None = None,
) -> None:
    kw = {}
    if m is not None:
        kw["m"] = m
    if n_cents is not None:
        kw["n_cents"] = n_cents
    _sim.save_pq_index(embeddings, path, cells=cells, iters=iters, **kw)
    _write_meta(
        embeddings.sparkSession,
        path,
        "pq",
        cells=cells,
        iters=iters,
        m=m if m is not None else _sim.PQ_M,
        n_cents=n_cents if n_cents is not None else _sim.PQ_K,
    )


def load_pq(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    return _sim.load_pq_index(spark, path)


def query_pq(
    spark: SparkSession,
    path: str,
    embeddings: DataFrame,
    n_probes: int = 20,
    k: int = 5,
) -> DataFrame:
    """IVF-PQ query over the saved artifacts (qz4's prebuilt regime). The
    probe set comes from ``embeddings`` (vec_id < n_probes, the library's
    probe convention); the corpus side reads only the probed cells' code
    partitions. Codebook stride derives from the ARTIFACT (note 36)."""
    idx = _sim.load_pq_index(spark, path)
    return _sim.ivf_pq_topk(
        embeddings,
        n_probes=n_probes,
        k=k,
        centroids=idx["centroids"],
        assignments=idx["assignments"],
        codebooks=idx["codebooks"],
        codes=idx["codes"],
    )


# --- graph -------------------------------------------------------------------


def save_graph(
    embeddings: DataFrame,
    path: str,
    cells: int = 32,
    iters: int = 4,
    m_edges: int | None = None,
    spill: int | None = None,
    n_entries: int | None = None,
) -> None:
    kw = {}
    if m_edges is not None:
        kw["m_edges"] = m_edges
    if spill is not None:
        kw["spill"] = spill
    if n_entries is not None:
        kw["n_entries"] = n_entries
    _sim.save_graph_index(embeddings, path, cells=cells, iters=iters, **kw)
    _write_meta(
        embeddings.sparkSession,
        path,
        "graph",
        cells=cells,
        iters=iters,
        m_edges=m_edges if m_edges is not None else _sim.GX_M,
        spill=spill if spill is not None else _sim.GX_SPILL,
        n_entries=n_entries if n_entries is not None else _sim.GX_ENTRIES,
    )


def load_graph(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    return _sim.load_graph_index(spark, path)


def append_graph_(spark: SparkSession, path: str, new_vectors: DataFrame) -> DataFrame:
    """Trailing underscore only because ``append_graph`` is the original
    operator name this delegates to; both spellings are public."""
    return _sim.append_graph(spark, path, new_vectors)


append_graph = append_graph_


def query_graph(
    spark: SparkSession,
    path: str,
    embeddings: DataFrame,
    n_probes: int = 20,
    k: int = 3,
) -> DataFrame:
    idx = _sim.load_graph_index(spark, path)
    meta = spark.read.parquet(f"{path}/meta").first()
    return _sim.graph_topk(
        embeddings,
        n_probes=n_probes,
        k=k,
        centroids=idx["centroids"],
        graph=idx["graph"],
        spill=int(meta.spill),
        n_entries=int(meta.n_entries),
    )


# --- text (BM25) --------------------------------------------------------------


def save_text(corpus: DataFrame, path: str) -> None:
    _text.save_text_index(corpus, path)
    _write_meta(corpus.sparkSession, path, "text", tokenizer="whitespace")


def load_text(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    return _text.load_text_index(spark, path)


def append_text(
    spark: SparkSession, path: str, new_docs: DataFrame
) -> dict[str, DataFrame]:
    return _text.append_text_index(spark, path, new_docs)


def query_text(
    spark: SparkSession,
    path: str,
    probes: DataFrame,
    k: int = 5,
    pushdown: bool = True,
) -> DataFrame:
    idx = _text.load_text_index(spark, path)
    return _text.bm25_query(idx, probes, k=k, pushdown=pushdown)


# --- dedup -------------------------------------------------------------------


def save_dedup(corpus: DataFrame, path: str) -> None:
    _dedup.save_dedup_index(corpus, path)
    _write_meta(corpus.sparkSession, path, "dedup", shingle_k=_dedup.SHINGLE_K)


def _check_dedup_meta(spark: SparkSession, path: str) -> None:
    # cross-version guard: an index ranked under a different shingle width
    # would silently produce wrong prefixes — refuse instead (note 46)
    from pyspark.errors import AnalysisException

    try:
        meta = read_meta(spark, path)
    except AnalysisException:
        return  # pre-unified artifact: no meta to check
    if meta.get("shingle_k") != _dedup.SHINGLE_K:
        raise ValueError(
            f"dedup index at {path} was built with shingle_k="
            f"{meta.get('shingle_k')} but this library shingles at "
            f"{_dedup.SHINGLE_K}; rebuild the index (save_dedup) before "
            "appending or querying"
        )


def append_dedup(spark: SparkSession, path: str, batch: DataFrame) -> DataFrame:
    _check_dedup_meta(spark, path)
    return _dedup.append_dedup_index(spark, path, batch)


def query_dedup(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    min_jaccard: float = _dedup.DD16_MIN_JACCARD,
) -> DataFrame:
    _check_dedup_meta(spark, path)
    return _dedup.dedup_against_index(spark, path, batch, min_jaccard=min_jaccard)


def drift_dedup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/drift")
