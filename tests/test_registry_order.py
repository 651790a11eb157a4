"""The driver hash-checks only the first 50 registered queries; registry.py
orders registration so every window slot is an oracle-bearing query and the
high-novelty operators (streaming engine, dedup/similarity/multimodal, SQL
surface) all sit inside it. Lock that invariant."""

from samsa_spark import registry

WINDOW = 50

# Operators whose driver verification round 1/2 verdicts flagged as missing:
# these must never fall outside the checked window again.
MUST_BE_CHECKED = [
    "st1_streaming_state",
    "dd6_dedup_clusters",
    "sim1_cosine_topk",
    "sim2_embedding_near_dups",
    "mm1_media_metadata",
    "sql1_revenue_by_segment",
    "udtf1_ngram_counts",
    "st2_streaming_tombstones",
    "st3_streaming_custom_fold",
    "js1_salted_join",
    "mm3_resized_stats",
    "mm4_frame_sample_stats",
]


def test_window_is_all_oracle_bearing():
    names = list(registry.queries())
    oracles = registry.oracle_sql()
    window = names[: min(WINDOW, len(names))]
    missing = [n for n in window if n not in oracles]
    assert not missing, f"window slots wasted on rows-only queries: {missing}"


def test_high_novelty_operators_inside_window():
    names = list(registry.queries())
    positions = {n: i for i, n in enumerate(names)}
    outside = [n for n in MUST_BE_CHECKED if positions.get(n, WINDOW) >= WINDOW]
    assert not outside, f"oracle-bearing operators outside driver window: {outside}"


def test_demoted_queries_keep_in_window_sibling():
    """Every demoted relational twin still has a same-category query inside
    the window (the mapping registry.py documents)."""
    names = list(registry.queries())
    window = set(names[:WINDOW])
    siblings = {
        "set1_customers_without_orders": ["set2_active_nations"],
        "j3_anti_join": ["j2_order_priority_stats"],
        "w2_customer_order_flow": ["w1_segment_top_orders", "ses1_sessionize"],
        "fn2_null_semantics": ["fn1_scalar_functions"],
        "tm1_time_extraction": ["fn1_scalar_functions"],
        "cu1_cube_order_stats": ["ro1_rollup_revenue"],
        "h3_top_orders": ["w1_segment_top_orders"],
        "hist1_doc_lengths": ["pc1_percentiles"],
        "rg1_user_value_trends": ["da1_distinct_aggregates", "d10_windowed_changes"],
        "ag1_event_sequences": ["pk1_pack_sequences"],
        "pv1_pivot_event_counts": ["vec1_label_centroids"],
        "as1_asof_join": ["as2_asof_cogrouped"],
    }
    for demoted, sibs in siblings.items():
        if demoted in window:
            continue  # spare capacity pulled it back in — fine
        assert any(s in window for s in sibs), f"{demoted} demoted without sibling"


def test_every_query_has_oracle_or_documented_reason():
    """Rows-only queries are exactly the non-SQL-expressible set (xxhash64
    signatures, byte-loop checksums) — nothing silently loses its oracle."""
    oracles = registry.oracle_sql()
    rows_only = {n for n in registry.queries() if n not in oracles}
    assert rows_only <= {
        "dd3_minhash_lsh",
        "dd4_simhash_pairs",
        "sim3_ann_topk_lsh",
        "mm2_decoded_features",
    }, f"unexpected rows-only queries: {rows_only}"
