"""Physical-plan assertions: the 100 TB posture checks (SURVEY.md §4).

A query that returns correct rows through a bad plan fails here: filters
must reach the parquet scan, column pruning must shrink ReadSchema, small
dims must broadcast, aggregates must have a map-side partial phase, and the
relational path must be Python-free (no BatchEvalPython / ArrowEvalPython).
"""

import pytest

from etl_load_spark.queries import QUERIES


def plan_of(spark, sf_dir, name: str, execute: bool = False) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    if execute:
        df.collect()  # finalize AQE so codegen stages appear
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_parquet(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q02_filter_predicates")
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "In(o_orderstatus" in plan


def test_column_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    # lineitem has 11 columns; the scan must read only the 7 the query uses
    import re
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, plan
    read_cols = [c.split("#")[0] for c in m.group(1).split(",") if c]
    assert "l_orderkey" not in read_cols and "l_partkey" not in read_cols
    assert len(read_cols) <= 7


def test_small_dims_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q05_join_left_chain")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_top_revenue_broadcasts_customer(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q03_top_revenue")
    assert "BroadcastHashJoin" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q03_top_revenue")
    assert "TakeOrderedAndProject" in plan, "limit+orderBy should not global-sort"


def test_partial_aggregation(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    # two-phase agg: partial_ functions before the exchange
    assert "partial_sum" in plan or "partial_count" in plan


def test_semi_join_plan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q06_join_semi")
    assert "LeftSemi" in plan


def test_no_python_in_relational_path(spark, sf_dir):
    for name in ("q01_pricing_summary", "q03_top_revenue", "q10_window_rank",
                 "q25_dedup_exact", "q33_text_stats", "q30_sim_topk",
                 "q27_dedup_minhash"):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, f"{name} uses row-at-a-time Python"
        assert "ArrowEvalPython" not in plan, f"{name} unexpectedly uses a UDF"


def test_multimodal_uses_arrow_not_rowudf(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q37_multimodal_features")
    assert "MapInPandas" in plan or "ArrowEval" in plan
    assert "BatchEvalPython" not in plan


def test_band_join_is_equi_not_nested_loop(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q36_band_join")
    # the banded rewrite must produce a hash-based equi join on the bucket
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_whole_stage_codegen_active(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary", execute=True)
    # codegen'd operators carry the *(stage) prefix in the final plan
    assert "*(1)" in plan or "WholeStageCodegen" in plan


@pytest.mark.parametrize("name", ["q27_dedup_minhash", "q28_dedup_simhash",
                                  "q31_sim_topk_lsh", "q32_embedding_near_dup"])
def test_lsh_ops_join_on_buckets(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "BroadcastNestedLoopJoin" not in plan, f"{name} fell back to all-pairs"
    assert "CartesianProduct" not in plan, f"{name} fell back to cartesian"

def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """bucket_by sinks produce co-located tables: an equi-join on the bucket
    key plans with NO Exchange on either side (the 100 TB repeated-join
    pattern — pre-shuffled once at write time)."""
    from pyspark.sql import functions as F

    from etl_load_spark.sources.registry import write_sink
    from etl_load_spark.spec import EndpointConfig

    orders = spark.range(0, 1000).selectExpr("id AS o_key", "id % 7 AS o_val")
    items = spark.range(0, 3000).selectExpr("id % 1000 AS i_key", "id AS i_val")
    for name, df, key in (("t_bkt_orders", orders, "o_key"),
                          ("t_bkt_items", items, "i_key")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_sink(df, EndpointConfig("PARQUET", {
            "table": name, "bucket_by": [key], "n_buckets": 4,
            "sort_by": [key], "path": str(tmp_path / name)}))
    joined = (spark.table("t_bkt_orders").hint("merge")
              .join(spark.table("t_bkt_items"),
                    F.col("o_key") == F.col("i_key")))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert joined.count() == 3000


def test_q58_broadcasts_dim_chain(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q58_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4, "dim chain should broadcast"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_full_outer_reuses_aggregate_partitioning(spark, sf_dir):
    """q62: both sides arrive at the full-outer join already hash-partitioned
    by their aggregation — exactly one exchange per side, none for the join."""
    plan = plan_of(spark, sf_dir, "q62_full_outer_join")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "FullOuter" in plan


def test_vocab_topk_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q66_vocab_topk")
    assert "TakeOrderedAndProject" in plan
    # partial aggregation before the token shuffle
    assert "partial_count" in plan or "HashAggregate" in plan


def test_stream_static_enrich_broadcasts_dim(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q65_stream_static_enrich")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_union_by_name_no_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q69_union_by_name")
    assert "Union" in plan
    # the union itself adds no exchange; the only one is the final orderBy
    assert plan.count("Exchange hashpartitioning") == 0


def test_exists_is_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q81_exists_returned")
    assert "LeftSemi" in plan
    assert "PushedFilters" in plan  # date range reaches the orders scan


def test_promo_share_broadcasts_part(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q84_promo_share")
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "partial_sum" in plan


def test_bigram_topk_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q86_bigram_topk")
    assert "TakeOrderedAndProject" in plan


def test_contamination_equi_join_no_python(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q87_contamination")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_qualified_suppliers_semi_join_no_supplier_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q97_qualified_suppliers")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_important_parts_single_lineitem_scan(spark, sf_dir):
    # the global total must come from the per-part aggregate, not a second
    # scan of lineitem (per-branch pruning would defeat ReusedExchange)
    plan = plan_of(spark, sf_dir, "q96_important_parts")
    assert plan.count("FileScan parquet") == 1


def test_cheapest_supplier_no_window(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q98_cheapest_supplier")
    assert "Window" not in plan  # aggregate+join-back form, not a rank
    assert "partial_min" in plan


def test_market_share_single_shuffle_join(spark, sf_dir):
    """q104: all five dims broadcast; the only SortMerge/shuffle join
    allowed is lineitem⋈orders on orderkey."""
    plan = plan_of(spark, sf_dir, "q104_market_share")
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") <= 1
    assert "CartesianProduct" not in plan


def test_returned_items_topk_heap(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q105_returned_items")
    assert "TakeOrderedAndProject" in plan
    assert "returnflag" in plan  # filter pushed into the lineitem scan
    assert "PushedFilters: [" in plan


def test_supplier_exclusion_is_broadcast_anti(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q108_supplier_part_counts")
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_small_qty_partial_agg_before_joinback(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q109_small_quantity_revenue")
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_large_orders_aggregates_before_join(spark, sf_dir):
    """q110: the HAVING aggregate must run below the join back to orders
    (join inputs are the aggregate, not raw lineitem), and the top-100 is
    a TakeOrdered heap, not a global sort."""
    plan = plan_of(spark, sf_dir, "q110_large_volume_orders")
    assert "TakeOrderedAndProject" in plan
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1


def test_product_profit_broadcasts_all_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q111_product_profit")
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") <= 1


def test_edit_distance_dedup_never_cartesian(spark, sf_dir):
    """q112: the fuzzy-dedup self-join must go through the (lang, bucket)
    equi-keys — a theta-only join would be a cartesian product."""
    plan = plan_of(spark, sf_dir, "q112_dedup_edit_distance")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tfidf_broadcasts_vocab_no_sortmerge(spark, sf_dir):
    """q114: the vocabulary-sized df/N sides must broadcast back onto the
    corpus-sized tf stream — a SortMergeJoin here would re-shuffle the
    whole exploded-token aggregate."""
    plan = plan_of(spark, sf_dir, "q114_tfidf_topk")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sessionize_single_window_exchange(spark, sf_dir):
    """q115: lag and the running session-id sum share (user_id) partitioning
    and (us, event_id) ordering, so both window functions must ride ONE
    Exchange on user_id — no second sort-shuffle between them."""
    plan = plan_of(spark, sf_dir, "q115_sessionize")
    assert plan.count("Exchange hashpartitioning(user_id") <= 1


def test_date_spine_broadcast_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q116_date_spine")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_argmax_partial_aggregate_no_window(spark, sf_dir):
    """q118: top-1-per-group via max(struct) must partial-aggregate (two
    SortAggregate phases around one exchange), never a Window over the
    full customer stream."""
    plan = plan_of(spark, sf_dir, "q118_argmax_customer")
    assert "Window" not in plan
    assert plan.count("SortAggregate") >= 2 or "HashAggregate" in plan


def test_partitioned_layout_prunes_partitions(spark, sf_dir, tmp_path):
    """The partition_by sink layout must yield partition-PRUNED scans: a
    filter on the partition column appears as PartitionFilters on the
    parquet scan (directories never listed), not a post-scan Filter over
    all data."""
    from etl_load_spark.session import read_table
    from etl_load_spark.sources.writers import write_parquet
    path = str(tmp_path / "events_by_type")
    ev = read_table(spark, sf_dir, "events")
    write_parquet(ev, {"path": path, "partition_by": ["event_type"]})
    one = spark.read.parquet(path).filter("event_type = 'click'")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "isnotnull(event_type" in plan or "event_type" in plan.split(
        "PartitionFilters", 1)[1][:200]


def test_dynamic_partition_pruning_on_dim_filter(spark, sf_dir, tmp_path):
    """Joining a partitioned fact to a filtered dim must inject a runtime
    partition filter (dynamicpruning subquery) so only matching partitions
    of the fact are read — the DPP pattern that keeps a 100 TB
    date-partitioned fact from full-scanning on every dim-filtered join."""
    from etl_load_spark.session import read_table
    from etl_load_spark.sources.writers import write_parquet
    path = str(tmp_path / "orders_by_pri")
    o = read_table(spark, sf_dir, "orders")
    write_parquet(o, {"path": path, "partition_by": ["o_orderpriority"]})
    fact = spark.read.parquet(path)
    dim = (o.select("o_orderpriority").distinct()
           .filter("o_orderpriority like '1%'"))
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "false")
    try:
        joined = fact.join(dim, "o_orderpriority")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
            "true")


def test_shuffle_hash_hint_skips_sorts(spark, sf_dir):
    """q122: the SHUFFLE_HASH hint must produce a ShuffledHashJoin — no
    SortMergeJoin, hence no per-side sort phases before the join."""
    plan = plan_of(spark, sf_dir, "q122_shuffle_hash_join")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rolling_hour_single_exchange(spark, sf_dir):
    """q126: both trailing-frame aggregates share one (user_id) window
    exchange; no second shuffle between count and sum."""
    plan = plan_of(spark, sf_dir, "q126_rolling_hour")
    assert plan.count("Exchange hashpartitioning(user_id") <= 1
    assert plan.count("Window") == 1


def test_passage_dedup_reuses_block_exchange(spark, sf_dir):
    """q128: the tokenize+block subplan must feed both the first-occurrence
    aggregate and the probe join off ONE Exchange (ReusedExchange), never
    run twice; dedup is blocked, so no cartesian fallback."""
    plan = plan_of(spark, sf_dir, "q128_passage_dedup", execute=True)
    assert "ReusedExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_quality_rules_is_scan_fused(spark, sf_dir):
    """q129: the rule filter is a pure per-row projection — no shuffle for
    the rules themselves (the only exchange allowed is the output sort),
    no Python, a single scan of documents."""
    plan = plan_of(spark, sf_dir, "q129_quality_rules")
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("FileScan parquet") == 1


def test_data_mixture_filter_reaches_scan_side(spark, sf_dir):
    """q130: the mixture sample is a map-side filter (hash + literal map
    lookup) — no join against a weights table, no Python."""
    plan = plan_of(spark, sf_dir, "q130_data_mixture")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # two scans (totals + sampled branch), both over documents only
    assert plan.count("FileScan parquet") <= 2


def test_forecast_revenue_full_pushdown(spark, sf_dir):
    """q132 (TPC-H Q6): all three predicates must reach the parquet scan;
    the only shuffle is the single-row final aggregate."""
    plan = plan_of(spark, sf_dir, "q132_forecast_revenue")
    assert "PushedFilters: [" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in plan.split("PushedFilters")[1][:400], col
    assert "partial" in plan.lower()
    assert "Exchange hashpartitioning" not in plan  # global agg only


def test_semantic_dedup_cell_blocked(spark, sf_dir):
    """q133: each vector shuffles ONCE on the (cell, salt-group) key into a
    per-group BLAS gram — no pair join relation, no all-pairs fallback, no
    row-at-a-time Python; assignment + scoring are Arrow-batched. The
    max_cell_rows cap adds a per-cell COUNT whose result relation
    (≤ n_cells rows) must come back as a BROADCAST join — the vectors
    must never shuffle to meet the sizes, so the plan carries exactly two
    hash exchanges: the tiny (cell, count) aggregate and the one payload
    shuffle feeding applyInPandas."""
    plan = plan_of(spark, sf_dir, "q133_semantic_dedup")
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange hashpartitioning(_cell") == 2
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_quality_classifier_one_combinable_agg(spark, sf_dir):
    """q134: the scorer is explode + ONE partial-aggregated sum keyed by
    document — no Python, no second corpus pass."""
    plan = plan_of(spark, sf_dir, "q134_quality_classifier")
    assert "partial_sum" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("FileScan parquet") == 1


def test_pii_redaction_map_side_only(spark, sf_dir):
    """q138: PII counting + redaction must be pure scan-side expressions —
    the only exchange allowed is the final ORDER BY's range partitioning;
    no hash shuffle, no join, no Python on the data path."""
    plan = plan_of(spark, sf_dir, "q138_pii_redaction")
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("name", ["q136_sim_ivf_planted",
                                  "q137_sim_pq_planted"])
def test_ann_certificates_never_all_pairs(spark, sf_dir, name):
    """The planted-certificate twins must run the REAL approximate path
    (cell-probe join / ADC scan) — a cartesian or nested-loop fallback
    would certify nothing about the production plan."""
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_source_divergence_shares_tf_exchange(spark, sf_dir):
    """q141: the (source, token) count relation feeds all four consumers
    (token totals, source totals, the join, the final projection) off ONE
    materialized Exchange — the explicit tk repartition makes the shared
    boundary, and the post-execution AQE plan must show the reuse
    (without it Catalyst re-planned the corpus explode six times). All
    JVM-side with partial aggregation."""
    plan = plan_of(spark, sf_dir, "q141_source_divergence", execute=True)
    assert "ReusedExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial" in plan.lower()
    assert "CartesianProduct" not in plan


def test_repeated_spans_equi_join_no_python(spark, sf_dir):
    """q142: the span doc-frequency join is an equi-join on the span key,
    never cartesian; the whole pipeline is JVM expressions."""
    plan = plan_of(spark, sf_dir, "q142_repeated_spans")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_overlap_is_map_side(spark, sf_dir):
    """q144: chunking is sequence+explode+slice fused into the scan — the
    only exchange is the output sort's range partitioning, never a hash
    shuffle, and no Python anywhere."""
    plan = plan_of(spark, sf_dir, "q144_chunk_overlap")
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_span_dedup_no_cartesian_no_python(spark, sf_dir):
    """q145: span-keyed equi-joins + anti-join coverage — no cartesian,
    no nested loop, no Python on the cut path."""
    plan = plan_of(spark, sf_dir, "q145_span_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_span_dedup_hashed_key_single_span_exchange(spark, sf_dir):
    """q145's 100 TB form (VERDICT r3 #4): the span relation shuffles
    ONCE on an xxhash64-led (_h, _s) key — occurrence stats are hash
    aggregates with map-side partial combine (a boilerplate span
    collapses per map task; the r3 window form buffered a hot span's
    whole partition on one task), and the probe join reads the SAME
    exchange via ReusedExchange (post-execution AQE plan — the final
    section only, per the r3 double-print lesson)."""
    from etl_load_spark.queries import QUERIES
    df = QUERIES["q145_span_dedup"].fn(spark, sf_dir)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    # hashed key leads the one REPARTITION_BY_COL span exchange
    assert final.count("hashpartitioning(_h#") >= 1, final
    # the probe branch reuses it instead of re-running the corpus explode
    assert "ReusedExchange" in final, final
    # exactly ONE corpus window explode (sequence-of-positions Generate)
    assert final.count("Generate explode(sequence(0, greatest") == 1, final
    # first-occurrence min is a partial-combine hash aggregate
    assert "partial_min" in final and "partial_count" in final, final


def test_lm_surprisal_single_corpus_pass(spark, sf_dir):
    """q146: ONE corpus scan, ONE bigram explode, ONE token-level
    shuffle. The persisted (doc, bigram, count) relation is the shared
    boundary — without it Catalyst cloned the corpus explode once per
    consumer (pushed join predicates / per-branch pruning made the
    subtrees non-identical: measured 3 scans), and AQE exchange reuse
    cannot span the cache-build query execution. The doc reduction
    partial-aggregates map-side; no Python, no cartesian (the scalar V
    broadcast is the one BroadcastNestedLoopJoin, q141's shape)."""
    plan = plan_of(spark, sf_dir, "q146_lm_surprisal", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert len([l for l in final.splitlines()
                if "Generate explode" in l]) == 1
    assert len([l for l in final.splitlines()
                if "FileScan parquet" in l]) == 1
    assert "InMemoryTableScan" in final
    assert "partial" in final.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_cross_source_dedup_shared_exchange(spark, sf_dir):
    """q147: the (key, enc, source) relation shuffles ONCE on the content
    hash — survivor stats aggregate over the exchange and the survivor
    fetch reads the SAME exchange (ReusedExchange, post-execution final
    plan) as a sort-free shuffle-hash join. The survivor test is an
    inequality on purpose: an equality is absorbed as a second join key
    pair and re-keys the probe's distribution (see cross_source_dedup)."""
    df = QUERIES["q147_cross_source_dedup"].fn(spark, sf_dir)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert "ReusedExchange" in final, final
    assert "ShuffledHashJoin" in final, final
    assert "SortMergeJoin" not in final, final
    # one corpus pass: the planted union's two legs scan once each
    assert final.count("Scan parquet") == 2, final
    assert "CartesianProduct" not in final
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final


def test_token_budget_no_per_source_window(spark, sf_dir):
    """q148: the distributed prefix sum must never window the doc relation
    by source alone (an entire source in ONE task at 100 TB). The
    doc-level running sum windows over (source, bucket); only the
    bucket-stats relation (n_buckets rows per source) windows per source;
    bucket offsets come back via broadcast."""
    plan = plan_of(spark, sf_dir, "q148_token_budget")
    assert "BroadcastHashJoin" in plan, plan
    # every Window whose order key is the doc order hash (_ok) must
    # partition on the bucket column too
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln and "_ok" in ln:
            assert "_bkt" in ln.split("windowspecdefinition")[1], ln
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shard_manifest_single_combinable_agg(spark, sf_dir):
    """q149: shard assignment is a pure projection; the manifest is ONE
    two-phase hash aggregate (map-side partials) — no join, no window,
    nothing driver-side."""
    plan = plan_of(spark, sf_dir, "q149_shard_manifest")
    assert "partial_count" in plan and "partial_sum" in plan, plan
    assert "Join" not in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sequence_pack_shared_prefix_sum_exchange(spark, sf_dir):
    """q150: ONE corpus scan + ONE tokenized exchange feed both prefix-sum
    consumers (doc probe + bucket offsets — the explicit isnotnull(_bkt)
    keeps the subtrees identical, the q147/q148 recipe); every window
    ordered by the doc order key partitions on the bucket column (never
    the whole stream on one task); offsets come back via broadcast."""
    df = QUERIES["q150_sequence_pack"].fn(spark, sf_dir)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert final.count("Scan parquet") == 1, final
    assert "ReusedExchange" in final, final
    assert "BroadcastHashJoin" in final, final
    for ln in final.splitlines():
        if "windowspecdefinition" in ln and "_ok" in ln:
            assert "_bkt" in ln.split("windowspecdefinition")[1], ln
    assert "CartesianProduct" not in final
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final


def test_incremental_dedup_anti_join_after_partial_agg(spark, sf_dir):
    """q151: the history side contributes a distinct-key INDEX (hash
    aggregate, no text columns shipped past the scan) consumed by a LEFT
    ANTI join; the within-batch survivor is a partial-combining hash
    aggregate. No window, no cartesian, no Python."""
    plan = plan_of(spark, sf_dir, "q151_incremental_dedup")
    assert "LeftAnti" in plan, plan
    assert "partial_min" in plan and "partial_count" in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_quantize_zero_shuffle(spark, sf_dir):
    """q152: quantization is a PURE PROJECTION — one Arrow-batched kernel
    fused over the scan, NO hash exchange, no join, no window (the only
    exchange is the output sort's range partitioning). 100 TB of
    embeddings quantize in one map pass."""
    plan = plan_of(spark, sf_dir, "q152_embedding_quantize")
    assert "ArrowEvalPython" in plan, plan
    assert "hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_stratified_sample_bucketed_rank(spark, sf_dir):
    """q153: per-stratum rank via the bucketed prefix sum — ONE corpus
    scan feeds all three consumers (doc probe, offsets, minority size)
    through reused exchanges; doc-relation windows partition on
    (stratum, bucket), never stratum alone; thresholds broadcast back
    (the scalar minority size as the one BroadcastNestedLoopJoin —
    q141's scalar-broadcast shape)."""
    df = QUERIES["q153_stratified_sample"].fn(spark, sf_dir)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert final.count("Scan parquet") == 1, final
    assert "ReusedExchange" in final, final
    for ln in final.splitlines():
        if "windowspecdefinition" in ln and "_ok" in ln:
            assert "_bkt" in ln.split("windowspecdefinition")[1], ln
    assert "CartesianProduct" not in final
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final


def test_url_canonicalize_map_side_plus_one_agg(spark, sf_dir):
    """q154: canonicalization is pure map-side regex/array expressions;
    the only relational work is the domain aggregation (partial combine
    map-side). No join, no window, no Python."""
    plan = plan_of(spark, sf_dir, "q154_url_canonicalize")
    assert "partial_count" in plan, plan
    assert "Join" not in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_bloom_path_shape(spark, sf_dir):
    """history_bloom=True (the oversized-history shape): the batch
    aggregate is probed MAP-SIDE (one Arrow-batched bit test) and splits
    into a join-free definite-survivor branch and a possible-hit branch
    — exactly ONE LeftAnti in the plan, under a Union, with the batch
    shuffle shared between the branches (ReusedExchange). The full batch
    never shuffles against full history."""
    from pyspark.sql import functions as F
    from etl_load_spark.operators.dedup import incremental_dedup
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .select("doc_id", "text"))
    hist = d.filter(F.pmod("doc_id", F.lit(2)) == 0)
    batch = d.filter(F.pmod("doc_id", F.lit(2)) == 1)
    df = incremental_dedup(batch, hist, history_bloom=True)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert final.count("LeftAnti") == 1, final
    assert "Union" in final, final
    assert "ArrowEvalPython" in final, final   # the vectorized bloom probe
    assert "ReusedExchange" in final, final
    assert "BatchEvalPython" not in final, final


def test_importance_weights_single_corpus_pass(spark, sf_dir):
    """q155: ONE corpus scan + ONE cached (doc, bucket, count) relation
    shared by the raw histogram and the scoring probe (the q146 persist
    boundary — without it Catalyst clones the featurizer per consumer);
    the only FileScan in the final plan is the bounded TARGET slice; the
    per-doc reduction partial-aggregates map-side; scores broadcast; no
    Python anywhere (the scalar N_r/N_t broadcasts are the q141
    BroadcastNestedLoopJoin shape)."""
    plan = plan_of(spark, sf_dir, "q155_importance_weights", execute=True)
    final = plan.split("== Initial Plan ==")[0]
    assert len([l for l in final.splitlines()
                if "FileScan parquet" in l]) == 1, final
    assert "InMemoryTableScan" in final, final
    assert "partial" in final.lower(), final
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_hard_negatives_anchors_broadcast_arrow_kernel(spark, sf_dir):
    """q156: the anchor set broadcasts (the one deliberate
    BroadcastNestedLoopJoin — the cosine_topk brute-force contract);
    the positive max partial-aggregates map-side. VERDICT r6 #3 (the
    per-anchor window over a corpus-sized partition): Catalyst's
    InferWindowGroupLimit bounds it — a PARTIAL WindowGroupLimit below
    the exchange keeps k rows per (anchor, map-partition), so no task
    ever sorts a corpus-sized relation. An explicit q170-style
    two-phase pre-cut measured SLOWER (3.6 s vs 3.0 s at 8M vectors ×
    1 anchor — it only adds an exchange; SCALE.md). Pin the engine
    bound: a Partial WindowGroupLimit on the rank window.

    r13 (conscious pin update): scoring is the cosine_batch Arrow
    kernel — the interpreted fold was evaluated 4× per pair (2 consumer
    branches × the §4.4 isnotnull duplication); the nondeterministic
    kernel plans exactly once per branch. Pin: ArrowEvalPython present,
    at most one per consumer branch (2 total), row-at-a-time
    BatchEvalPython still banned."""
    plan = plan_of(spark, sf_dir, "q156_hard_negatives")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "partial_max" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan.split("WindowGroupLimit")[-1], plan
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") in (1, 2), plan
    assert "CartesianProduct" not in plan


def test_markup_strip_map_side_plus_one_agg(spark, sf_dir):
    """q157: markup stripping + boilerplate stats are pure map-side
    regex/array expressions; the only relational work is the per-source
    aggregation (partial combine map-side). No join, no window, no
    Python."""
    plan = plan_of(spark, sf_dir, "q157_markup_strip")
    assert "partial_count" in plan, plan
    assert "Join" not in plan, plan
    assert "windowspecdefinition" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_eval_leakage_corpus_never_shuffles(spark, sf_dir):
    """q158: the training corpus contributes matched shingles through a
    broadcast semi probe — every join over the corpus relation is a
    BroadcastHashJoin (no corpus-sized exchange for candidate
    generation); the per-eval aggregates run on eval-bounded relations.
    No Python, no cartesian."""
    plan = plan_of(spark, sf_dir, "q158_eval_leakage")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cdc_scd2_apply_windows_on_feed_not_dim(spark, sf_dir):
    """q159: both windows (effective-change lag filter, version-bounding
    lead) run on the FEED+seed relation; the dimension is touched by one
    semi and one anti key join only. No cartesian, no Python."""
    plan = plan_of(spark, sf_dir, "q159_cdc_scd2_apply")
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan
    assert "windowspecdefinition" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dense_ids_bucketed_prefix_sum(spark, sf_dir):
    """q164: surrogate assignment via the bucketed prefix sum — the
    data-relation window partitions on the bucket (never a global
    single-partition window over the table; the only unpartitioned
    window runs on the BOUNDED bucket-totals relation), offsets
    broadcast back. No Python."""
    df = QUERIES["q164_dense_ids"].fn(spark, sf_dir)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    for ln in final.splitlines():
        if "windowspecdefinition" in ln and "_ok" in ln:
            assert "_bkt" in ln.split("windowspecdefinition")[1], ln
    assert "BroadcastHashJoin" in final, final
    assert "CartesianProduct" not in final
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final


def test_priority_sample_take_ordered_not_global_sort(spark, sf_dir):
    """q169: the top-k must be TakeOrderedAndProject — never a global
    sort materializing the whole corpus order. Priorities are pure
    map-side projections; no join, no Python."""
    plan = plan_of(spark, sf_dir, "q169_priority_sample")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quota_sample_bounded_two_phase(spark, sf_dir):
    """q170: per-stratum top-k must run in the bounded two-phase shape —
    ONE corpus scan (pushed filters), the quota map BROADCAST onto it,
    phase-1 window partitioned on (stratum, bucket) — never stratum
    alone over the raw corpus — and only the _rn-filtered candidate
    relation reaches the per-stratum phase-2 window. No cartesian, no
    Python, priorities map-side."""
    df = QUERIES["q170_quota_sample"].fn(spark, sf_dir)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert final.count("FileScan parquet") == 1, final
    assert "BroadcastHashJoin" in final, final
    win_lines = [ln for ln in final.splitlines()
                 if "windowspecdefinition" in ln]
    assert len(win_lines) == 2, final
    # plan prints bottom-up intent top-down: first printed window is
    # phase 2 (_st only), second is phase 1 (_st, _bkt)
    p2, p1 = win_lines
    assert "_bkt" in p1.split("windowspecdefinition")[1], p1
    assert "_bkt" not in p2.split("windowspecdefinition")[1], p2
    assert "CartesianProduct" not in final
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final


def test_window_minhash_q27_shape_one_scan_shared_exchanges(spark, sf_dir):
    """q171: the q27 contract one granularity down — ONE corpus scan,
    shared exchanges (shingle relation feeds signatures AND verify sets;
    buckets feed both candidate sides) visible as ReusedExchange in the
    final AQE plan, candidates carry keys only, no cartesian, no
    Python."""
    df = QUERIES["q171_window_minhash"].fn(spark, sf_dir)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert final.count("FileScan parquet") == 1, final
    assert final.count("ReusedExchange") >= 3, final
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final


def test_containment_inverted_index_no_allpairs(spark, sf_dir):
    """q165: containment candidates come from the inverted shingle index
    (equi-joins only) — never all-pairs, never Python; small sides
    broadcast."""
    df = QUERIES["q165_containment_pairs"].fn(spark, sf_dir)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final
    assert final.count("ReusedExchange") >= 1, final


def test_trending_windows_on_bounded_count_relation(spark, sf_dir):
    """q166: the trend windows run on the aggregated (type, hour) count
    relation, never the raw event stream — one corpus scan, window
    partitions keyed by event_type, no join, no Python."""
    df = QUERIES["q166_trending_windows"].fn(spark, sf_dir)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert final.count("FileScan parquet") == 1, final
    assert "Join" not in final, final
    assert "partial_count" in final or "partial_sum" in final, final
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final


def test_last_touch_attribution_single_user_shuffle(spark, sf_dir):
    """q167: attribution is ONE user-keyed window over the event relation
    — a single window, no self-join back to events, no Python."""
    df = QUERIES["q167_last_touch_attribution"].fn(spark, sf_dir)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert final.count("FileScan parquet") == 1, final
    win_lines = [ln for ln in final.splitlines()
                 if "windowspecdefinition" in ln]
    assert len(win_lines) == 1, final
    assert "user_id" in win_lines[0], win_lines[0]
    assert "CartesianProduct" not in final
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final


def test_basket_lift_shared_exchange_broadcast_counts(spark, sf_dir):
    """q168: the pair self-join reuses one order-keyed exchange
    (ReusedExchange), per-part counts broadcast onto the filtered pair
    table, and the only nested-loop is the documented 1-row total-count
    scalar broadcast (the q141 shape)."""
    df = QUERIES["q168_basket_lift"].fn(spark, sf_dir)
    df.collect()
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
    assert final.count("ReusedExchange") >= 1, final
    assert final.count("BroadcastHashJoin") >= 2, final
    assert final.count("BroadcastNestedLoopJoin") <= 1, final
    assert "CartesianProduct" not in final
    assert "BatchEvalPython" not in final and "ArrowEvalPython" not in final


def test_hot_split_stage_plan_shape_through_build_plan(spark, sf_dir):
    """VERDICT r11 #5: the declarative hotSplit knob, exercised through
    build_plan exactly as a job would run it (not just the operator
    API) — the bucket-aligned slice must save one data exchange over
    the generic DIV slice on both carry stages, and stay on the plan
    floor (no cartesian, no Python, no BNLJ)."""
    import re
    from etl_load_spark.plans.builder import build_plan
    from etl_load_spark.spec import JobSpec

    def js(tr_type, hot):
        return JobSpec.from_dict({
            "jobId": f"hs-{tr_type.lower()}-{hot.replace(' ', '')}",
            "source": {"type": "PARQUET",
                       "details": {"path": f"{sf_dir}/events.parquet"}},
            "query": ("SELECT event_id, user_id, event_type, "
                      "CAST(ts AS TIMESTAMP_LTZ) AS ts, value FROM src"),
            "transformation": {"type": tr_type,
                               "parameters": {"carryIn": True,
                                              "hotSplit": hot}},
        })

    counts = {}
    for tr in ("STATE_DURATIONS", "HEARTBEAT_UPTIME"):
        for hot in ("1 day", "6 hours"):
            plan = (build_plan(spark, js(tr, hot))
                    ._jdf.queryExecution().executedPlan().toString())
            assert "CartesianProduct" not in plan, (tr, hot)
            assert "BroadcastNestedLoopJoin" not in plan, (tr, hot)
            assert "BatchEvalPython" not in plan, (tr, hot)
            counts[(tr, hot)] = len(
                re.findall(r"Exchange (hash|range)", plan))
    for tr in ("STATE_DURATIONS", "HEARTBEAT_UPTIME"):
        assert counts[(tr, "1 day")] == counts[(tr, "6 hours")] - 1, counts


def test_global_plan_sweep_all_queries(spark, sf_dir):
    """Global 100TB-posture sweep over EVERY declared query's static plan
    (the per-family pins above check the interesting shapes; this pins
    the floor for the whole surface, so a new query cannot quietly ship
    a cartesian product or row-at-a-time Python): no CartesianProduct
    anywhere, no BatchEvalPython anywhere, BroadcastNestedLoopJoin only
    on the documented bounded-side paths (scalar/threshold broadcasts,
    broadcast anchor sets, the one theta join), and Arrow/Pandas kernels
    only in the families built on them. Extending an allowlist is a
    conscious act with this test in the diff."""
    # BNLJ = the join's build side is BOUNDED by construction:
    #   scalar/threshold one-row aggregates: q73 q82 q141 q146 q153 q155
    #     q163 q172 (gapfill bounds row)
    #   broadcast anchor/query sets: q30 q114 q140 q156 q168
    #   non-equi theta join (banded by design): q09
    bnlj_ok = {
        "q09_join_range_theta", "q30_sim_topk", "q73_funnel",
        "q82_dormant_rich", "q114_tfidf_topk", "q140_cluster_balance",
        "q141_source_divergence", "q146_lm_surprisal",
        "q153_stratified_sample", "q155_importance_weights",
        "q156_hard_negatives", "q163_grouped_split", "q168_basket_lift",
        "q172_gapfill",
    }
    # Arrow-batched Python kernels (documented vectorized paths):
    #   similarity/ANN numpy kernels + SQ8 + bloom bits + multimodal codecs
    pandas_ok = {
        "q31_sim_topk_lsh", "q32_embedding_near_dup", "q37_multimodal_features",
        "q47_sim_topk_ivf", "q64_media_resize", "q100_audio_chunks",
        "q127_sim_topk_pq", "q131_sim_lsh_planted", "q133_semantic_dedup",
        "q136_sim_ivf_planted", "q137_sim_pq_planted",
        "q139_bloom_decontaminate", "q140_cluster_balance",  # anchor argmax
        "q152_embedding_quantize",
        "q156_hard_negatives",    # cosine_batch scoring kernel (r13)
        "q179_lttb_downsample",   # sequential per-series LTTB kernel
    }
    bad = []
    for name, q in QUERIES.items():
        df = q.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            bad.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            bad.append((name, "row-at-a-time BatchEvalPython"))
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            bad.append((name, "undeclared BroadcastNestedLoopJoin"))
        if name not in pandas_ok and any(
                m in plan for m in ("ArrowEvalPython", "MapInPandas",
                                    "FlatMapGroupsInPandas")):
            bad.append((name, "undeclared Python kernel"))
    assert not bad, bad


def _stage_sweep_specs(tmp_path):
    """One minimal VALID spec per declarative transformation stage —
    every dispatch path of plans/builder.apply_transformation (all
    _CORPUS_TRANSFORMS registry stages + the 6 spec-dispatched
    operators + both PYTHON_SCRIPT hooks + NONE; the completeness guard
    below derives the exact set from the dispatcher source, so a count
    here would only go stale), each through build_plan exactly as a
    job would run it."""
    import json as _json
    import textwrap

    from etl_load_spark.spec import JobSpec

    docs = tmp_path / "sweep_docs.json"
    t16 = lambda tag: " ".join(f"{tag}{i}" for i in range(16))  # noqa: E731
    docs.write_text("\n".join(_json.dumps(r) for r in [
        {"doc_id": 1, "source": "web", "text": t16("a") + " " + t16("b"),
         "url": "https://www.example.com/a?utm_source=x"},
        {"doc_id": 2, "source": "web", "text": t16("a"),
         "url": "http://site.org/p/"},
        {"doc_id": 3, "source": "books", "text": "the " + t16("b"),
         "url": "https://example.com/b"},
        {"doc_id": 4, "source": "web", "text": "tiny text here now ok",
         "url": "https://example.com/c"},
    ]))
    vecs = tmp_path / "sweep_vecs.json"
    vecs.write_text("\n".join(_json.dumps(
        {"vec_id": i, "label": i % 2,
         "embedding": [1.0, float(i) / 10, 0.25 * (i % 4)]})
        for i in range(12)))
    vschema = "vec_id bigint, label int, embedding array<float>"
    aux = tmp_path / "sweep_aux.json"          # eval / history / target
    aux.write_text(_json.dumps({"doc_id": 100, "text": t16("a")}))
    dim = tmp_path / "sweep_dim.json"
    dim.write_text(_json.dumps(
        {"k": 1, "attr": "A", "valid_from": "2020-01-01",
         "valid_to": None, "is_current": True}))
    dschema = ("k bigint, attr string, valid_from date, valid_to date,"
               " is_current boolean")
    cdc_dim = tmp_path / "sweep_cdc_dim.json"   # CDC validity = seq coords
    cdc_dim.write_text(_json.dumps(
        {"k": 1, "attr": "A", "valid_from": 0,
         "valid_to": None, "is_current": True}))
    cdc_dschema = ("k bigint, attr string, valid_from bigint,"
                   " valid_to bigint, is_current boolean")
    feed = tmp_path / "sweep_feed.json"
    feed.write_text(_json.dumps(
        {"k": 1, "attr": "B", "seq": 10, "op": "U"}))
    ts_feed = tmp_path / "sweep_ts.json"
    ts_feed.write_text("\n".join(_json.dumps(r) for r in [
        {"event_id": 1, "user_id": 1,
         "ts": "2024-01-01T06:00:00", "value": 10.0},
        {"event_id": 2, "user_id": 1,
         "ts": "2024-01-03T06:00:00", "value": 30.0},
        {"event_id": 3, "user_id": 2,
         "ts": "2024-01-02T00:00:00", "value": 5.0},
    ]))
    ts_schema = "event_id bigint, user_id bigint, ts timestamp, value double"
    asof_right = tmp_path / "sweep_asof_right.json"
    asof_right.write_text("\n".join(_json.dumps(r) for r in [
        {"user_id": 1, "rts": "2024-01-01T00:00:00", "segment": "A"},
        {"user_id": 2, "rts": "2024-01-01T12:00:00", "segment": "B"},
    ]))
    df_script = tmp_path / "sweep_df_hook.py"
    df_script.write_text(textwrap.dedent("""
        from pyspark.sql import functions as F
        def transform(df, spark, params):
            return df.withColumn("text", F.upper("text"))
    """))
    pd_script = tmp_path / "sweep_pd_hook.py"
    pd_script.write_text(textwrap.dedent("""
        def transform_pandas(pdf, params):
            pdf["text"] = pdf["text"].str.upper()
            return pdf
    """))

    def js(tr_type, params, src=docs, schema=None, extra=None,
           script=None):
        d = {"path": str(src)}
        if schema:
            d["schema"] = schema
        tr = {"type": tr_type, "parameters": params}
        if script:
            tr["scriptPath"] = str(script)
        spec = {"jobId": f"sweep-{tr_type.lower()}",
                "source": {"type": "FILE_JSON", "details": d},
                "transformation": tr}
        if extra:
            spec["extraSources"] = {
                name: {"type": "FILE_JSON", "details": dd}
                for name, dd in extra.items()}
        return JobSpec.from_dict(spec)

    return {
        "PASSAGE_DEDUP": js("PASSAGE_DEDUP", {"blockTokens": 16}),
        "QUALITY_FILTER": js("QUALITY_FILTER",
                             {"minWords": 2, "minStopwords": 0}),
        "MIXTURE_SAMPLE": js("MIXTURE_SAMPLE",
                             {"weights": {"web": 1.0, "books": 0.5}}),
        "QUALITY_CLASSIFIER": js("QUALITY_CLASSIFIER",
                                 {"mode": "annotate"}),
        "SEMANTIC_DEDUP": js("SEMANTIC_DEDUP",
                             {"threshold": 0.95, "nCells": 2},
                             src=vecs, schema=vschema),
        "CLUSTER_BALANCE": js("CLUSTER_BALANCE", {},
                              src=vecs, schema=vschema),
        "CHUNK_DOCUMENTS": js("CHUNK_DOCUMENTS",
                              {"chunkTokens": 8, "overlap": 2}),
        "LM_SURPRISAL": js("LM_SURPRISAL", {"mode": "annotate"}),
        "CROSS_SOURCE_DEDUP": js("CROSS_SOURCE_DEDUP",
                                 {"priority": ["books", "web"]}),
        "TOKEN_BUDGET": js("TOKEN_BUDGET",
                           {"budgets": {"web": 10, "books": 10}}),
        "ASSIGN_SHARDS": js("ASSIGN_SHARDS", {"nShards": 4}),
        "SEQUENCE_PACK": js("SEQUENCE_PACK", {"seqLen": 8}),
        "QUANTIZE_EMBEDDINGS": js("QUANTIZE_EMBEDDINGS", {},
                                  src=vecs, schema=vschema),
        "STRATIFIED_SAMPLE": js("STRATIFIED_SAMPLE",
                                {"stratumColumn": "source"}),
        "URL_CANONICALIZE": js("URL_CANONICALIZE", {"urlColumn": "url"}),
        "MARKUP_STRIP": js("MARKUP_STRIP", {}),
        "ASSIGN_SPLIT": js("ASSIGN_SPLIT", {"groupColumn": "source"}),
        "PRIORITY_SAMPLE": js("PRIORITY_SAMPLE",
                              {"size": 2, "weightColumn": "doc_id"}),
        "QUOTA_SAMPLE": js("QUOTA_SAMPLE",
                           {"quotas": {"web": 2, "books": 1},
                            "stratumColumn": "source"}),
        "WINDOW_MINHASH_DEDUP": js("WINDOW_MINHASH_DEDUP",
                                   {"windowTokens": 8, "stride": 4}),
        "GAPFILL": js("GAPFILL", {"bucket": "1 day"},
                      src=ts_feed, schema=ts_schema),
        "COUNTER_RATE": js("COUNTER_RATE", {"orderColumn": "user_id"},
                           src=ts_feed, schema=ts_schema),
        "OHLC": js("OHLC", {"typeColumn": "user_id",
                            "orderColumn": "user_id"},
                   src=ts_feed, schema=ts_schema),
        "TIME_WEIGHTED_AVG": js("TIME_WEIGHTED_AVG",
                                {"orderColumn": "user_id",
                                 "carryIn": True},
                                src=ts_feed, schema=ts_schema),
        "STATE_DURATIONS": js("STATE_DURATIONS",
                              {"stateColumn": "user_id",
                               "orderColumn": "user_id"},
                              src=ts_feed, schema=ts_schema),
        "HEARTBEAT_UPTIME": js("HEARTBEAT_UPTIME",
                               {"orderColumn": "user_id",
                                "tolerance": "1 hour"},
                               src=ts_feed, schema=ts_schema),
        "LTTB": js("LTTB", {"resolution": 3},
                   src=ts_feed, schema=ts_schema),
        "TREND": js("TREND", {"bucket": "1 day"},
                    src=ts_feed, schema=ts_schema),
        "INSTANT_RATE": js("INSTANT_RATE", {"orderColumn": "user_id"},
                           src=ts_feed, schema=ts_schema),
        "VALUE_HISTOGRAM": js("VALUE_HISTOGRAM",
                              {"lo": 0.0, "hi": 50.0, "nbins": 5},
                              src=ts_feed, schema=ts_schema),
        "ASOF_JOIN": js("ASOF_JOIN", {"rightTsColumn": "rts"},
                        src=ts_feed, schema=ts_schema,
                        extra={"right": {
                            "path": str(asof_right),
                            "schema": ("user_id bigint, rts timestamp,"
                                       " segment string")}}),
        "DELTA": js("DELTA", {"orderColumn": "user_id"},
                    src=ts_feed, schema=ts_schema),
        "VALUE_STATS": js("VALUE_STATS", {"bucket": "1 day"},
                          src=ts_feed, schema=ts_schema),
        "CHANGES": js("CHANGES", {"orderColumn": "user_id"},
                      src=ts_feed, schema=ts_schema),
        "VALUE_TOPK": js("VALUE_TOPK", {"k": 2},
                         src=ts_feed, schema=ts_schema),
        "SCD2_MERGE": js("SCD2_MERGE",
                         {"keyColumns": ["k"], "attrColumns": ["attr"],
                          "effectiveDate": "2021-06-01"},
                         src=feed,
                         extra={"dim": {"path": str(dim),
                                        "schema": dschema}}),
        "CDC_SCD2_APPLY": js("CDC_SCD2_APPLY",
                             {"keyColumns": ["k"], "attrColumns": ["attr"],
                              "seqColumn": "seq"},
                             src=feed,
                             extra={"dim": {"path": str(cdc_dim),
                                            "schema": cdc_dschema}}),
        "DECONTAMINATE": js("DECONTAMINATE", {"ngram": 8},
                            extra={"eval": {"path": str(aux)}}),
        "INCREMENTAL_DEDUP": js("INCREMENTAL_DEDUP", {},
                                extra={"history": {"path": str(aux)}}),
        "IMPORTANCE_RESAMPLE": js("IMPORTANCE_RESAMPLE",
                                  {"keepQuantile": 0.5},
                                  extra={"target": {"path": str(aux)}}),
        "HARD_NEGATIVES": js("HARD_NEGATIVES",
                             {"anchorPredicate": "vec_id < 2", "k": 2},
                             src=vecs, schema=vschema),
        "PYTHON_SCRIPT:df": js("PYTHON_SCRIPT", {}, script=df_script),
        "PYTHON_SCRIPT:pandas": js("PYTHON_SCRIPT", {}, script=pd_script),
        "NONE": js("NONE", {}),
    }


def test_global_plan_sweep_all_stages(spark, tmp_path):
    """VERDICT r7 #3: the all-queries sweep above pins the plan floor for
    the declared query surface, but the declarative stages reach the
    same operators through build_plan — a future stage (or a stage-only
    parameter path) could still ship a degenerate plan unswept. Build
    every stage's minimal spec through build_plan and apply the same
    four assertions: no CartesianProduct, no row-at-a-time
    BatchEvalPython, BroadcastNestedLoopJoin only on documented
    bounded-build-side stages, Arrow/Pandas kernels only in the stages
    built on them. Extending an allowlist is a conscious act with this
    test in the diff."""
    from etl_load_spark.plans.builder import build_plan

    # BNLJ = bounded build side by construction, each the declarative twin
    # of a query already on the all-queries-sweep allowlist:
    #   CLUSTER_BALANCE→q140, LM_SURPRISAL→q146, STRATIFIED_SAMPLE→q153,
    #   IMPORTANCE_RESAMPLE→q155, HARD_NEGATIVES→q156 (scalar/threshold
    #   one-row aggregates or broadcast anchor sets), GAPFILL→q172
    #   (1-row bounds aggregate)
    bnlj_ok = {"CLUSTER_BALANCE", "LM_SURPRISAL", "STRATIFIED_SAMPLE",
               "IMPORTANCE_RESAMPLE", "HARD_NEGATIVES", "GAPFILL"}
    # Arrow-batched kernels (documented vectorized paths):
    #   SEMANTIC_DEDUP→q133 gram kernel, QUANTIZE_EMBEDDINGS→q152 SQ8,
    #   DECONTAMINATE→q139 bloom bits, PYTHON_SCRIPT:pandas = the Arrow
    #   hook itself (mapInPandas by design)
    #   LTTB = the sequential per-series selection kernel (q179)
    pandas_ok = {"SEMANTIC_DEDUP", "QUANTIZE_EMBEDDINGS", "DECONTAMINATE",
                 "PYTHON_SCRIPT:pandas", "LTTB",
                 "CLUSTER_BALANCE",   # anchor argmax kernel (r13)
                 "HARD_NEGATIVES"}    # cosine_batch scoring kernel (r13)
    specs = _stage_sweep_specs(tmp_path)
    # completeness: every registry stage AND every spec-dispatched
    # branch of apply_transformation. Discovery is STRUCTURAL (ADVICE
    # r8): walk the AST for comparisons whose left side is tr.type /
    # tr.type.upper() — ==/!= against a string literal registers the
    # branch, membership in the two registries is swept via
    # _CORPUS_TRANSFORMS below, and ANY other comparison shape
    # (`in ("X",)`, a tuple/set literal, a variable, an aliased
    # `t = tr.type.upper()`) fails the guard outright instead of
    # silently escaping the sweep.
    import ast
    import inspect
    import textwrap
    from etl_load_spark.plans import builder as _b

    def _is_trtype(node):
        if (isinstance(node, ast.Call) and not node.args
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "upper"):
            node = node.func.value
        return (isinstance(node, ast.Attribute) and node.attr == "type"
                and isinstance(node.value, ast.Name)
                and node.value.id == "tr")

    tree = ast.parse(textwrap.dedent(
        inspect.getsource(_b.apply_transformation)))
    dispatched, undiscoverable = set(), []
    for node in ast.walk(tree):
        if isinstance(node, ast.Compare) and _is_trtype(node.left):
            for op, cmp_ in zip(node.ops, node.comparators):
                if (isinstance(op, (ast.Eq, ast.NotEq))
                        and isinstance(cmp_, ast.Constant)
                        and isinstance(cmp_.value, str)):
                    dispatched.add(cmp_.value.upper())
                elif (isinstance(op, (ast.In, ast.NotIn))
                      and isinstance(cmp_, ast.Name)
                      and cmp_.id in ("_CORPUS_TRANSFORMS",
                                      "_BATCH_ONLY_TRANSFORMS",
                                      "_STREAMING_TWINS")):
                    pass    # registry membership — swept structurally
                else:
                    undiscoverable.append(ast.unparse(node))
        if (isinstance(node, (ast.Assign, ast.AnnAssign, ast.NamedExpr))
                and _is_trtype(getattr(node, "value", None))):
            undiscoverable.append(ast.unparse(node))
    assert not undiscoverable, (
        "apply_transformation compares tr.type in a shape this sweep's "
        f"discovery can't register: {undiscoverable} — rewrite as "
        'tr.type.upper() == "X" or registry membership so the stage '
        "sweep sees the branch")
    missing = ((set(_b._CORPUS_TRANSFORMS) | dispatched)
               - {k.split(":")[0] for k in specs})
    assert not missing, f"stage sweep lacks specs for: {sorted(missing)}"
    bad = []
    for name, spec in specs.items():
        plan = (build_plan(spark, spec)._jdf.queryExecution()
                .executedPlan().toString())
        if "CartesianProduct" in plan:
            bad.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            bad.append((name, "row-at-a-time BatchEvalPython"))
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            bad.append((name, "undeclared BroadcastNestedLoopJoin"))
        if name not in pandas_ok and any(
                m in plan for m in ("ArrowEvalPython", "MapInPandas",
                                    "FlatMapGroupsInPandas")):
            bad.append((name, "undeclared Python kernel"))
    assert not bad, bad
