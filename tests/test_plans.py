"""Plan-shape assertions: the 100 TB efficiency contract, pinned in CI.

These tests fail if a future change un-pushes a filter, un-broadcasts a
dimension join, globally sorts a top-k, or adds a shuffle — the plan
regressions that are invisible at sf0.001 and catastrophic at 100 TB.

AQE is disabled for plan inspection (it hides join strategies behind
AdaptiveSparkPlan before execution); production keeps it ON.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kstreams_spark import registry
from kstreams_spark.plans.inspect import (
    count_exchanges,
    explain_str,
    join_strategies,
    physical_plan,
    pushed_filters,
    read_schemas,
)

registry.load_all()


@pytest.fixture(scope="module")
def plan_spark(spark):
    """Session with AQE off so physical join strategies are visible."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def q(name, plan_spark, sf_dir):
    return registry.QUERIES[name](plan_spark, sf_dir)


def test_projection_prunes_columns(plan_spark, sf_dir):
    schemas = read_schemas(q("scan_project", plan_spark, sf_dir))
    assert schemas, "no file scan found"
    # 3 of 6 event columns read; ts/user_id/props never leave the reader
    assert "event_id" in schemas[0] and "props" not in schemas[0]


def test_filters_are_pushed_down(plan_spark, sf_dir):
    pushed = pushed_filters(q("filter_predicate", plan_spark, sf_dir))
    text = " ".join(pushed)
    assert "l_quantity" in text and "l_returnflag" in text


def test_dimension_joins_broadcast(plan_spark, sf_dir):
    strategies = join_strategies(
        q("join_orders_revenue_by_nation", plan_spark, sf_dir)
    )
    assert strategies and all(s == "BroadcastHashJoin" for s in strategies), (
        f"dimension joins must broadcast, got {strategies}"
    )


def test_range_join_is_broadcast_nested_loop(plan_spark, sf_dir):
    strategies = join_strategies(q("join_range_price_bands", plan_spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in strategies


def test_topk_avoids_global_sort(plan_spark, sf_dir):
    plan = physical_plan(q("sort_limit_topk", plan_spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_agg_is_partial_then_final(plan_spark, sf_dir):
    plan = physical_plan(q("agg_pricing_summary", plan_spark, sf_dir))
    # two HashAggregate nodes (partial + final) around exactly one shuffle
    assert plan.count("HashAggregate") >= 2
    assert count_exchanges(q("agg_pricing_summary", plan_spark, sf_dir)) == 1


def test_narrow_pipeline_has_no_shuffle(plan_spark, sf_dir):
    """The flagship sensor pipeline is scan→project→filter — any Exchange
    here would be a bug."""
    assert count_exchanges(q("sensor_alert_pipeline", plan_spark, sf_dir)) == 0


def test_whole_stage_codegen_covers_flagship(plan_spark, sf_dir):
    text = explain_str(q("sensor_alert_pipeline", plan_spark, sf_dir), "formatted")
    # Spark 4 formatted mode marks codegen'd operators with "[codegen id: N]"
    # (the simple mode shows them as "*"-prefixed)
    assert "codegen id" in text


def test_asof_join_is_single_shuffle(plan_spark, sf_dir):
    """The union+window as-of formulation must cost ONE shuffle (the
    partitionBy) — not a join explosion."""
    n = count_exchanges(q("join_asof_latest_order", plan_spark, sf_dir))
    assert n == 1, f"as-of join should shuffle once, got {n}"


def test_semi_join_prunes_right_columns(plan_spark, sf_dir):
    schemas = read_schemas(q("join_semi_customers_with_orders", plan_spark, sf_dir))
    orders_scan = [s for s in schemas if "o_custkey" in s]
    assert orders_scan and all("o_totalprice" not in s for s in orders_scan)


def test_sort_within_partitions_no_exchange(plan_spark, sf_dir):
    """sortWithinPartitions = partition-local sort, no shuffle — the
    cheap pre-sort for downstream merge-consumers."""
    from kstreams_spark.io import load_table

    li = load_table(plan_spark, sf_dir, "lineitem").sortWithinPartitions(
        "l_shipdate"
    )
    assert count_exchanges(li) == 0
    assert "Sort" in physical_plan(li)


def test_partition_pruning(plan_spark, sf_dir, tmp_path):
    """A lake partitioned by a filter column scans only matching
    partitions (PartitionFilters in the scan node) — the first line of
    defense at 100 TB: IO never happens for pruned partitions."""
    from kstreams_spark.io import load_table

    out = str(tmp_path / "events_by_type")
    ev = load_table(plan_spark, sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    pruned = plan_spark.read.parquet(out).filter(F.col("event_type") == "error")
    text = explain_str(pruned, "formatted")
    assert "PartitionFilters" in text and "event_type" in text
    n_err = pruned.count()
    assert n_err == ev.filter(F.col("event_type") == "error").count()


def test_avro_roundtrip_has_no_shuffle(plan_spark, sf_dir):
    """encode→decode is per-row Arrow-batched work: scan → eval(encode) →
    eval(decode) → project. Any Exchange here would mean the codec path
    stopped being a narrow pipeline."""
    assert count_exchanges(q("avro_roundtrip", plan_spark, sf_dir)) == 0


def test_near_pairs_verify_joins_broadcast(plan_spark, sf_dir):
    """similarity_near_pairs: the exact-cosine verify must look up the
    embedding arrays via broadcast joins (the corpus vector table is
    id→array, tiny next to the pair stream); the only shuffle joins
    allowed are the (table, sig) bucket equi-join sides."""
    strategies = join_strategies(q("similarity_near_pairs", plan_spark, sf_dir))
    assert strategies.count("BroadcastHashJoin") >= 2, strategies


def test_minhash_verified_no_cartesian(plan_spark, sf_dir):
    """The propose→verify pipeline must never plan a cartesian product —
    every join is keyed (band equi-join, shingle equi-join, size lookups)."""
    plan = physical_plan(q("dedup_minhash_verified", plan_spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_curation_pipeline_two_shuffles(plan_spark, sf_dir):
    """The end-to-end curation composite promises exactly two shuffles
    (dedup groupBy + final stats agg) — score, filter, and split
    assignment must all stay scan-speed row expressions."""
    n = count_exchanges(q("composite_curation_pipeline", plan_spark, sf_dir))
    assert n == 2, f"curation pipeline should shuffle twice, got {n}"


def test_ivf_assignment_avoids_corpus_window(plan_spark, sf_dir):
    """ivf_topk's corpus cell assignment must be the partial-aggregating
    groupBy(vec_id) max_by shape (kmeans_assign's), never a Window
    row_number over the N×k scored rows — a full sort-per-key shuffle of
    the scored corpus vs a map-side-combining aggregation. The only
    windows allowed partition on qid (probe ranking over Q×k rows, final
    top-k)."""
    for name in ("similarity_topk_ivf", "similarity_topk_ivf_probe"):
        plan = physical_plan(q(name, plan_spark, sf_dir))
        assert "max_by" in plan, f"{name}: assignment must be max_by agg"
        assert "windowspecdefinition(vec_id" not in plan, (
            f"{name}: window over the N×k scored corpus"
        )


def test_curation_neardup_no_cartesian(plan_spark, sf_dir):
    """The near-dup curation composite chains the propose→verify pipeline
    and the survivor anti-join — no stage may plan a cartesian product.
    (The CC loop materializes via checkpoint before this plan, so the
    final plan covers kept → pairs-pipeline → anti-join → agg.)"""
    plan = physical_plan(q("composite_curation_neardup", plan_spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_classifier_model_join_broadcasts(plan_spark, sf_dir):
    """text_quality_classifier: the (bucket, weight) model must ride a
    BroadcastHashJoin — the token stream never shuffles to meet the
    model; the only Exchange is the per-doc margin agg."""
    df = q("text_quality_classifier", plan_spark, sf_dir)
    strategies = join_strategies(df)
    assert strategies and all(s == "BroadcastHashJoin" for s in strategies), (
        strategies
    )


def test_substring_spans_no_cartesian_and_partial_agg(plan_spark, sf_dir):
    """dedup_substring_spans: duplicated-window detection is the
    SHARED-EXCHANGE window form (r15): occ and the winner election run
    as COUNT/MIN OVER (PARTITION BY sh) so the positional-md5 shingle
    stream — the expensive per-row compute — is evaluated exactly ONCE
    and shuffled on sh exactly once. The pre-r15 groupBy(sh)+join-back
    evaluated the stream twice (once per plan branch) and, past
    broadcast scale, degrades to the same sh exchange anyway for the
    join. Never a cartesian; never a second evaluation of the shingle
    transform."""
    plan = physical_plan(q("dedup_substring_spans", plan_spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "windowspecdefinition(sh" in plan, (
        "duplicate detection lost the shared-exchange window form"
    )
    # the shingle transform (slice + concat_ws under md5) must appear
    # exactly once — a second occurrence means a plan branch re-derives
    # the positional stream
    assert plan.count("concat_ws") == 1, plan


def test_sq8_scan_joins_are_broadcast(plan_spark, sf_dir):
    """similarity_topk_sq8: quantizer params and the query codes must
    broadcast — the candidate scan is one pass, the only Exchange is the
    top-k window."""
    df = q("similarity_topk_sq8", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    # all BNLJs are broadcast one-row params / tiny query-codes joins:
    # corpus×params, queries×params, prezip×params, candidates×queries
    assert plan.count("BroadcastNestedLoopJoin") <= 4, plan
    assert count_exchanges(df) <= 2, physical_plan(df)


def test_sequence_pack_single_shuffle(plan_spark, sf_dir):
    """sample_sequence_pack: one partitioned window (the per-shard
    offsets) is the ONLY shuffle — the span explode is scan-shaped."""
    n = count_exchanges(q("sample_sequence_pack", plan_spark, sf_dir))
    assert n == 1, n


def test_chunk_windows_zero_shuffle(plan_spark, sf_dir):
    """text_chunk_windows is explode-only: no Exchange at all."""
    n = count_exchanges(q("text_chunk_windows", plan_spark, sf_dir))
    assert n == 0, n


def test_gopher_rules_zero_shuffle(plan_spark, sf_dir):
    """text_gopher_rules is one scan-shaped projection: no Exchange."""
    n = count_exchanges(q("text_gopher_rules", plan_spark, sf_dir))
    assert n == 0, n


def test_curated_lake_prunes_split_and_lang(plan_spark, sf_dir, tmp_path):
    """The published curated layout must partition-prune: a
    (split='train', lang='en') read lists only that directory."""
    from kstreams_spark.io import load_table, write_curated_lake
    from kstreams_spark.operators.sampling import _bucket_from

    d = load_table(plan_spark, sf_dir, "documents")
    bucket = _bucket_from(F.col("doc_id").cast("string"))
    curated = d.select(
        "doc_id",
        "text",
        "lang",
        F.when(bucket < 204, "train")
        .when(bucket < 230, "validation")
        .otherwise("test")
        .alias("split"),
    )
    path = str(tmp_path / "lake")
    write_curated_lake(curated, path)
    df = plan_spark.read.parquet(path).filter(
        (F.col("split") == "train") & (F.col("lang") == "en")
    )
    text = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in text and "split" in text and "lang" in text
    assert df.count() > 0
    # partition values survive the string round-trip (letter-prefix rule
    # does not apply here: 'train'/'en' are non-numeric)
    assert {(r.split, r.lang) for r in df.select("split", "lang").collect()} == {
        ("train", "en")
    }


def test_runtime_bloom_filter_joins_under_scale_confs(plan_spark, sf_dir):
    """At 100 TB Spark injects a runtime BLOOM FILTER on the fact side of
    a selective fact⋈dim sort-merge join (bloom_filter_agg on the
    filtered dim → might_contain pushed into the fact scan) — rows that
    can't match never reach the shuffle. It stays off at fixture size
    only because of the application-side SCAN SIZE threshold (default
    10 GB); this test pins the capability by dropping that threshold to
    0 and forcing SMJ, i.e. exactly the conditions a real lake meets
    with DEFAULT confs."""
    from kstreams_spark.io import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: plan_spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            plan_spark.conf.set(k, v)
        o = load_table(plan_spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(plan_spark, sf_dir, "lineitem")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = physical_plan(j)
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                plan_spark.conf.unset(k)
            else:
                plan_spark.conf.set(k, v)


def test_search_topk_is_take_ordered(plan_spark, sf_dir):
    """search_topk_keywords: the term IN-filter must reach the scan side
    (applied before the first shuffle), the idf join must broadcast, and
    the final LIMIT must be TakeOrderedAndProject — never a global sort."""
    df = q("search_topk_keywords", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    strategies = join_strategies(df)
    assert strategies and all(s == "BroadcastHashJoin" for s in strategies), (
        strategies
    )


def test_boilerplate_rewrite_no_cartesian(plan_spark, sf_dir):
    """text_boilerplate_rewrite: paragraph-hash frequency join + the
    reassembly — hash equi-joins only, no cartesian anywhere."""
    plan = physical_plan(q("text_boilerplate_rewrite", plan_spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_importance_weights_join_broadcasts(plan_spark, sf_dir):
    """sample_importance_hashed: every visible join broadcasts — the
    only joins in the final plan are the 1-row totals cross joins
    (corpus-independent BNLJs). r15: the bucket counts and per-doc
    scores are lineage-cut (each fed two plan branches), so the weights
    equi-join — still F.broadcast-hinted in source — now lives inside
    the checkpointed subplan; the visible plan must read the checkpoint
    RDDs, never re-derive the explode."""
    df = q("sample_importance_hashed", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "ExistingRDD" in plan, plan
    strategies = join_strategies(df)
    # the only visible joins are the 1-row totals cross joins
    assert all(s == "BroadcastNestedLoopJoin" for s in strategies), strategies
    assert strategies.count("BroadcastNestedLoopJoin") <= 2, strategies


def test_ivf_pq_scan_joins_broadcast(plan_spark, sf_dir):
    """similarity_topk_ivf_pq: the probe list and the ADC LUT must both
    broadcast onto the cell-keyed candidate side — the code table is
    never reshuffled to meet them."""
    df = q("similarity_topk_ivf_pq", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    strategies = join_strategies(df)
    # hash joins (probe list, LUT, codes) all broadcast; the two BNLJs
    # are ivf_assign's tiny centroid-table crosses (same as sq8's plan)
    assert strategies and all(
        s in ("BroadcastHashJoin", "BroadcastNestedLoopJoin")
        for s in strategies
    ), strategies
    assert strategies.count("BroadcastNestedLoopJoin") <= 2, strategies
    assert "BroadcastHashJoin" in strategies, strategies


def test_bq_rerank_scan_joins_broadcast(plan_spark, sf_dir):
    """similarity_topk_bq_rerank: the query codes broadcast onto the
    Hamming scan (the only BNLJ — queries are a 10-row side) and the
    re-rank's vector lookups are broadcast/equi joins; never a cartesian
    or a shuffled nested loop."""
    df = q("similarity_topk_bq_rerank", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    strategies = join_strategies(df)
    assert strategies and all(
        s in ("BroadcastHashJoin", "BroadcastNestedLoopJoin")
        for s in strategies
    ), strategies


def test_zordered_write_is_one_range_exchange(plan_spark, sf_dir):
    """write_zordered's plan: exactly the bounds aggregate's tiny
    exchange pair plus ONE rangepartitioning exchange for the z-sort —
    the same write cost as any sorted publish."""
    from kstreams_spark.operators.layout import with_zvalue

    li = registry.QUERIES  # noqa: F841  (registry warm — q() idiom)
    src = (
        plan_spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
    )
    df = (
        with_zvalue(src, "l_orderkey", "l_partkey")
        .repartitionByRange(8, "z")
        .sortWithinPartitions("z")
    )
    plan = physical_plan(df)
    assert "rangepartitioning" in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan
    # the only nested-loop join is the broadcast 1-row bounds attach
    strategies = join_strategies(df)
    assert all(s == "BroadcastNestedLoopJoin" for s in strategies), strategies


def test_hybrid_rrf_no_cartesian_and_lex_broadcasts(plan_spark, sf_dir):
    """search_hybrid_rrf: the lexical leg's query-token and df tables
    broadcast onto the posting scan; the vector leg's queries broadcast
    onto the candidate scan; the fusion joins two tiny ranked lists —
    no cartesian, no shuffled nested loop."""
    df = q("search_hybrid_rrf", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    strategies = join_strategies(df)
    assert "BroadcastHashJoin" in strategies, strategies


def test_sessionize_single_user_exchange(plan_spark, sf_dir):
    """events_sessionize: the lag window, the running sum, and the final
    per-(user, session) aggregation must all reuse ONE hashpartitioning
    exchange on user_id — same-prefix keys, no second shuffle."""
    df = q("events_sessionize", plan_spark, sf_dir)
    plan = physical_plan(df)
    n_exchanges = count_exchanges(df)
    assert n_exchanges == 1, f"{n_exchanges} exchanges:\n{plan}"


def test_countmin_probe_joins_broadcast(plan_spark, sf_dir):
    """sketch_countmin_tokens: the 64-cell sketch and the 4-row hash-row
    spine broadcast onto the probe side — the sketch is never shuffled."""
    df = q("sketch_countmin_tokens", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    strategies = join_strategies(df)
    assert "BroadcastHashJoin" in strategies, strategies
    assert all(
        s in ("BroadcastHashJoin", "BroadcastNestedLoopJoin")
        for s in strategies
    ), strategies


def test_timeseries_rollups_single_exchange(plan_spark, sf_dir):
    """events_time_weighted_avg / events_ohlc_daily: the hold/rank
    windows and the final aggregation share the (event_type, day) key —
    one exchange each."""
    for name in ("events_time_weighted_avg", "events_ohlc_daily"):
        df = q(name, plan_spark, sf_dir)
        n = count_exchanges(df)
        assert n == 1, f"{name}: {n} exchanges\n{physical_plan(df)}"


def test_fuzzy_match_blocks_instead_of_cartesian(plan_spark, sf_dir):
    """join_fuzzy_match_names: the deletion-neighborhood rewrite must be
    hash equi-joins on variant hashes — the naive probes×customers
    cartesian (the oracle's form) must NOT appear in the plan."""
    df = q("join_fuzzy_match_names", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    strategies = join_strategies(df)
    assert strategies, "expected hash joins in the blocking plan"


def test_triangle_walk_is_hash_joins(plan_spark, sf_dir):
    """dedup_triangle_count: the a→b→c walk + closing edge are doc-id
    equi-joins over the sparse verified graph — never a cartesian."""
    plan = physical_plan(q("dedup_triangle_count", plan_spark, sf_dir))
    assert "CartesianProduct" not in plan, plan


def test_rarity_rank_has_no_single_partition_window(plan_spark, sf_dir):
    """text_rarity_score: the global vocabulary rank must be the
    two-phase range-partitioned form (VERDICT r7 task 3) — a full-vocab
    row_number through ONE task is a straggler at web-scale vocab. Since
    the r9 pin hardening (ADVICE r8) the range exchange runs inside the
    checkpoint's own job, so the final plan shows the PINNED partitioning
    (Scan ExistingRDD) feeding a pid-partitioned Window — and still no
    Exchange SinglePartition anywhere."""
    plan = physical_plan(q("text_rarity_score", plan_spark, sf_dir))
    assert "SinglePartition" not in plan, plan
    assert "ExistingRDD" in plan, plan
    assert "_gr_pid" in plan, plan


def test_fanout_profile_is_count_tables_plus_take_ordered(plan_spark, sf_dir):
    """join_fanout_profile: the profile must join the per-key COUNT
    tables (partial+final aggs below the join), broadcast the 1-row
    total, and top-k via TakeOrderedAndProject — never sort globally or
    join the fact tables themselves."""
    df = q("join_fanout_profile", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # both fact scans feed HashAggregates before any join
    assert plan.count("HashAggregate") >= 4, plan


def test_token_budget_has_no_single_partition_window(plan_spark, sf_dir):
    """sample_token_budget: the global running sum must be the
    two-phase global_prefix_sum form (r8) — pinned range partitioning
    (Scan ExistingRDD since the r9 checkpoint hardening) + pid windows,
    no Exchange SinglePartition."""
    plan = physical_plan(q("sample_token_budget", plan_spark, sf_dir))
    assert "SinglePartition" not in plan, plan
    assert "ExistingRDD" in plan, plan
    assert "_gp_pid" in plan, plan


def test_disjunctive_revenue_pushes_or_constraints_to_both_scans(
    plan_spark, sf_dir
):
    """composite_disjunctive_revenue (Q19 shape): Catalyst must derive
    the single-table disjunctions implied by the OR-of-ANDs and push
    them into BOTH scans, and the join must be broadcast — never a
    nested loop over unfiltered facts."""
    df = q("composite_disjunctive_revenue", plan_spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_quantity" in pushed, pushed
    assert "p_brand" in pushed and "p_size" in pushed, pushed
    strategies = join_strategies(df)
    assert strategies == ["BroadcastHashJoin"], strategies


def test_q17_shape_single_lineitem_scan(plan_spark, sf_dir):
    """composite_small_qty_revenue (Q17 shape): the correlated per-part
    AVG threshold must NOT re-scan lineitem — one lineitem scan feeding
    a broadcast brand-filter join and a partitioned window; no
    CartesianProduct, no unpartitioned window over the facts."""
    df = q("composite_small_qty_revenue", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("lineitem.parquet") == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q20_shape_single_lineitem_scan(plan_spark, sf_dir):
    """composite_excess_supply_suppliers (Q20 shape): the twice-
    correlated per-pair quantity subqueries must collapse into ONE
    lineitem scan + one (partkey, suppkey) aggregate; part filter is a
    broadcast join into the scan; the supplier membership test is a
    semi join."""
    df = q("composite_excess_supply_suppliers", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("lineitem.parquet") == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftSemi" in plan or "left_semi" in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan


def test_feature_snapshot_pit_is_one_timeline_sort(plan_spark, sf_dir):
    """composite_feature_snapshot_pit: the as-of profile must be the
    union+LOCF running-window form — a single user-partitioned Window
    over the unioned timeline, never a per-key range join (no
    BroadcastNestedLoopJoin / CartesianProduct), and no unpartitioned
    window."""
    plan = physical_plan(q("composite_feature_snapshot_pit", plan_spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "Union" in plan, plan


def test_q18_shape_single_lineitem_scan(plan_spark, sf_dir):
    """composite_large_volume_orders (Q18 shape): the HAVING aggregate
    doubles as the output SUM, so lineitem is scanned and aggregated
    exactly ONCE; the top-k limit is pushed below the rank window
    (TakeOrderedAndProject feeds the row_number), never a global
    materialized sort."""
    plan = physical_plan(q("composite_large_volume_orders", plan_spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q15_shape_single_lineitem_scan_pushed_quarter(plan_spark, sf_dir):
    """composite_top_revenue_supplier (Q15 shape): the revenue view is
    computed once — ONE lineitem scan with the quarter filter PUSHED to
    it; the scalar MAX rides a window over the supplier-grain aggregate
    (dim-bounded, the documented single-partition exception class)."""
    df = q("composite_top_revenue_supplier", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("lineitem.parquet") == 1, plan
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed, pushed


def test_salted_join_is_smj_on_both_keys(plan_spark, sf_dir):
    """join_salted_hotkey_revenue: the join must be a SortMergeJoin (the
    shuffle-join regime salting exists for — the merge hint holds even
    though the fixture dim would broadcast) keyed on BOTH (partkey,
    salt), with the dim side replicated by the salt-range join."""
    plan = physical_plan(q("join_salted_hotkey_revenue", plan_spark, sf_dir))
    assert "SortMergeJoin" in plan, plan
    i = plan.index("SortMergeJoin")
    head = plan[i : i + 120]
    assert "salt" in head and "partkey" in head, head


def test_q7_q8_q9_dims_broadcast_single_fact_shuffle(plan_spark, sf_dir):
    """Q7/Q8/Q9 shapes: every dimension leg (supplier/customer/nation/
    region/part) must broadcast — the only shuffle join allowed is the
    lineitem⋈orders fact join (Q9's orders join included); no cartesian
    anywhere."""
    for name in (
        "composite_nation_trade_volume",
        "composite_market_share",
        "composite_product_profit",
    ):
        df = q(name, plan_spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan, (name, plan)
        strategies = join_strategies(df)
        non_bcast = [s for s in strategies if s != "BroadcastHashJoin"]
        assert len(non_bcast) <= 1, (name, strategies)


def test_q12_shape_single_scans_filter_before_exchange(plan_spark, sf_dir):
    """composite_shipmode_priority (Q12 shape): one lineitem scan, one
    orders scan, and the lineitem-only predicates (mode 2-of-7,
    receipt-year window) must run on the lineitem leg BELOW the join so
    ~96% of lines never reach it. The commitdate predicates depend on
    o_orderdate and legitimately sit at/above the join; no cartesian, no
    window. The join STRATEGY is Catalyst's call — at fixture scale
    orders broadcasts (correct), at 100 TB AQE picks SMJ; the pin is the
    join KEY and the filter placement, not the strategy."""
    plan = physical_plan(q("composite_shipmode_priority", plan_spark, sf_dir))
    # r15: the lineitem leg is fenced (md5 synthesis column stored once
    # — see the operator comment), so the visible plan scans the
    # checkpoint RDD, not lineitem.parquet; the parquet scan lives
    # inside the fenced subplan and runs exactly once when it
    # materializes.
    assert plan.count("lineitem.parquet") == 0, plan
    assert "ExistingRDD" in plan, plan
    assert plan.count("orders.parquet") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    lines = plan.splitlines()
    join_at = [
        i
        for i, ln in enumerate(lines)
        if "Join" in ln and "l_orderkey" in ln and "o_orderkey" in ln
    ]
    assert join_at, plan
    # the mode/receipt filter runs on the lineitem CHILD of the join
    # (the tree prints children below the join node), so the thinned
    # stream is what reaches the join — never a post-join shipmode
    # filter. Catalyst inlines the aliases, so match the literal IN-list
    # of the collapsed CASE expression inside a Filter node.
    filt_at = [
        i
        for i, ln in enumerate(lines)
        if "Filter" in ln and "IN (MAIL,SHIP)" in ln
    ]
    assert filt_at and filt_at[0] > join_at[0], plan


def test_bigram_surprise_ctx_broadcasts_no_cartesian(plan_spark, sf_dir):
    """text_bigram_surprise: the context-count leg (vocabulary-sized)
    must broadcast; the bigram scoring join is a shuffled equi-join on
    (w1, w2) — never a cartesian; and the ctx re-agg consumes the
    REDUCED bigram table, so the plan carries exactly the pair/ctx/doc
    aggregate trio, no extra pass over raw pairs."""
    df = q("text_bigram_surprise", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    strategies = join_strategies(df)
    assert "BroadcastHashJoin" in strategies, strategies
    assert "SinglePartition" not in plan, plan


def test_bpe_trainer_top1_is_take_ordered_no_cartesian(
    plan_spark, sf_dir, monkeypatch
):
    """text_bpe_train_merges, DISTRIBUTED path (vocab above
    DRIVER_BPE_MAX_VOCAB — forced here by zeroing the cap): each
    round's global top pair must be a TakeOrderedAndProject (limit 1,
    never a full sort) and no CartesianProduct anywhere. The rounds
    collect 1-row driver state eagerly (r13), so the pin captures the
    per-round job plans via the listener-free route: build the round's
    top-1 frame directly from the module helpers."""
    from kstreams_spark.io import load_table
    from kstreams_spark.operators import text as T
    from pyspark.sql import functions as F

    v = T._bpe_vocab(load_table(plan_spark, sf_dir, "documents"))
    top = (
        T._bpe_sym_pairs(v)
        .groupBy("s1", "s2")
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "s1", "s2")
        .limit(1)
    )
    plan = physical_plan(top)
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan


def test_bpe_driver_and_distributed_paths_agree(spark, sf_dir, monkeypatch):
    """r13: the BPE round loop dispatches to a driver dictionary at or
    below DRIVER_BPE_MAX_VOCAB and a distributed loop above — the two
    paths must elect the same merges and produce the same counts (the
    dedup CC dispatch-parity contract)."""
    from kstreams_spark.operators import text as T

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    fast = rows(T.text_bpe_train_merges(spark, sf_dir))
    monkeypatch.setattr(T, "DRIVER_BPE_MAX_VOCAB", 0)
    slow = rows(T.text_bpe_train_merges(spark, sf_dir))
    assert fast == slow and len(fast) == T.BPE_TRAIN_ROUNDS


def test_bpe_encode_joins_encoded_vocab_broadcast(plan_spark, sf_dir):
    """text_bpe_encode: the doc-token → encoded-vocab join must
    broadcast the vocab leg (vocab ≪ corpus) — the corpus side is never
    shuffled for the join."""
    df = q("text_bpe_encode", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in join_strategies(df), join_strategies(df)


def test_curation_perplexity_window_is_partitioned(plan_spark, sf_dir):
    """composite_curation_perplexity: the tercile ntile must run
    partitioned by pred_lang — never an unpartitioned window — and the
    ctx leg of the nested surprise scoring stays broadcast."""
    df = q("composite_curation_perplexity", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in join_strategies(df), join_strategies(df)


def test_aqe_skew_join_splits_hot_key_and_matches_plain(spark, sf_dir):
    """AQE skew-join demonstration pin (r11 task 5): SCALE.md and the
    join_salted_hotkey_revenue docstring prescribe AQE's automatic
    skew-split as the preferred alternative to manual salting when one
    JOIN side is merely skewed (no dim explode, no query rewrite). This
    pins that the capability actually fires: a planted hot key (~3/4 of
    lineitem remapped onto one partkey) under a forced SortMergeJoin
    makes AQE split the oversized shuffle partition — visible as a
    skewed AQEShuffleRead in the EXECUTED plan (the split is a runtime
    re-plan, so the assertion runs after the action) — and the result
    is identical to the same join with skew handling off (the
    answer-invariance that is the whole point, the salted query's
    oracle argument). Thresholds are dropped to fixture scale the same
    way the bloom-filter pin drops its scan threshold: the conditions a
    real lake meets with DEFAULT confs."""
    from kstreams_spark.io import load_table

    hot = 1
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.when(F.col("l_partkey") % 4 != 0, F.lit(hot))
            .otherwise(F.col("l_partkey"))
            .cast("bigint")
            .alias("k"),
            "l_quantity",
        )
        # amplify the hot key 64× so its shuffle partition clears the
        # (already fixture-lowered) skew threshold at any test sf, and
        # spread the fact over 8 map tasks — AQE splits a skewed reduce
        # partition at MAP-CHUNK boundaries, so a single-mapper stage
        # (one small parquet file) is indivisible no matter how skewed
        .withColumn(
            "r",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.when(F.col("k") == hot, 64).otherwise(1),
                )
            ),
        )
        .drop("r")
        .repartition(8)
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"), "p_brand"
    )

    def run():
        j = li.join(p.hint("merge"), "k")
        return j.groupBy("p_brand").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("qty"),
        )

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = run()
        with_skew = sorted(
            (r.p_brand, r.n, r.qty) for r in df.collect()
        )
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in executed, executed[:3000]
        assert "skewed" in executed, executed[:3000]  # the AQEShuffleRead split
        # answer-invariance: identical to the join with skew handling off
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        without = sorted((r.p_brand, r.n, r.qty) for r in run().collect())
        assert with_skew == without
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dsl_topology_plans_like_hand_written(plan_spark, sf_dir):
    """dsl_topology_hourly_counts: the facade must add NO operator —
    one Exchange with partial+final HashAggregate around it, the exact
    window_tumbling_agg shape, and the value>10 filter pushed to the
    scan."""
    df = q("dsl_topology_hourly_counts", plan_spark, sf_dir)
    assert count_exchanges(df) == 1
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2
    pushed = " ".join(pushed_filters(df))
    assert "value" in pushed, pushed


def test_kgrouped_table_two_exchange_shape(plan_spark, sf_dir):
    """dsl_ktable_groupby_reaggregate (r13): exactly the two
    repartition topics Kafka Streams would create — one window
    exchange for latest-per-key, one aggregation exchange for the
    re-key — and nothing else (no join, no extra shuffle)."""
    df = q("dsl_ktable_groupby_reaggregate", plan_spark, sf_dir)
    plan = physical_plan(df)
    assert count_exchanges(df) == 2, plan
    assert "Window" in plan and "CartesianProduct" not in plan, plan


def test_matryoshka_funnel_plan(plan_spark, sf_dir):
    """r14 MRL funnel: stage 1 must be a BROADCAST cross join (queries
    broadcast — no CartesianProduct, no full-vector shuffle), the
    stage-2 joins must broadcast the Q·40 shortlist and the query
    vectors, and the only real shuffles are the two narrow top-k
    windows (+ the spread() repartition of the fixture input)."""
    df = q("similarity_topk_matryoshka", plan_spark, sf_dir)
    strategies = join_strategies(df)
    assert "CartesianProduct" not in strategies, strategies
    assert strategies.count("BroadcastNestedLoopJoin") == 1, strategies
    assert all(
        s in ("BroadcastNestedLoopJoin", "BroadcastHashJoin")
        for s in strategies
    ), strategies
    # spread() round-robin + two window shuffles; nothing else
    assert count_exchanges(df) <= 3, physical_plan(df)


def test_fk_join_broadcasts_dimension(plan_spark, sf_dir):
    """r14 KS 2.4 FK join: the thinned customer dimension must
    broadcast — Kafka Streams pays two repartition topics for this
    verb; one hash-broadcast is the Spark win the docstring claims."""
    strategies = join_strategies(q("dsl_ktable_fk_join", plan_spark, sf_dir))
    assert "BroadcastHashJoin" in strategies, strategies
    assert "CartesianProduct" not in strategies


def test_url_canonical_is_pure_aggregation(plan_spark, sf_dir):
    """r14 URL dedup: per-row string work into two aggregations — no
    join of any kind (cheapest dedup family member)."""
    df = q("dedup_url_canonical", plan_spark, sf_dir)
    assert join_strategies(df) == [], physical_plan(df)
    # spread() + two agg exchanges
    assert count_exchanges(df) <= 3


def test_funnel_joins_stay_on_user_id(plan_spark, sf_dir):
    """r14 ordered funnel: no cartesian anywhere; every join keys on
    user_id so one hash partitioning serves all three stages."""
    df = q("events_funnel_conversion", plan_spark, sf_dir)
    strategies = join_strategies(df)
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies
    plan = physical_plan(df)
    import re as _re

    joins = _re.findall(r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[?([a-z_]+)", plan)
    assert all(k.startswith("user_id") for k in joins), joins


def test_set_constraint_stats_proof_is_scanless(
    spark, tmp_path, sf_dir, monkeypatch
):
    """r15 (VERDICT r14 task 2 — the lake_evolution_roundtrip job
    floor): when manifest stats PROVE every live file complies with a
    single-comparison CHECK, snapshot_set_constraint runs ZERO Spark
    jobs (no validation scan); unprovable or violated predicates still
    scan/raise. Pinned by intercepting the scan-path entry."""
    import kstreams_spark.lake_snapshot as ls
    from kstreams_spark.io import load_table
    from pyspark.sql import functions as F

    lake = str(tmp_path / "scanless")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 2 == 0, "train")
            .otherwise("val")
            .alias("split"),
        )
        .filter(F.col("doc_id") < 400)
    )
    ls.snapshot_publish(docs, lake, partition_cols=("split",))

    scans = []
    real = ls._enforce_constraints
    monkeypatch.setattr(
        ls,
        "_enforce_constraints",
        lambda df, cons, op: (scans.append(op), real(df, cons, op))[1],
    )
    # provable: every file's doc_id max < 450 → no scan
    ls.snapshot_set_constraint(spark, lake, "bound", "doc_id < 450")
    assert scans == []
    # outside the negatable grammar (arithmetic) → the scan runs
    ls.snapshot_set_constraint(spark, lake, "loose", "doc_id + 0 < 450")
    assert len(scans) == 1
    # multi-conjunct predicates prove per conjunct (r15 widening):
    # both violation routes are stats-impossible → still scanless
    ls.snapshot_set_constraint(
        spark, lake, "both", "doc_id >= 0 AND doc_id < 500"
    )
    assert len(scans) == 1
    # BETWEEN desugars into the same provable pair
    ls.snapshot_set_constraint(
        spark, lake, "band", "doc_id BETWEEN 0 AND 500"
    )
    assert len(scans) == 1
    # a half-provable AND still scans (one conjunct unparseable)
    ls.snapshot_set_constraint(
        spark, lake, "half", "doc_id < 500 AND doc_id + 0 >= 0"
    )
    assert len(scans) == 2
    # violated predicates still refuse (via the scan)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="violat"):
        ls.snapshot_set_constraint(spark, lake, "bad", "doc_id < 100")


def test_evolution_chain_job_count_pinned(sf_dir, tmp_path):
    """r15: the lake_evolution_roundtrip verb chain's Spark-job count,
    pinned end-to-end with a job group (VERDICT r14 task 2: 'pin the
    chain's job count ... no third ambiguous round'). r14 floor was 6
    (publish 1 + set_constraint 2 + evolve-append 1 + read-agg 2); the
    stats compliance proof removes set_constraint's scan → ≤ 4."""
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    from kstreams_spark.io import load_table
    from kstreams_spark.lake_snapshot import (
        snapshot_publish,
        snapshot_read,
        snapshot_set_constraint,
    )
    from kstreams_spark.operators._util import dsum

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    sc = spark.sparkContext
    lake = tempfile.mkdtemp(prefix="evo_jobs_", dir=str(tmp_path))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "train")
        .otherwise("val")
        .alias("split"),
    )
    sc.setJobGroup("evo_chain", "job-count pin", False)
    try:
        base = docs.filter(F.col("doc_id") < 400)
        snapshot_publish(base, lake, partition_cols=("split",))
        snapshot_set_constraint(spark, lake, "ids_bounded", "doc_id < 450")
        newcomers = docs.filter(
            (F.col("doc_id") >= 400) & (F.col("doc_id") < 450)
        ).withColumn("quality", F.col("doc_id").cast("double") / 1000)
        snapshot_publish(
            newcomers,
            lake,
            partition_cols=("split",),
            mode="append",
            evolve=True,
        )
        v1 = snapshot_read(spark, lake, version=1).withColumns(
            {"version": F.lit(1), "quality": F.lit(None).cast("double")}
        )
        v2 = snapshot_read(spark, lake).withColumn("version", F.lit(2))
        u = v1.unionByName(v2)
        u.groupBy("version", "split").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("quality").alias("n_quality"),
            dsum("quality").alias("q_sum"),
        ).collect()
    finally:
        jobs = sc.statusTracker().getJobIdsForGroup("evo_chain")
        sc.setJobGroup(None, None, False)
    assert len(jobs) <= 4, f"evolution chain ran {len(jobs)} jobs: {jobs}"


def test_heavy_codec_payload_stage_is_spread(plan_spark, sf_dir):
    """r15 optimization pin: the JPEG/MPEG synth→decode mapInPandas
    chains must NOT inherit the fixture's single-file scan partitioning
    (one task = one Python worker doing every codec serially). The
    narrow id projection is round-robin repartitioned BEFORE the first
    MapInPandas, so the plan carries an Exchange under the Python
    stages. Cheap codecs (PNG/GIF/APNG/G.711) deliberately stay
    single-task — blanket spreading measurably regresses them
    (multimodal._ids docstring)."""
    for name in (
        "multimodal_image_decode_jpeg",
        "multimodal_image_decode_jpeg_progressive",
        "multimodal_image_decode_jpeg_progressive_420",
        "multimodal_audio_mpeg1_layer2",
    ):
        plan = explain_str(q(name, plan_spark, sf_dir))
        assert "RoundRobinPartitioning" in plan, (
            f"{name}: codec stage lost its spread\n{plan}"
        )
        assert "MapInPandas" in plan
