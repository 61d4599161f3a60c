"""Physical-plan quality gates: the plans we ship must stay the plans
we designed (SURVEY.md §4). These tests read .explain() output so a
regression (lost broadcast, extra shuffle, dropped pushdown, full sort
where a top-k belongs) fails CI instead of silently costing 10× at
100 TB.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_encode_has_exactly_one_shuffle(spark, pages_path):
    from osm_pbf_parquet_spark.operators.encode import encode_dataframe

    src = spark.read.parquet(pages_path)
    chunks = encode_dataframe(src, key_col="url", num_partitions=8)
    plan = plan_of(chunks)
    assert plan.count("Exchange") == 1, plan


def test_cosine_topk_uses_takeordered(spark, sf_dir):
    from osm_pbf_parquet_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = cosine_topk(emb, [0.1] * 64, k=10)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan  # no full sort


def test_tpch_q3_broadcasts_dimension(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    assert "BroadcastHashJoin" in plan_of(q)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 49.0).select("l_orderkey", "l_quantity")
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan, plan
    # column pruning: scan schema restricted to the two projected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan, plan


def test_resume_antijoin_is_broadcast(spark, pages_path, tmp_path):
    """The manifest anti-join must broadcast the (tiny) done-set, never
    shuffle the 100 TB input against it."""
    from osm_pbf_parquet_spark.plans.manifest import encode_job, read_manifest
    from osm_pbf_parquet_spark.operators.encode import PID_COL, with_partition_id

    out = str(tmp_path / "enc")
    src = spark.read.parquet(pages_path)
    encode_job(spark, src, out, key_col="url", num_partitions=4,
               fail_after_partitions=2)
    manifest = read_manifest(spark, out)
    done = manifest.select(F.col("partition_id").alias(PID_COL))
    pending = with_partition_id(src, "url", 4).join(
        F.broadcast(done), PID_COL, "left_anti"
    )
    plan = plan_of(pending)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_salted_pids_uses_broadcast_for_fanout(spark, pages_path):
    from osm_pbf_parquet_spark.operators.partitioning import salted_pids

    df = spark.read.parquet(pages_path)
    plan = plan_of(salted_pids(df, num_partitions=8))
    assert "BroadcastHashJoin" in plan, plan


def test_dedup_exact_partial_aggregation(spark, sf_dir):
    """groupBy must show two-phase (partial_merge) hash aggregation —
    map-side combine before the shuffle."""
    from osm_pbf_parquet_spark.operators.dedup import dedup_exact

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(dedup_exact(docs))
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial" in plan, plan
