"""As-of join (union + window, no range join): backward/forward
semantics, tie handling, missing-match nulls, pandas cross-check."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            (1, 10, 100.0), (1, 20, 101.0), (1, 30, 102.0),
            (2, 15, 200.0),
            # key 3 has no quotes at all
        ],
        ["k", "qts", "px"],
    )
    trades = spark.createDataFrame(
        [
            (1, 5, "a"),   # before any quote → null
            (1, 20, "b"),  # tie: quote at 20 matches (backward)
            (1, 25, "c"),  # → quote 20
            (1, 99, "d"),  # → quote 30
            (2, 14, "e"),  # before key-2's only quote → null
            (2, 16, "f"),  # → quote 15
            (3, 50, "g"),  # keyless → null
        ],
        ["k", "tts", "label"],
    )
    return quotes, trades


def test_asof_backward(spark, quotes_trades):
    from osm_pbf_parquet_spark.operators.asof import asof_join

    quotes, trades = quotes_trades
    out = {
        r["label"]: r["px"]
        for r in asof_join(trades, quotes, ["k"], "tts", "qts", ["px"]).collect()
    }
    assert out == {"a": None, "b": 101.0, "c": 101.0, "d": 102.0,
                   "e": None, "f": 200.0, "g": None}


def test_asof_forward(spark, quotes_trades):
    from osm_pbf_parquet_spark.operators.asof import asof_join

    quotes, trades = quotes_trades
    out = {
        r["label"]: r["px"]
        for r in asof_join(trades, quotes, ["k"], "tts", "qts", ["px"],
                           direction="forward").collect()
    }
    assert out == {"a": 100.0, "b": 101.0, "c": 102.0, "d": None,
                   "e": 200.0, "f": None, "g": None}


def test_asof_matches_pandas_merge_asof(spark):
    from osm_pbf_parquet_spark.operators.asof import asof_join

    import numpy as np

    rng = np.random.default_rng(3)
    q = pd.DataFrame({
        "k": rng.integers(0, 5, 300),
        "qts": rng.integers(0, 10000, 300),
        "px": rng.standard_normal(300).round(3),
    }).drop_duplicates(["k", "qts"]).sort_values("qts")
    t = pd.DataFrame({
        "k": rng.integers(0, 5, 200),
        "tts": rng.integers(0, 10000, 200),
        "tid": np.arange(200),
    }).sort_values("tts")
    want = pd.merge_asof(t, q, left_on="tts", right_on="qts", by="k")
    got = asof_join(
        spark.createDataFrame(t), spark.createDataFrame(q),
        ["k"], "tts", "qts", ["px"],
    ).toPandas().set_index("tid")["px"]
    for _, row in want.iterrows():
        g = got[row["tid"]]
        if pd.isna(row["px"]):
            assert pd.isna(g)
        else:
            assert g == row["px"]


def test_asof_one_shuffle_plan(spark, quotes_trades):
    """The plan must contain exactly one Exchange (the window
    partition) — no join, no range fan-out."""
    from osm_pbf_parquet_spark.operators.asof import asof_join

    quotes, trades = quotes_trades
    plan = asof_join(
        trades, quotes, ["k"], "tts", "qts", ["px"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
