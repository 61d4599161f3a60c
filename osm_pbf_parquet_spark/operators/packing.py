"""Sequence packing: group documents into fixed token-budget bins —
the sample-packing step in front of LLM pre-training (concatenate
docs until the context window is full; oversized docs get their own
bin). Reference parity note: the reference engine (/root/reference,
Rust) has no packing surface; this extends the training-pipeline
family like operators/substring.py.

Policy: NEXT-FIT over docs sorted by id within a shard — walk the
docs in id order, close the current bin whenever the next doc would
overflow the budget. Deterministic, one pass, and (unlike first-fit /
best-fit) expressible as a linear recursion, so the DuckDB oracle can
restate it exactly as a recursive CTE. Waste vs first-fit-decreasing
is bounded (next-fit uses at most 2x optimal bins) and in exchange
the bin assignment is stable under re-runs — the property a
checkpoint/resume pipeline actually needs.

Scale shape: packing is embarrassingly parallel ACROSS shards and
sequential WITHIN one (the recurrence is the spec), so the operator
is applyInPandas over the shard column: one shuffle on shard, one
numpy pass per shard, bin ids globally unique as (shard, local_bin).
A 10^12-doc corpus packs as tens of thousands of shards — exactly how
training pipelines shard anyway (per input file / per date bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    id_col: str = "doc_id",
    budget: int = 512,
    shard_col: str | None = None,
) -> DataFrame:
    """(id, shard, bin_id, n_tokens) — next-fit packing of docs into
    ``budget``-token bins, per shard (``shard_col``; a single global
    shard when None — validation-scale, the distributed path is
    many-shard). ``tokens_col`` is the per-doc token count column
    (e.g. ``text.token_count``/``bpe_token_count`` output).

    bin_id is unique within shard; (shard, bin_id) is the global key.
    Docs with n_tokens > budget occupy a bin alone (the recurrence
    yields this without a special case).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    shard = F.col(shard_col) if shard_col else F.lit(0)
    src = df.select(
        F.col(id_col),
        shard.cast("long").alias("shard"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )

    schema = T.StructType(
        [
            src.schema[id_col],
            T.StructField("shard", T.LongType()),
            T.StructField("bin_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        toks = pdf["n_tokens"].to_numpy(dtype=np.int64)
        bins = np.empty(len(toks), dtype=np.int64)
        b = 0
        acc = 0
        for i, t in enumerate(toks):  # the recurrence IS the spec
            if acc and acc + t > budget:
                b += 1
                acc = 0
            acc += t
            bins[i] = b
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "shard": pdf["shard"].to_numpy(),
                "bin_id": bins,
                "n_tokens": toks,
            }
        )

    return src.groupBy("shard").applyInPandas(pack, schema)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-shard packing audit: bins, fill ratio, oversized docs."""
    per_bin = packed.groupBy("shard", "bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens"),
        F.count("*").alias("docs"),
    )
    return per_bin.groupBy("shard").agg(
        F.count("*").alias("n_bins"),
        F.sum("docs").alias("n_docs"),
        F.sum("bin_tokens").alias("total_tokens"),
        F.round(
            F.sum("bin_tokens") / (F.count("*") * F.lit(budget)), 4
        ).alias("fill_ratio"),
        F.sum(
            F.when(F.col("bin_tokens") > budget, 1).otherwise(0)
        ).alias("oversized_bins"),
    )
