"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline (and the DuckDB-
oracle query); the LSH-bucketed variant in operators/dedup.py is the
scale path. Dot products run JVM-side via zip_with + aggregate —
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k rows by cosine similarity to a constant query vector.

    Plan shape: scan → projection with a codegen'd fold → top-k sort
    (Spark's TakeOrderedAndProject — no full sort, no shuffle of the
    full table). At 100 TB this parallelizes as per-partition top-k
    + driver merge, which is exactly what TakeOrderedAndProject does.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def sql_cosine_topk(table: str, query_vec: list[float], k: int,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> str:
    """DuckDB twin of cosine_topk (same fold order, same rounding)."""
    qlit = "[" + ", ".join(f"{float(x)!r}" for x in query_vec) + "]"
    return f"""
        SELECT {id_col},
               round(
                 list_sum(list_transform(list_zip({vec_col}, {qlit}),
                          p -> CAST(p[1] AS DOUBLE) * p[2]))
                 / (sqrt(list_sum(list_transform({vec_col}, x -> CAST(x AS DOUBLE) * x)))
                    * sqrt(list_sum(list_transform({qlit}, x -> CAST(x AS DOUBLE) * x)))),
                 4) AS cos_sim
        FROM {table}
        ORDER BY cos_sim DESC, {id_col}
        LIMIT {k}
    """
