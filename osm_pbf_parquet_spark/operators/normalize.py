"""Per-type → unified-schema normalization (reference P1–P7 family).

The reference projects each element type into one 12-column schema,
NULL-filling inapplicable fields and coercing representations
(add_node src/sink.rs:171-196, add_dense_node :198-222, add_way
:224-249, add_relation :251-291). Here the same wide projections are
pure Catalyst expressions — create_map, transform+struct, CASE, cast —
so they codegen JVM-side and cost one projection, no shuffle:

  P1/P2  node rows: tags→map, lat/lon kept, user decode-fallback → ''
         (reference src/sink.rs:173-177), optional info fields → NULL
  P3     way rows: lat/lon NULL, refs → nds list<struct<ref>>
         (reference src/sink.rs:241-244)
  P4     relation rows: members → list<struct<type,ref,role>>, member
         type enum → lowercase string (reference src/sink.rs:260-264)
  P5/P6  map / list-of-struct construction (reference src/osm_arrow.rs:191-235)
  P7     epoch-ms int64 → timestamp (reference src/osm_arrow.rs:86-90)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIFIED_COLUMNS = [
    "id", "type", "tags", "lat", "lon", "nds", "members",
    "changeset", "timestamp", "uid", "user", "version", "visible",
]

_NULL_TAGS = "CAST(NULL AS MAP<STRING,STRING>)"
_NULL_NDS = "CAST(NULL AS ARRAY<STRUCT<ref: BIGINT>>)"
_NULL_MEMBERS = (
    "CAST(NULL AS ARRAY<STRUCT<type: STRING, ref: BIGINT, role: STRING>>)"
)


def _info_cols(df: DataFrame) -> list:
    """Shared optional-info projection (P2: every info field NULL-lifted;
    P7: epoch-ms → timestamp; user '' fallback per src/sink.rs:173-177)."""
    return [
        F.col("changeset").cast("long").alias("changeset"),
        F.timestamp_millis(F.col("ts_ms").cast("long")).alias("timestamp"),
        F.col("uid").cast("int").alias("uid"),
        F.coalesce(F.col("user"), F.lit("")).alias("user"),
        F.col("version").cast("int").alias("version"),
        F.col("visible").cast("boolean").alias("visible"),
    ]


def normalize_nodes(nodes: DataFrame) -> DataFrame:
    """P1/P2. Input: id, lat, lon, tag_keys array, tag_vals array,
    changeset, ts_ms, uid, user, version, visible."""
    return nodes.select(
        F.col("id").cast("long").alias("id"),
        F.lit("node").alias("type"),
        F.when(
            F.size("tag_keys") > 0,
            F.map_from_arrays("tag_keys", "tag_vals"),
        ).otherwise(F.expr(_NULL_TAGS)).alias("tags"),
        F.col("lat").cast("double").alias("lat"),
        F.col("lon").cast("double").alias("lon"),
        F.expr(_NULL_NDS).alias("nds"),
        F.expr(_NULL_MEMBERS).alias("members"),
        *_info_cols(nodes),
    )


def normalize_ways(ways: DataFrame) -> DataFrame:
    """P3. Input adds: refs array<long>; lat/lon are NULL by schema
    (reference src/sink.rs:237-238)."""
    return ways.select(
        F.col("id").cast("long").alias("id"),
        F.lit("way").alias("type"),
        F.when(
            F.size("tag_keys") > 0, F.map_from_arrays("tag_keys", "tag_vals")
        ).otherwise(F.expr(_NULL_TAGS)).alias("tags"),
        F.lit(None).cast("double").alias("lat"),
        F.lit(None).cast("double").alias("lon"),
        F.expr("transform(refs, r -> struct(CAST(r AS BIGINT) AS ref))").alias("nds"),
        F.expr(_NULL_MEMBERS).alias("members"),
        *_info_cols(ways),
    )


def normalize_relations(rels: DataFrame) -> DataFrame:
    """P4. Input adds: member_types array<int> (0=node 1=way 2=relation),
    member_refs array<long>, member_roles array<string> (role may be
    null — reference src/sink.rs:266-269). Enum → lowercase string via
    element_at on a literal map (reference src/sink.rs:260-264)."""
    return rels.select(
        F.col("id").cast("long").alias("id"),
        F.lit("relation").alias("type"),
        F.when(
            F.size("tag_keys") > 0, F.map_from_arrays("tag_keys", "tag_vals")
        ).otherwise(F.expr(_NULL_TAGS)).alias("tags"),
        F.lit(None).cast("double").alias("lat"),
        F.lit(None).cast("double").alias("lon"),
        F.expr(_NULL_NDS).alias("nds"),
        F.expr(
            "zip_with(member_types, member_refs, (t, r) -> struct("
            " element_at(map(0, 'node', 1, 'way', 2, 'relation'), t) AS type,"
            " CAST(r AS BIGINT) AS ref))"
        ).alias("_tm"),
        F.col("member_roles").alias("_roles"),
        *_info_cols(rels),
    ).select(
        "id", "type", "tags", "lat", "lon", "nds",
        F.expr(
            "zip_with(_tm, _roles, (m, role) -> struct("
            "m.type AS type, m.ref AS ref, role AS role))"
        ).alias("members"),
        "changeset", "timestamp", "uid", "user", "version", "visible",
    )


def normalize_elements(
    nodes: DataFrame, ways: DataFrame, relations: DataFrame
) -> DataFrame:
    """The reference's demux in reverse: three typed inputs → one
    unified table (union is free: no shuffle, same schema)."""
    return (
        normalize_nodes(nodes)
        .unionByName(normalize_ways(ways))
        .unionByName(normalize_relations(relations))
    )
