"""osm_pbf_parquet_spark — a from-scratch PySpark-native per-column
lightweight-compression engine.

Capabilities mirror brad-richardson/osm-pbf-parquet (block-parallel
binary→columnar transcode with bounded memory, explicit partitioning,
size-governed sinks, round-trip correctness — see /root/reference
src/pbf.rs, src/sink.rs, src/osm_arrow.rs), realized idiomatically on
Spark: DataFrame plans, Arrow-vectorized UDFs (`mapInArrow`), never
per-row Python.

Layout:
  functions/codecs/  pure numpy/pyarrow codec kernels (dict, RLE, FSST,
                     bit-pack, frame-of-reference/delta, zstd, plain)
  functions/         text analysis + similarity scalar/column functions
  operators/         encode/decode mapInArrow operators, dedup family,
                     partitioning & skew salting, validation queries
  sources/           deterministic fixture generators + testdata loaders
  plans/             lineage manifest + idempotent resume
  streaming/         foreachBatch streaming encode
"""

__version__ = "0.1.0"
