"""Streaming encode path.

The reference is a bounded batch job (one input file, one terminating
run — reference src/lib.rs:18-44; its incremental-update placeholder
src/osc.rs is empty). The engine therefore needs no stateful streaming
semantics for parity; this module provides the idiomatic Spark bridge
anyway: a Structured Streaming sink that applies the batch encoder to
each micro-batch via foreachBatch, giving incremental ingest the
reference never implemented.
"""

from .dedup_stream import content_dedup_stream, dedup_stream  # noqa: F401
from .encode_stream import encode_stream, merge_stream  # noqa: F401
