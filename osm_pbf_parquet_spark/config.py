"""Engine configuration — the Spark twin of the reference CLI surface
(reference src/util.rs:24-61: --compression (zstd level, default 3),
--record-batch-target-bytes, --file-target-size, --worker-threads).

The adaptive chunk target reproduces the reference's memory-derived
batch default (src/util.rs:97-101: total_memory / cpus / 8), computed
from the Spark session's executor/driver memory so the same job sizes
itself correctly from a laptop to a 1000-executor cluster.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_UNITS = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
MIN_CHUNK = 4 << 20
MAX_CHUNK = 512 << 20


def parse_mem(s: str) -> int:
    m = re.fullmatch(r"(\d+)\s*([kmgt]?)b?", s.strip().lower())
    if not m:
        raise ValueError(f"unparseable memory size: {s!r}")
    return int(m.group(1)) * _UNITS.get(m.group(2), 1)


def derive_chunk_target(spark) -> int:
    """memory / cores / 8, clamped — reference src/util.rs:97-101."""
    conf = spark.conf
    mem = None
    for key in ("spark.executor.memory", "spark.driver.memory"):
        try:
            v = conf.get(key)
        except Exception:  # noqa: BLE001 - unset key raises
            v = None
        if v:
            mem = parse_mem(v)
            break
    if mem is None:
        mem = 2 << 30
    try:
        cores = int(conf.get("spark.executor.cores"))
    except Exception:  # noqa: BLE001
        cores = spark.sparkContext.defaultParallelism or 4
    return max(MIN_CHUNK, min(MAX_CHUNK, mem // max(1, cores) // 8))


@dataclass(frozen=True)
class EncodeConfig:
    """Frozen job config — the analogue of the reference's write-once
    global Args (src/util.rs:14-15), carried by closure capture instead
    of a process global."""

    key_col: str = "url"
    num_partitions: int = 32
    target_chunk_bytes: int | None = None  # None → derive_chunk_target
    zstd_level: int = 3  # reference default, src/util.rs:35-37
    codecs: dict[str, str] | None = field(default=None)

    def resolved_chunk_bytes(self, spark) -> int:
        if self.target_chunk_bytes is not None:
            return self.target_chunk_bytes
        return derive_chunk_target(spark)


def derive_num_partitions(spark, factor: int = 8, floor: int = 32) -> int:
    """Default engine-partition count: ≥ factor × available cores.

    The r3 task-granularity sweep (BENCH_r03, 133→194 MB/s monotone in
    task count at local[32]) showed coarse partitioning starves wide
    clusters: with N ≈ cores a single slow task serializes the tail,
    while ≳8× cores keeps every slot busy and lets AQE rebalance. At
    1000 executors × 8 cores this yields ≥ 64k partitions — the right
    granularity for a 100 TB scan (each partition ~1.5 GB). Callers
    that need pid-stable resume across differently-sized clusters
    should pin num_partitions explicitly (or rely on store_meta, which
    encode_job records and reuses).
    """
    cores = spark.sparkContext.defaultParallelism or 4
    return max(floor, factor * cores)
