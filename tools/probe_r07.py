"""Interactive measurement harness for optimization round 7.

Usage (from a REPL):
    import tools.probe_r07 as P
    spark, ctx = P.setup("/root/testdata/sf1.0")
    P.best3(lambda: ...)

Builds the SAME session shape as the frozen bench.py (local[32],
shuffle.partitions=2*cpus, AQE on, arrow on, 16g driver) so probe
numbers are comparable to the driver's measurement.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def setup(sf_dir: str = "/root/testdata/sf1.0", cpus: int = 32,
          amplify: int = 4, ui: bool = True):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r07-probe")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", str(ui).lower())
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = b.getOrCreate()
    import __spark_entry__ as entry_mod

    entry_mod._ensure_workers_see_package(spark)

    from pyspark.sql import functions as F  # noqa: F401

    def load(name):
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    li = load("lineitem")
    for _ in range(max(0, amplify - 1)):
        li = li.union(load("lineitem"))
    li = li.cache()
    li_rows = li.count()
    docs = load("documents").cache()
    doc_rows = docs.count()
    events = load("events").cache()
    events.count()
    ctx = {
        "load": load, "li": li, "li_rows": li_rows, "docs": docs,
        "doc_rows": doc_rows, "events": events, "entry": entry_mod,
    }
    print(f"ready: li={li_rows} docs={doc_rows}")
    return spark, ctx


def best3(fn, warm: bool = True, n: int = 3, label: str = ""):
    if warm:
        fn()
    samples = []
    for _ in range(n):
        t0 = time.time()
        fn()
        samples.append(round(time.time() - t0, 3))
    samples.sort()
    print(f"{label or getattr(fn, '__name__', 'fn')}: best={samples[0]} all={samples}")
    return samples


def explain_to(df, path: str):
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(path, "w") as fh:
        fh.write(s)
    print(f"wrote {path} ({len(s)} bytes)")
    return s
