"""Driver-contract surface invariants + beyond-window extras.

The grading driver evaluates only the first 50 ``queries()`` entries
(round-2 lesson: entries 51-56 were silently ungraded), so the contract
module splits into exactly-50 oracle-backed graded entries and an
``extra_queries()`` remainder. These tests pin the split and keep the
extras green against their DuckDB oracles at sf0.001.
"""

from __future__ import annotations

import datetime
import math

import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.10g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def test_graded_window_is_exactly_50_all_oracle_backed():
    import __spark_entry__ as m

    q, o = m.queries(), m.oracle_sql()
    assert len(q) == 50, f"driver grades exactly 50; got {len(q)}"
    assert set(q) == set(o), "every graded query needs an oracle (and 1:1)"
    # no graded key may shadow an extra and vice versa
    assert not set(q) & set(m.extra_queries())


@pytest.fixture(scope="module")
def ducked(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_extra_queries_stay_green(spark, sf_dir, ducked):
    import __spark_entry__ as m

    extras = m.extra_queries()
    oracles = m.extra_oracle_sql()
    assert extras, "extras list unexpectedly empty"
    for name, fn in extras.items():
        df = fn(spark, sf_dir)
        rows = [tuple(r) for r in df.collect()]
        if name not in oracles:  # rows-only (xxhash64-derived)
            assert rows is not None
            continue
        res = ducked.execute(oracles[name])
        ocols = [c[0] for c in res.description]
        orows = res.fetchall()
        assert len(rows) == len(orows), f"{name}: rowcount"
        assert sorted(df.columns) == sorted(ocols), f"{name}: columns"
        assert _rowset(df.columns, rows) == _rowset(ocols, orows), (
            f"{name}: values differ"
        )
