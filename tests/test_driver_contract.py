"""Mimics the driver's correctness gate: every queries() entry runs at
sf0.01 and must match its oracle_sql() under DuckDB (row count + sorted
values), and entry(spark) must smoke-run at sf0.001.
"""

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(rows):
    def norm(v):
        if isinstance(v, list):
            return tuple(v)
        return v

    return sorted(tuple(norm(v) for v in r) for r in rows)


@pytest.mark.spark
def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "n_tok", "source", "pos", "token"}


@pytest.mark.spark
@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    spark_rows = [[v for v in r] for r in df.collect()]
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check
        return
    duck_rows = ddb.execute(oracles[name]).fetchall()
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    assert [c.lower() for c in df.columns] == [
        d[0].lower() for d in ddb.execute(oracles[name]).description
    ], f"{name}: column names"
    assert _canon(spark_rows) == _canon(duck_rows), f"{name}: values"
