"""Runs every QUERIES entry on Spark and its ORACLES twin on DuckDB at
sf0.001/sf0.01 and compares row count, column names, and values —
a local replica of the driver's correctness gate.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from pdf_extractor_spark.plans import queries as Q

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        norm = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                norm.append(None)
            elif isinstance(v, float):
                norm.append(round(v, 9))
            elif hasattr(v, "item"):  # numpy scalar
                iv = v.item()
                norm.append(round(iv, 9) if isinstance(iv, float) else iv)
            else:
                norm.append(v)
        rows.append(tuple(norm))
    return sorted(rows, key=repr)


@pytest.mark.parametrize("name", sorted(Q.ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    got = Q.QUERIES[name](spark, SF_DIR).toPandas()
    sql = Q.ORACLES[name]() if callable(Q.ORACLES[name]) else Q.ORACLES[name]
    if sql is None:
        pytest.skip("oracle generator unavailable in this context")
    exp = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name} columns: spark={sorted(got.columns)} duckdb={sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name} rows: spark={len(got)} duckdb={len(exp)}"
    g, e = _normalize(got), _normalize(exp)
    mismatches = [(a, b) for a, b in zip(g, e) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"
