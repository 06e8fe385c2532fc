"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

The driver sorts columns by name, then does row-count + schema +
order-insensitive value-hash.  We replicate that as: same column set,
same row count, and EXACT value equality after sorting rows by all
columns — exact, because the driver hashes values (no tolerance).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from flink_kmeans_clustering_spark.sources.parquet import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    # make timestamps comparable as strings; floats stay exact
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]").astype(str)
    out = out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(run_oracle(oracle_sql, sf_dir))
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            eq = (g.astype(float).values == w.astype(float).values) | (
                g.isna().values & w.isna().values
            )
        else:
            eq = (g.values == w.values) | (g.isna().values & w.isna().values)
        if not eq.all():
            bad = (~eq).nonzero()[0][:5]
            raise AssertionError(
                f"value mismatch in column {c!r} at rows {bad.tolist()}: "
                f"spark={g.iloc[bad].tolist()} oracle={w.iloc[bad].tolist()}"
            )
