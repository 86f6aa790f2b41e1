"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs a registered query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and column-name-sorted
values (order-insensitive) — the same contract as CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

from pyspark.sql import SparkSession

from .registry import ORACLES, QUERIES
from .sources import TABLE_SCHEMAS


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLE_SCHEMAS:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if not os.path.exists(path):
                continue  # partial dirs (tests): register what's there
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    try:
        if pd.isna(a) and pd.isna(b):  # NaN, NaT, None — all count as equal
            return True
    except (TypeError, ValueError):
        pass  # array-likes: fall through to ==
    if isinstance(a, float) and isinstance(b, float):
        return a == b
    return a == b


def compare_query(
    spark: SparkSession, name: str, sf_dir: str, float_exact: bool = True
) -> CompareResult:
    fn = QUERIES[name]
    sql = ORACLES[name]
    sdf = fn(spark, sf_dir).toPandas()
    odf = run_oracle(sf_dir, sql)
    if sorted(sdf.columns) != sorted(odf.columns):
        return CompareResult(
            name, False, len(sdf), len(odf),
            f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}",
        )
    # Enforce dtype parity too: the driver's value-hash may be dtype- or
    # unit-sensitive (e.g. datetime64[ns] vs [us]); emit strings/casts in
    # both engines rather than relying on value-level coercion.
    dtype_mismatch = [
        c
        for c in sorted(sdf.columns)
        if str(sdf[c].dtype) != str(odf[c].dtype)
    ]
    if dtype_mismatch:
        return CompareResult(
            name, False, len(sdf), len(odf),
            "dtype mismatch: "
            + ", ".join(
                f"{c}: spark={sdf[c].dtype} oracle={odf[c].dtype}"
                for c in dtype_mismatch
            ),
        )
    if len(sdf) != len(odf):
        return CompareResult(name, False, len(sdf), len(odf), "row count differs")
    a, b = _canon(sdf), _canon(odf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not _values_equal(x, y):
                return CompareResult(
                    name, False, len(sdf), len(odf),
                    f"value mismatch col={col} row={i}: spark={x!r} oracle={y!r}",
                )
    return CompareResult(name, True, len(sdf), len(odf))
