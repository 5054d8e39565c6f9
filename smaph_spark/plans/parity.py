"""Local oracle-parity harness mimicking the driver's correctness gate.

Runs a named query through Spark and its SQL twin through DuckDB on
the same parquet directory, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted by all
values — the driver's stated comparison).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> dict:
    out = {"ok": False, "rows": (len(spark_pdf), len(duck_pdf))}
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        out["error"] = f"schema mismatch: {list(a.columns)} vs {list(b.columns)}"
        return out
    if len(a) != len(b):
        out["error"] = "row count mismatch"
        return out
    max_diff = 0.0
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            both_nan = av.isna() & bv.isna()
            diff = (av - bv).abs()
            diff[both_nan] = 0.0
            if diff.isna().any():
                out["error"] = f"NaN mismatch in {c}"
                return out
            md = float(diff.max()) if len(diff) else 0.0
            max_diff = max(max_diff, md)
            if md > 0:
                out.setdefault("float_diff_cols", {})[c] = md
        else:
            neq = (av.astype(str) != bv.astype(str))
            if neq.any():
                i = int(neq.idxmax())
                out["error"] = (
                    f"value mismatch in {c} at row {i}: "
                    f"{av.iloc[i]!r} vs {bv.iloc[i]!r}"
                )
                return out
    out["max_float_diff"] = max_diff
    out["ok"] = max_diff == 0.0
    if max_diff > 0:
        out["error"] = f"float values differ (max {max_diff})"
    return out


def check_query(spark, sf_dir: str, name: str, fn, sql: str) -> dict:
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duck_con(sf_dir)
    duck_pdf = con.execute(sql).fetchdf()
    con.close()
    res = compare_frames(spark_pdf, duck_pdf)
    res["name"] = name
    return res
