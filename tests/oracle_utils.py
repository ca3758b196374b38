"""Local mirror of the driver's DuckDB-oracle differential check:
row count + column set + order-insensitive value comparison."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from streamprocess_spark.schemas import TABLE_NAMES

_FLOAT_KINDS = ("f",)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if len(s.dropna()) else None, (bytes,)):
            df[c] = s.apply(lambda b: b.hex() if isinstance(b, bytes) else b)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("bool")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _dtype_family(s: pd.Series) -> str:
    """Coarse dtype family for strict cross-engine type parity.

    The driver's value hash is format-sensitive: a Spark int64 column
    hashed against a DuckDB column pandas materialized as float64
    renders '4177920' vs '4177920.0' and mismatches even when every
    value is numerically identical (round-5 q_media_invariants red).
    So the local mirror must refuse to numerically coerce across
    families: integer must meet integer, float must meet float.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = identical)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} "
            f"duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    for c in sorted(spark_pdf.columns):
        fa, fb = _dtype_family(spark_pdf[c]), _dtype_family(duck_pdf[c])
        if fa != fb:
            problems.append(
                f"column {c}: dtype family mismatch spark={fa} "
                f"({spark_pdf[c].dtype}) vs duck={fb} ({duck_pdf[c].dtype}) — "
                "the driver's format-sensitive hash would fail here"
            )
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind in _FLOAT_KINDS:
            an, bn = av.to_numpy(), bv.to_numpy()
            both_nan = np.isnan(an) & np.isnan(bn)
            exact = (an == bn) | both_nan
            if not exact.all():
                bad = int((~exact).sum())
                idx = int(np.argmax(~exact))
                problems.append(
                    f"column {c}: {bad} float mismatches, e.g. "
                    f"{an[idx]!r} vs {bn[idx]!r} (diff {an[idx]-bn[idx]!r})"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                bad = int((~eq).sum())
                i = int(np.argmax((~eq).to_numpy()))
                problems.append(
                    f"column {c} ({av.dtype} vs {bv.dtype}): {bad} mismatches, "
                    f"e.g. {av.iloc[i]!r} vs {bv.iloc[i]!r}"
                )
    return problems
