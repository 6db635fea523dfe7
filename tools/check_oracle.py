"""Local stand-in for the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle at the
given scale factor, then compares row count, schema (column names), and
order-insensitive values (columns sorted by name, rows sorted by all
columns). Exact equality is required for non-floats; floats must match to
1e-9 after the plans' own rounding.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

# runnable from any cwd: the repo root (this file's parent's parent) hosts
# the kafka_connect_ftp_spark package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # binary columns arrive as bytearray (Spark) / bytes (DuckDB):
            # normalize so pandas can hash/sort them
            df[c] = df[c].map(lambda v: bytes(v) if isinstance(v, (bytearray, memoryview)) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    issues = []
    if len(spark_pdf) != len(duck_pdf):
        issues.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        issues.append(f"columns spark={s_cols} duck={d_cols}")
        return issues
    if issues:
        return issues
    s, d = canon(spark_pdf), canon(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            a = sv.astype(float).to_numpy()
            b = dv.astype(float).to_numpy()
            ok = (np.isnan(a) & np.isnan(b)) | (np.abs(a - b) <= 1e-9)
            if not ok.all():
                i = int(np.argmax(~ok))
                issues.append(f"col {c}: {int((~ok).sum())} diffs, first@{i}: {a[i]!r} vs {b[i]!r}")
        else:
            eq = (sv.fillna("\0NULL") == dv.fillna("\0NULL")) if sv.dtype == object else (
                sv.isna() & dv.isna()) | (sv == dv)
            if not eq.all():
                i = int(np.argmax(~eq.to_numpy()))
                issues.append(
                    f"col {c} ({sv.dtype} vs {dv.dtype}): {int((~eq).sum())} diffs, "
                    f"first@{i}: {sv.iloc[i]!r} vs {dv.iloc[i]!r}"
                )
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from kafka_connect_ftp_spark.plans import registry
    from kafka_connect_ftp_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duck_con(sf_dir)
    reg = registry()
    n_fail = 0
    for name, spec in sorted(reg.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"SKIP {name}: no oracle (rows={len(spark_pdf)}, {time.time() - t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        issues = compare(name, spark_pdf, duck_pdf)
        if issues:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(issues))
        else:
            print(f"PASS {name} ({len(spark_pdf)} rows, {time.time() - t0:.1f}s)")
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
