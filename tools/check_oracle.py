"""Local mimic of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql() twin
on DuckDB over the same parquet dir, then compares row count, column names,
and (order-insensitively) values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[ns]")
        elif col.dtype == object:
            sample = col.dropna()
            if len(sample) and isinstance(sample.iloc[0], (datetime.date, datetime.datetime)):
                df[c] = pd.to_datetime(col).astype("datetime64[ns]")
            else:
                df[c] = col.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s, o = canon(spark_pdf), canon(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        # Driver-faithful dtype gate: the driver's value-hash distinguishes
        # int 3 from float 3.0, and numpy's int64==float64 comparison is
        # lossy above 2^53 (DuckDB HUGEINT->float64 oracles passed locally
        # for two rounds because of exactly this). An integer-typed column
        # on one side and a float-typed column on the other is a failure
        # regardless of numeric closeness.
        if (sv.dtype.kind in "iu") != (ov.dtype.kind in "iu") and (
            sv.dtype.kind in "iuf" and ov.dtype.kind in "iuf"
        ):
            problems.append(
                f"col {c}: dtype mismatch spark={sv.dtype} oracle={ov.dtype}"
                " (int-vs-float; driver hash would fail)"
            )
            continue
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            # STRICT: bit-equality or failure — the driver's value hash is
            # exact, so any tolerance here is a local-green/driver-red
            # channel (r3/r4 lesson; the last 1e-9 escape hatch was removed
            # per VERDICT-r5 item 3). The near/far split below is
            # DIAGNOSTIC wording only: both append a failure.
            sv_f = pd.to_numeric(sv, errors="coerce")
            ov_f = pd.to_numeric(ov, errors="coerce")
            both_nan = sv_f.isna() & ov_f.isna()
            exact = (sv_f == ov_f) | both_nan
            if not exact.all():
                n = (~exact).sum()
                i = (~exact).idxmax()
                ulp_only = bool(
                    (((sv_f - ov_f).abs() <= 1e-9 + 1e-9 * ov_f.abs()) | both_nan).all()
                )
                kind = (
                    "FLOAT-ULP (mirror IEEE op order / decimal accumulation"
                    " on the Spark side; never round)"
                    if ulp_only
                    else "values differ"
                )
                problems.append(
                    f"col {c}: {kind}: {n} not bit-equal, e.g. {sv_f[i]!r} vs {ov_f[i]!r}"
                )
        else:
            if not sv.equals(ov):
                neq = (sv != ov)
                i = neq.idxmax()
                problems.append(f"col {c}: {neq.sum()} values differ, e.g. {sv[i]!r} vs {ov[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    if os.environ.get("SPARK_GRAFT_BARE_SESSION"):
        # Simulate the driver's session: default confs, none of get_spark's
        # pins (UTC tz, nanosAsLong, AQE sizing). Every registered query must
        # still oracle-match — conf dependencies belong inside the operators.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[16]")
            .appName("oracle-check-bare")
            .config("spark.sql.shuffle.partitions", "16")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from airdatapipeline_spark.session import get_spark

        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows-only, {len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failed.append(name)
            print(f"FAIL  {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"ok    {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
