"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted
column names, and order-insensitive values (floats to 1e-9, timestamps
normalized). Usage:

    python tools/verify_local.py [query ...]      # default: all
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/verify_local.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cdc_system_spark.session import get_spark  # noqa: E402
from cdc_system_spark.sources.catalog import TABLES  # noqa: E402


def _kind(s: pd.Series) -> str:
    """Coarse dtype kind used for driver-parity mismatch detection."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "str"


def _complex_cols(df: pd.DataFrame) -> list[str]:
    """Columns holding unhashable values (arrays/structs/maps). The
    driver's canonicalizer sorts raw values and dies on these — mirror
    that by failing loudly instead of stringifying (the r3 masking bug).
    """
    import numpy as np

    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna().head(50)
            if any(
                isinstance(v, (list, tuple, dict, set, np.ndarray)) for v in sample
            ):
                bad.append(c)
    return bad


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    # Driver parity 1: complex-typed output columns crash the driver's
    # canonicalizer (r3 q_substring_dedup). Reject them outright.
    for side, df in (("spark", spark_pdf), ("duck", duck_pdf)):
        bad = _complex_cols(df)
        if bad:
            problems.append(
                f"{side} emits complex-typed columns {bad} "
                "(array/struct/map) — driver canonicalizer would error"
            )
    if problems:
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
        return problems
    # Driver parity 2: the driver hashes raw values, so an int column on
    # one side paired with a float column on the other (DuckDB HUGEINT ->
    # float64, the r3 q_sequence_pack failure) hash-mismatches even when
    # every value is numerically identical. Flag it instead of coercing.
    for c in sc:
        ks, kd = _kind(spark_pdf[c]), _kind(duck_pdf[c])
        if ks != kd and {ks, kd} <= {"int", "float", "bool"}:
            problems.append(
                f"dtype kind mismatch on {c!r}: spark={ks} duck={kd} "
                "(driver value-hash would differ; CAST the oracle)"
            )
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, atol=1e-9, rtol=0)
        except AssertionError as e:
            problems.append("values: " + str(e).split("\n")[0] + " | " + "\n".join(str(e).split("\n")[1:3]))
    return problems


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    only = set(sys.argv[1:])
    # SPARK_GRAFT_VERIFY_CORES / _SHUFFLE override the layout — run the
    # suite under a weird layout (e.g. 3 cores / 7 partitions) to prove
    # every oracle result is partitioning-independent
    cores = os.environ.get("SPARK_GRAFT_VERIFY_CORES", "8")
    shuf = int(os.environ.get("SPARK_GRAFT_VERIFY_SHUFFLE", "8"))
    spark = get_spark(
        app_name="verify_local", master=f"local[{cores}]", shuffle_partitions=shuf
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"ERROR: unknown query names: {sorted(unknown)}")
            return 2
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            failed.append(name)
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception:
            failed.append(name)
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failed.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            passed.append(name)
            print(f"ok    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    # The summary must be supported by the body above it: a committed
    # VERIFY_LOCAL artifact whose header claims N ok but lists fewer is
    # exactly the drift r9's verdict flagged (VERIFY_LOCAL_r09 claimed
    # 213 ok / listed 208 — assembled from partial only=-filtered runs).
    # Two defenses: (1) the listed-line invariant is asserted, (2) a
    # filtered run labels itself PARTIAL so it can never be committed as
    # a complete sweep by accident.
    listed = len(passed) + len(rows_only) + len(failed)
    expected = len(only) if only else len(qs)
    assert listed == expected, (
        f"body/summary mismatch: {listed} result lines vs {expected} "
        "queries swept — artifact would be self-contradictory"
    )
    scope = (
        f"PARTIAL sweep ({listed} of {len(qs)} registered queries — "
        "NOT a commit artifact)"
        if only
        else f"COMPLETE sweep ({listed} of {len(qs)} registered queries)"
    )
    print(
        f"\n{scope}: {len(passed)} ok, {len(rows_only)} rows-only, "
        f"{len(failed)} FAILED" + (": " + ", ".join(failed) if failed else "")
    )
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
