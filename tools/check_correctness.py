#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()`` in
DuckDB at sf0.01, compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values normalized).

Usage: python tools/check_correctness.py [query ...] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class used to reproduce the driver's hash sensitivity.

    The driver hashes raw fetched values, so an int64 Spark column vs a
    float64 oracle column (e.g. DuckDB HUGEINT from an uncast ``sum()``
    going through ``fetchdf()``) mismatches there even when the numbers are
    equal.  Round 6 shipped a false "120/120 local green" because
    ``normalize()`` collapsed that drift; classify dtypes *before*
    normalizing so the local gate fails the same way the driver does.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "other"


def dtype_drift(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Columns whose Spark/oracle dtype classes disagree (int vs float etc.)."""
    out = []
    for c in sdf.columns:
        if c not in odf.columns:
            continue
        cs, co = dtype_class(sdf[c]), dtype_class(odf[c])
        if cs != co:
            # a column that is all-NULL on one side legitimately loses its
            # dtype (object/float NaN); only flag when both sides carry values
            if sdf[c].notna().any() and odf[c].notna().any():
                out.append(f"{c}({cs} vs {co})")
    return out


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s)
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    # results must be partitioning-independent: re-running the full suite at
    # a different shuffle-partition count catches order-dependent floats,
    # nondeterministic tie-breaks, and partition-local logic
    ap.add_argument("--shuffle-partitions", type=int, default=8)
    # write a driver-gate-shaped JSON artifact (per query: rows/schema/hash
    # match + row counts + err) for committing full-suite runs
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    # sf-dependent oracle literals (the PQ codebooks) must quantize the
    # SAME corpus the Spark legs load — see __spark_entry__._pq_sql_fragments
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = args.sf_dir

    import __spark_entry__ as entry_mod
    from aeon_sleap_processing_spark.session import get_spark

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)

    spark = get_spark(
        app_name="check-correctness", shuffle_partitions=args.shuffle_partitions
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_weak = 0
    report: dict[str, dict] = {}

    def record(name, sdf=None, odf=None, hash_ok=None, err=None):
        report[name] = {
            "rows_match": None if (sdf is None or odf is None) else len(sdf) == len(odf),
            "schema_match": None
            if (sdf is None or odf is None)
            else sorted(sdf.columns) == sorted(odf.columns),
            "hash_match": hash_ok,
            "spark_rows": None if sdf is None else len(sdf),
            "oracle_rows": None if odf is None else len(odf),
            "err": err,
        }

    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            record(name, err=f"spark:{type(e).__name__}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "WEAK" if len(sdf) >= 0 else "FAIL"
            print(f"{status} {name}: rows-only check, {len(sdf)} rows ({time.time()-t0:.1f}s)")
            record(name, sdf=sdf, err="no_oracle")
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            record(name, sdf=sdf, err=f"duckdb:{type(e).__name__}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            drift = dtype_drift(sdf, odf)
            if drift:
                problems.append(f"dtype drift {drift}")
        if not problems:
            ns, no = normalize(sdf), normalize(odf)
            if value_hash(ns) != value_hash(no):
                diff_cols = [
                    c for c in ns.columns if not ns[c].equals(no[c])
                ]
                problems.append(f"value-hash mismatch in cols {diff_cols}")
                mask = pd.Series(False, index=ns.index)
                for c in diff_cols:
                    mask |= ns[c] != no[c]
                ex = pd.concat(
                    [ns[mask].head(3).add_suffix("_spark"), no[mask].head(3).add_suffix("_oracle")],
                    axis=1,
                )
                print(ex.to_string())
        record(name, sdf=sdf, odf=odf, hash_ok=not problems, err=None)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    if args.json_out:
        import json

        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.json_out}")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
