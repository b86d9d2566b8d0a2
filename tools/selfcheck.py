"""Local replica of the driver's correctness gate.

Runs every suite query on Spark and its oracle on DuckDB at the given
sf dir, compares row count, sorted column names, and order-insensitive
values (after per-cell normalization), and prints a PASS/FAIL table.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_python_spark.session import get_spark  # noqa: E402
from datafusion_python_spark.suite import ALL_QUERIES  # noqa: E402
from datafusion_python_spark.tables import TABLE_NAMES  # noqa: E402


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def _type_cat(t) -> str:
    """Coarse Arrow type family. The driver's value hash is TYPED: equal
    values in different families (DuckDB HUGEINT/decimal vs Spark int64 —
    the round-3 win_groups_frame red row) hash differently even though
    the stringified compare here would pass. Width differences within a
    family are tolerated; family mismatches are flagged."""
    import pyarrow.types as pt

    for name, pred in (
        ("int", pt.is_integer),
        ("float", pt.is_floating),
        ("decimal", pt.is_decimal),
        ("bool", pt.is_boolean),
        ("timestamp", pt.is_timestamp),
        ("date", pt.is_date),
        ("time", pt.is_time),
        ("string", lambda x: pt.is_string(x) or pt.is_large_string(x)),
        ("binary", lambda x: pt.is_binary(x) or pt.is_large_binary(x)),
        ("list", lambda x: pt.is_list(x) or pt.is_large_list(x)),
        ("struct", pt.is_struct),
    ):
        if pred(t):
            return name
    return str(t)


def _schema_cats(schema) -> dict:
    return {f.name: _type_cat(f.type) for f in schema}


def main():
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if vanilla:
        # Replicate the DRIVER's session exactly: a bare SparkSession with
        # none of session.py's tuning, so any query that silently depends
        # on a tuned conf (timezone, nanosAsLong at build time, shuffle
        # sizing) fails HERE instead of in the round's driver run.
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name, (fn, sql) in sorted(ALL_QUERIES.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            if sql is None:
                print(f"ROWS-ONLY {name}: {len(srows)} rows")
                n_pass += 1
                continue
            dd = con.execute(sql)
            dcols = [d[0] for d in dd.description]
            drows = [tuple(r) for r in dd.fetchall()]
            sc, sr = _norm_rows(scols, srows)
            dc, dr = _norm_rows(dcols, drows)
            if sc != dc:
                print(f"FAIL {name}: columns {sc} != {dc}")
                n_fail += 1
            elif len(sr) != len(dr):
                print(f"FAIL {name}: rowcount {len(sr)} != {len(dr)}")
                n_fail += 1
            elif sr != dr:
                diff = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
                print(f"FAIL {name}: {len(diff)} mismatched rows of {len(sr)}")
                for i in diff[:3]:
                    print(f"   spark={sr[i]}")
                    print(f"   duck ={dr[i]}")
                n_fail += 1
            else:
                # typed check: the driver hashes typed values, so a
                # family mismatch (int vs decimal) fails there even
                # when the stringified values above are identical
                s_cats = _schema_cats(sdf.limit(0).toArrow().schema)
                d_cats = _schema_cats(con.execute(sql).arrow().schema)
                bad = {
                    c: (s_cats[c], d_cats[c])
                    for c in s_cats
                    if c in d_cats and s_cats[c] != d_cats[c]
                }
                if bad:
                    print(f"FAIL {name}: typed-family mismatch {bad}")
                    n_fail += 1
                else:
                    print(f"PASS {name}: {len(sr)} rows")
                    n_pass += 1
        except Exception:
            print(f"ERROR {name}:")
            traceback.print_exc(limit=4)
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
