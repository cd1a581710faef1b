"""Local stand-in for the driver's correctness gate.

Runs every `queries()` entry from __spark_entry__.py on Spark at sf0.01,
runs the matching `oracle_sql()` string in DuckDB over the same parquet
tables, and compares row count, schema (column names sorted), and a
value hash (rows sorted, columns sorted by name, floats rounded).

Usage: python scripts/check_correctness.py [--only q1,q2] [--sf DIR]
"""
import argparse
import hashlib
import json
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    import decimal

    if v is None:
        return "\x00"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return format(round(v, 6), ".6f")
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default="/tmp/correctness_local.json")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = (SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.adaptive.enabled", "true")
             .appName("correctness-local").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = mod.queries()
    oracles = mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    report = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        entry = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            sdf = fn(spark, args.sf)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            entry["spark_rows"] = len(srows)
            if name not in oracles:
                entry["err"] = "no_oracle"
            else:
                ocur = con.execute(oracles[name])
                ocols = [d[0] for d in ocur.description]
                orows = ocur.fetchall()
                entry["oracle_rows"] = len(orows)
                entry["rows_match"] = len(srows) == len(orows)
                entry["schema_match"] = sorted(scols) == sorted(ocols)
                if entry["rows_match"] and entry["schema_match"]:
                    entry["hash_match"] = (
                        value_hash(scols, srows) == value_hash(ocols, orows))
                else:
                    entry["hash_match"] = False
        except Exception:
            entry["err"] = traceback.format_exc(limit=6)
        report[name] = entry
        ok = entry["hash_match"] or (entry["err"] == "no_oracle" and entry["spark_rows"] is not None)
        print(("PASS " if ok else "FAIL ") + name +
              (f"  rows={entry['spark_rows']}/{entry['oracle_rows']}" if not ok else ""),
              flush=True)
        if not ok and entry["err"] and entry["err"] != "no_oracle":
            print(entry["err"], flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    bad = [n for n, e in report.items()
           if not (e["hash_match"] or (e["err"] == "no_oracle" and e["spark_rows"] is not None))]
    print(f"\n{len(report) - len(bad)}/{len(report)} green; failing: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
