#!/usr/bin/env python
"""Local approximation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at an SF dir (default
sf0.01) and compares against ``oracle_sql()`` executed in DuckDB with the
testdata parquet tables registered as views.  Compares row count, sorted
column-name schema, and a value hash over column-name-sorted, row-sorted,
float-rounded cells — the same shape of check the driver records in
CORRECTNESS_r{N}.json.

Usage: python scripts/check_correctness.py [query ...]
"""
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return "\0"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in mat:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main():
    import duckdb
    import __spark_entry__ as entry
    from iceberg_spark.sources.testdata import session

    spark = session("correctness_check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])
    results, n_pass = {}, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {}
        try:
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            s_cols = list(df.columns)
            s_rows = [tuple(r) for r in df.collect()]
            rec["sec"] = round(time.perf_counter() - t0, 3)
            sql = oracles.get(name)
            if sql is None:
                rec["status"] = "rows_only"
                rec["rows"] = len(s_rows)
            else:
                cur = con.execute(sql)
                o_cols = [d[0] for d in cur.description]
                o_rows = cur.fetchall()
                rec["rows"] = [len(s_rows), len(o_rows)]
                rec["row_match"] = len(s_rows) == len(o_rows)
                rec["schema_match"] = sorted(c.lower() for c in s_cols) == sorted(
                    c.lower() for c in o_cols
                )
                rec["hash_match"] = _hash_rows(
                    [c.lower() for c in s_cols], s_rows
                ) == _hash_rows([c.lower() for c in o_cols], o_rows)
                if not rec["schema_match"]:
                    rec["cols"] = [sorted(s_cols), sorted(o_cols)]
                rec["status"] = (
                    "pass"
                    if rec["row_match"] and rec["schema_match"] and rec["hash_match"]
                    else "FAIL"
                )
        except Exception as e:  # noqa: BLE001 - report and continue
            rec["status"] = "ERROR"
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = rec
        if rec["status"] in ("pass", "rows_only"):
            n_pass += 1
        print(f"{rec['status']:>9}  {name}  {rec.get('sec','')}", flush=True)

    bad = {k: v for k, v in results.items() if v["status"] not in ("pass", "rows_only")}
    print(f"\n{n_pass}/{len(results)} ok")
    if not only:
        # full runs persist as an audit artifact (committed per round as
        # CORRECTNESS_LOCAL_r{N}.json): the driver samples ~50 entries,
        # this records the whole registry's status
        out = os.environ.get(
            "SPARK_GRAFT_LOCAL_OUT",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "CORRECTNESS_LOCAL.json"))
        with open(out, "w") as f:
            json.dump({"sf_dir": SF_DIR, "n_pass": n_pass,
                       "n_total": len(results), "results": results},
                      f, indent=1, default=str)
    if bad:
        print(json.dumps(bad, indent=1, default=str))
        sys.exit(1)


if __name__ == "__main__":
    main()
