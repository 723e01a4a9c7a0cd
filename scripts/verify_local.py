#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: verify_local.py <sf_dir> <verify_out_dir>
  (run `sbt "runMain graft.Verify <sf_dir> <out>"` first)

For each query in <out>/oracle_sql.json: run the SQL in DuckDB over views
of the sf parquet tables, read the Spark parquet from <out>/<name>/,
sort columns by name + ORDER BY ALL, and hash-compare.
"""
import sys, json, hashlib
import duckdb

def table_hash(con, sql):
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    sel = ", ".join(f'"{c}"' for c in cols)
    rows = con.sql(f"SELECT {sel} FROM rel ORDER BY ALL").fetchall()
    h = hashlib.md5()
    for r in rows:
        h.update(repr(r).encode())
    return len(rows), [str(t) for t in rel.types], h.hexdigest()

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["lineitem", "events", "documents", "embeddings", "orders",
              "customer", "part", "supplier", "nation", "region"]:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
        except Exception:
            pass
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracle.items()):
        try:
            sn, st, sh = table_hash(con, f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            on, ot, oh = table_hash(con, sql)
            ok = sn == on and sh == oh
            print(f"{'PASS' if ok else 'FAIL'} {name}: spark_rows={sn} oracle_rows={on} "
                  f"hash={'match' if sh == oh else 'MISMATCH'}")
            if not ok:
                fails.append(name)
                print(f"  spark types: {st}\n  oracle types: {ot}")
        except Exception as e:
            fails.append(name)
            print(f"ERR  {name}: {e}")
    print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass; fails: {fails}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
