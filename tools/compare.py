#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each query's parquet dump against its DuckDB oracle on the same tables.

Usage: python3 tools/compare.py <sfDir> <outDir> [query ...]
"""
import json, sys, glob, os
import duckdb

def canon(con, rel):
    # driver compare: sort columns by name, hash values; here we just
    # produce a canonical list-of-tuples with columns sorted by name.
    cols = sorted(rel.columns)
    q = ", ".join(f'"{c}"' for c in cols)
    return cols, rel.project(q).fetchall()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # keep spill files out of the repo tree (they got committed once)
    con.execute("SET temp_directory='/tmp/duckdb_tmp'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = {"err": "no parquet"}
            continue
        spark_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        if name not in oracle:
            results[name] = {"rows_only": True, "spark_rows": len(spark_rel.fetchall())}
            continue
        try:
            import time
            t0 = time.time()
            ora_rel = con.sql(oracle[name])
            sc, sv = canon(con, spark_rel)
            oc, ov = canon(con, ora_rel)
            res = {
                "rows_match": len(sv) == len(ov),
                "schema_match": sc == oc,
                "hash_match": sv == ov,
                "spark_rows": len(sv), "oracle_rows": len(ov),
                # oracle wall seconds: a CTE-inlining blowup (the r9
                # 66 GB spill class) shows up here as minutes, not as a
                # mystery hang
                "oracle_s": round(time.time() - t0, 1),
            }
            if not res["hash_match"] and res["rows_match"]:
                diffs = [(a, b) for a, b in zip(sv, ov) if a != b][:3]
                res["first_diffs"] = repr(diffs)[:500]
            if sc != oc:
                res["cols"] = f"spark={sc} oracle={oc}"
            results[name] = res
        except Exception as e:
            results[name] = {"err": str(e)[:300]}
    # a requested query with no dump must FAIL, not pass vacuously
    for name in only - results.keys():
        results[name] = {"err": "no dump directory in out_dir"}
    ok = bool(results) and all(
        r.get("hash_match") or r.get("rows_only") for r in results.values())
    print(json.dumps(results, indent=1))
    print("ALL OK" if ok else "FAILURES PRESENT")

if __name__ == "__main__":
    main()
