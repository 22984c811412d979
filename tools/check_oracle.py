#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run each oracle SQL
in DuckDB over the same parquet tables and compare (schema-sorted columns,
row-sorted values) against the Spark outputs that graft.Verify wrote.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.10g}"
    except Exception:
        pass
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"[MISS] {name}: no spark output dir")
            n_bad += 1
            continue
        try:
            duck = con.sql(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            n_bad += 1
            continue
        try:
            sp = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            scols = [d[0] for d in sp.description]
            srows = sp.fetchall()
        except Exception as e:
            print(f"[SPARK-ERR] {name}: {e}")
            n_bad += 1
            continue
        # driver's hasher is TYPE-sensitive (round-1 lesson: DuckDB HUGEINT /
        # DECIMAL(38,2) vs Spark BIGINT / DECIMAL(28,2) fail hash_match even
        # when rendered values agree) — compare arrow types too
        try:
            import pyarrow.parquet as _pq, glob as _glob
            dtypes = {f.name: str(f.type) for f in con.sql(sql).arrow().schema}
            sfile = sorted(_glob.glob(f"{spark_dir}/*.parquet"))[0]
            stypes = {f.name: str(f.type) for f in _pq.read_schema(sfile)}
            tdiff = {k: (stypes.get(k), dtypes.get(k))
                     for k in set(dtypes) | set(stypes)
                     if stypes.get(k) != dtypes.get(k)}
            if tdiff:
                print(f"[TYPE] {name}: spark vs duck type diffs: {tdiff}")
        except Exception as e:
            print(f"[TYPE-ERR] {name}: {e}")
        dc, dr = canon(drows, dcols)
        sc, sr = canon(srows, scols)
        if dc != sc:
            print(f"[SCHEMA] {name}: spark={sc} duck={dc}")
            n_bad += 1
        elif dr != sr:
            diffs = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
            print(f"[VALUES] {name}: rows spark={len(sr)} duck={len(dr)}, "
                  f"first diffs at {diffs[:3]}")
            for i in diffs[:2]:
                print(f"    spark: {sr[i]}")
                print(f"    duck : {dr[i]}")
            if len(sr) != len(dr):
                print(f"    spark head: {sr[:2]}")
                print(f"    duck  head: {dr[:2]}")
            n_bad += 1
        else:
            print(f"[OK] {name}: {len(sr)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
