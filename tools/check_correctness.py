#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given SF dir, then execute each oracle_sql.json entry in DuckDB over the
same parquet tables and compare (row count, schema column names, sorted
value hash). Usage: python3 tools/check_correctness.py [sfDir] [outDir]
(assumes Verify has already written outDir)."""
import sys, json, glob, hashlib
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def fmt(v):
        if isinstance(v, float):
            return "%.9g" % v
        return str(v)
    lines = sorted(",".join(fmt(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return h, len(rows)

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        scols = [d[0] for d in spark_rel.description]
        srows = spark_rel.fetchall()
        duck_rel = con.execute(sql)
        dcols = [d[0] for d in duck_rel.description]
        drows = duck_rel.fetchall()
        sh, sn = canon(srows, scols)
        dh, dn = canon(drows, dcols)
        ok = sorted(scols) == sorted(dcols) and sh == dh
        status = "OK  " if ok else "FAIL"
        if not ok:
            fails += 1
            print(f"{status} {name}: rows {sn}/{dn} cols {sorted(scols)} "
                  f"vs {sorted(dcols)} hash {sh[:8]}/{dh[:8]}")
            if sorted(scols) == sorted(dcols) and sn == dn:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                a = sorted(tuple(r[i] for i in order) for r in srows)
                b = sorted(tuple(r[i] for i in order) for r in drows)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
                for x, y in diffs:
                    print(f"      spark={x}  duck={y}")
        else:
            print(f"{status} {name}: rows={sn} hash={sh[:8]}")
    except Exception as e:
        fails += 1
        print(f"ERR  {name}: {e}")

sys.exit(1 if fails else 0)
