#!/usr/bin/env python3
"""Compare Spark bench timings against DuckDB running the oracle SQL on the
same tables. Usage: bench_compare.py <bench_json> <verify_out_dir> <sf_dir>"""
import json, sys, time
from pathlib import Path
import duckdb

bench = json.loads(Path(sys.argv[1]).read_text())
oracles = json.loads((Path(sys.argv[2]) / "oracle_sql.json").read_text())
sf = sys.argv[3]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
rows = []
for name, sec in sorted(bench["queries"].items()):
    if name not in oracles:
        rows.append((name, sec, None)); continue
    t0 = time.time()
    try:
        con.execute(oracles[name]).fetchall()
        rows.append((name, sec, time.time() - t0))
    except Exception as e:
        rows.append((name, sec, None))
tot_s = sum(r[1] for r in rows)
tot_d = sum(r[2] for r in rows if r[2])
print(f"{'query':24s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s}")
for n, s, d in sorted(rows, key=lambda r: -(r[1]/(r[2]+1e-9) if r[2] else 0)):
    print(f"{n:24s} {s:8.2f} {d if d else -1:8.2f} {(s/d if d else 0):7.1f}")
print(f"{'TOTAL':24s} {tot_s:8.2f} {tot_d:8.2f} {tot_s/tot_d:7.1f}")
