#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare graft.Verify
parquet dumps against DuckDB running the oracle SQL on the same tables.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def t20_oracle(con, sf_dir):
    """Deflate has no DuckDB SQL twin, so the t20 reference is computed
    here with Python zlib — the SAME stream (zlib wrapper, level 6) as the
    engine's java.util.zip.Deflater(6); byte-size parity between the two
    implementations is pinned by CompressRatioSpec and was re-verified
    empirically (identical sizes on repetitive/short/empty/long inputs)."""
    import zlib
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").df()
    rows = []
    for doc_id, text in docs.itertuples(index=False, name=None):
        raw = text.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        # mirror the engine's math.rint(x*10000)/10000 (round-half-even)
        ratio = float(round(comp / max(len(raw), 1) * 10000)) / 10000
        rows.append((doc_id, len(raw), comp, ratio,
                     1 if ratio < 0.35 else 0))
    return pd.DataFrame(rows, columns=[
        "doc_id", "n_bytes", "n_compressed", "ratio", "repetitive"])


# queries whose reference is not expressible in DuckDB SQL: computed in
# Python instead, hash-compared exactly like the SQL oracles
PY_ORACLES = {"t20_compress_ratio": t20_oracle}


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    # non-SQL-expressible ops (PY_ORACLES) land in a SIBLING <out>_local
    # dir — Verify keeps them out of the driver-scanned tree, but the
    # local gate still hash-compares them against Python references
    local_dir = Path(str(out_dir).rstrip("/") + "_local")
    qdirs = sorted(p for p in out_dir.iterdir() if p.is_dir())
    if local_dir.is_dir():
        qdirs += sorted(p for p in local_dir.iterdir() if p.is_dir())
    for qdir in qdirs:
        name = qdir.name
        got = pd.read_parquet(qdir)
        if name not in oracles and name not in PY_ORACLES:
            print(f"{name}: NO-ORACLE rows={len(got)}")
            continue
        try:
            if name in PY_ORACLES:
                exp = PY_ORACLES[name](con, sf_dir)
            else:
                exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {e}")
            n_fail += 1
            continue
        gc, gr = canon(got)
        ec, er = canon(exp)
        if gc != ec:
            print(f"{name}: FAIL schema {gc} != {ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            diff = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            extra_g = [r for r in gr if r not in set(er)][:3]
            extra_e = [r for r in er if r not in set(gr)][:3]
            print(f"{name}: FAIL rows got={len(gr)} exp={len(er)}")
            for a, b in diff:
                print(f"    got {a}\n    exp {b}")
            if extra_g:
                print(f"    only-in-got: {extra_g}")
            if extra_e:
                print(f"    only-in-exp: {extra_e}")
        else:
            n_pass += 1
            print(f"{name}: PASS rows={len(gr)}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
