#!/usr/bin/env python3
"""Dev-only self-check of the DuckDB oracle loop (mimics the driver's
CORRECTNESS gate). Not part of the Scala deliverable.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def tclass(t):
    """Collapse a DuckDB type string into the equivalence class the DRIVER's
    hash actually distinguishes. Empirically (CORRECTNESS_r08): INTEGER vs
    BIGINT and DECIMAL(2,1) vs DOUBLE both hash-MATCH, while HUGEINT vs
    BIGINT hash-FAILS (q103) — consistent with a pandas conversion where
    every <=64-bit signed int lands as an integer dtype but HUGEINT and
    DECIMAL land as float64. A value-only gate is blind to the q103 bug
    class (HUGEINT fetches as plain Python int, so cell_eq passes); a
    fully-strict gate flags 9 queries the driver accepts. This class map
    reproduces the driver's verdict on all 107 oracled queries."""
    t = t.upper()
    if t.endswith("[]"):
        return tclass(t[:-2]) + "[]"
    if t.startswith("DECIMAL") or t in ("FLOAT", "REAL", "DOUBLE", "HUGEINT"):
        return "float"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "int"
    return t


def canon(con, rel_sql):
    """(cols, type-classes, rows): columns sorted by name, driver-visible
    type class per column (see tclass), rows sorted."""
    cur = con.sql(rel_sql)
    cols = sorted(cur.columns)
    sel = ", ".join(f'"{c}"' for c in cols)
    canon_rel = con.sql(f"SELECT {sel} FROM ({rel_sql}) ORDER BY ALL")
    types = [tclass(str(t)) for t in canon_rel.types]
    return cols, types, canon_rel.fetchall()


def cell_eq(a, b):
    # STRICT bit equality — the driver's gate hash-compares values, so a
    # tolerance here would hide real failures. (All 44 oracled queries are
    # bit-equal thanks to the exactSum quantization pattern.)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        res_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_files:
            print(f"MISS  {name}: no spark result parquet")
            fail += 1
            continue
        try:
            scols, stypes, srows = canon(con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            ocols, otypes, orows = canon(con, sql)
        except Exception as e:
            print(f"ERR   {name}: {e}")
            fail += 1
            continue
        if scols != ocols:
            print(f"SCHEMA {name}: spark={scols} oracle={ocols}")
            fail += 1
            continue
        if stypes != otypes:
            diff = [(c, s, o) for c, s, o in zip(scols, stypes, otypes) if s != o]
            print(f"TYPE  {name}: {diff} (spark vs oracle)")
            fail += 1
            continue
        if len(srows) != len(orows):
            print(f"ROWS  {name}: spark={len(srows)} oracle={len(orows)}")
            fail += 1
            continue
        bad = None
        for i, (sr, orr) in enumerate(zip(srows, orows)):
            if not all(cell_eq(a, b) for a, b in zip(sr, orr)):
                bad = (i, sr, orr)
                break
        if bad:
            print(f"VALUE {name}: row {bad[0]}\n  spark : {bad[1]}\n  oracle: {bad[2]}")
            fail += 1
        else:
            print(f"OK    {name} ({len(srows)} rows)")
            ok += 1
    # queries without oracle: rows-only check
    for name in sorted(set(
            p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if "." not in p.split("/")[-1])
            - set(oracle)):
        n = len(glob.glob(f"{out_dir}/{name}/*.parquet"))
        print(f"NOORACLE {name}: parquet files={n}")
    print(f"\n{ok} ok / {fail} fail / {len(oracle)} oracled")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
