#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [skip1,skip2]

For each query dir under verifyOutDir: read the Spark parquet result, run
the oracle SQL from oracle_sql.json in DuckDB against the sfDir parquet
tables, sort columns by name, round doubles, and compare row-by-row.
The optional third arg names queries to SKIP (comma-separated) — used on
×10-scale boards for the two rows whose brute pair CTE exceeds DuckDB
scratch (d_ngram_jaccard, d_triangles); those run through the exact
sharded rewrite in oracle_shard_sf1.py instead.
This is validation tooling only — the engine itself has no Python.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name; stringify with rounding for floats
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                # "f" prefix keeps float-typed values distinct from ints even
                # when integral (42.0 vs 42) — matching the driver's type
                # sensitivity — while .6g retains cross-engine float tolerance.
                if math.isnan(v): vals.append("fNaN")
                else: vals.append(f"f{v:.6g}")
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    return out

def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written scale dirs (ScaleSmoke) are directories of part
        # files; the driver's testdata is single files. Accept both.
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if name in skip:
            print(f"SKIP  {name} (sharded oracle — see oracle_shard_sf1.py)")
            continue
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark output"); n_fail += 1; continue
        # Fetch via pandas like the driver does: DuckDB HUGEINT becomes
        # float64 there, so an un-CAST integer SUM formats as "4.2e+01"-style
        # float while Spark's BIGINT stays "42" — replicating the driver's
        # hash sensitivity to HUGEINT/DOUBLE vs BIGINT (while INT32 vs INT64
        # still compare equal, as the driver treats them).
        try:
            sp_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()
            sp = list(sp_df.itertuples(index=False, name=None))
            sp_cols = list(sp_df.columns)
            du_df = con.execute(oracles[name]).df()
            du = list(du_df.itertuples(index=False, name=None))
            du_cols = list(du_df.columns)
        except Exception as e:
            print(f"ERR   {name}: {e}"); n_fail += 1; continue
        if sorted(sp_cols) != sorted(du_cols):
            print(f"COLS  {name}: spark={sorted(sp_cols)} duck={sorted(du_cols)}")
            n_fail += 1; continue
        a, b = canon(sp, sp_cols), canon(du, du_cols)
        if len(a) != len(b):
            print(f"ROWS  {name}: spark={len(a)} duck={len(b)}"); n_fail += 1; continue
        diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
        if diff:
            i = diff[0]
            print(f"HASH  {name}: {len(diff)}/{len(a)} rows differ; first@{i}:")
            print(f"      spark: {a[i][:200]}")
            print(f"      duck : {b[i][:200]}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(a)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  skip=set(sys.argv[3].split(",")) if len(sys.argv) > 3 else ()))
