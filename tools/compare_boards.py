#!/usr/bin/env python3
"""Compare two graft.Verify output boards row-by-row (validation tooling).

Usage: python3 tools/compare_boards.py <boardDirA> <boardDirB>

Same canonicalization as oracle_check.py (columns sorted by name,
floats rounded to .6g) so a multi-JVM board can be gated hash-identical
against a local-mode board without rerunning the DuckDB oracle.
"""
import sys, glob, math, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): vals.append("fNaN")
                else: vals.append(f"f{v:.6g}")
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    return sorted(out)

def load(con, qdir):
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        return None, None
    df = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
    return list(df.itertuples(index=False, name=None)), list(df.columns)

def main(a_dir, b_dir):
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    b_names = {d for d in os.listdir(b_dir)
               if os.path.isdir(os.path.join(b_dir, d))}
    n_pass = n_fail = 0
    for name in names:
        if name not in b_names:
            print(f"MISS  {name}: absent in {b_dir}"); n_fail += 1; continue
        ra, ca = load(con, os.path.join(a_dir, name))
        rb, cb = load(con, os.path.join(b_dir, name))
        if ra is None or rb is None:
            print(f"MISS  {name}: empty output dir"); n_fail += 1; continue
        if sorted(ca) != sorted(cb):
            print(f"COLS  {name}: {sorted(ca)} vs {sorted(cb)}")
            n_fail += 1; continue
        xa, xb = canon(ra, ca), canon(rb, cb)
        if xa != xb:
            bad = [i for i, (x, y) in enumerate(zip(xa, xb)) if x != y]
            where = f"first@{bad[0]}" if bad else f"rowcount {len(xa)} vs {len(xb)}"
            print(f"DIFF  {name}: {where}")
            n_fail += 1; continue
        print(f"PASS  {name} ({len(xa)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
