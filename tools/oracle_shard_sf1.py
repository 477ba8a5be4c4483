#!/usr/bin/env python3
"""Sharded DuckDB oracle for the two rows whose brute pair CTE exceeds
single-query scratch on the x10 twin board (d_ngram_jaccard,
d_triangles) — validation tooling only, never an engine dependency.

The r10 attempt ran the textbook brute CTE (`sh x JOIN sh y ON x.s =
y.s`) and needed >79 GB scratch: char-4-grams have only ~1k distinct
values on this synthetic corpus, so the raw shingle join streams
sum(df^2) ~ 1.9e11 rows at x10. Two exact, lossless rewrites make it
feasible — both are algebra on the SAME brute-force definition, not the
engine's collapse trick (the oracle stays independent):

 1. Push the query's own pair bound into the join as an equi-key:
    - d_ngram_jaccard filters |n_chars diff| <= 10, so join on
      (shingle, length-block) with the a-side probing blocks
      {-1,0,+1}; every surviving pair still matches on exactly one
      probe, so COUNT(*) per (a,b) is unchanged.
    - d_triangles needs jaccard >= 0.7, which implies a shingle-count
      ratio >= 0.7, i.e. floor(log2 n) differs by at most 1 — same
      3-probe equi-join on (shingle, log2-size-block).
 2. Shard the join by a-side doc_id % K: each (a, b) pair (a < b)
    lives wholly in one shard, so per-shard GROUP BY counts are
    complete and shards union exactly; per-shard scratch is ~1/K.

Usage: python3 tools/oracle_shard_sf1.py <sfDir> <verifyOutDir> [workDir] [K]
  <verifyOutDir> must contain d_ngram_jaccard/ and d_triangles/ parquet
  written by graft.Verify against the same <sfDir>.
"""
import sys, os, glob, math, shutil
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


def compare(name, con, spark_dir, duck_sql):
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"MISS  {name}: no spark output at {spark_dir}")
        return False
    sp_df = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
    du_df = con.execute(duck_sql).df()
    if sorted(sp_df.columns) != sorted(du_df.columns):
        print(f"COLS  {name}: {sorted(sp_df.columns)} vs {sorted(du_df.columns)}")
        return False
    a = canon(list(sp_df.itertuples(index=False, name=None)), list(sp_df.columns))
    b = canon(list(du_df.itertuples(index=False, name=None)), list(du_df.columns))
    if len(a) != len(b):
        print(f"ROWS  {name}: spark={len(a)} duck={len(b)}")
        return False
    bad = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    if bad:
        i = bad[0]
        print(f"HASH  {name}: {len(bad)}/{len(a)} differ; first@{i}")
        print(f"      spark: {a[i][:200]}")
        print(f"      duck : {b[i][:200]}")
        return False
    print(f"PASS  {name} ({len(a)} rows)")
    return True


def fresh_con(db, work):
    con = duckdb.connect(db)
    con.execute(f"SET temp_directory='{work}/duck_tmp'")
    con.execute("SET memory_limit='48GB'")
    con.execute("SET preserve_insertion_order=false")
    return con


def main(sf_dir, out_dir, work="/tmp/oracle_shard_work", k_char=16, k_word=4):
    os.makedirs(work, exist_ok=True)
    db = f"{work}/shard.duckdb"
    if os.path.exists(db):
        os.remove(db)
    docs = f"{sf_dir}/documents.parquet"
    if os.path.isdir(docs):
        docs = f"{docs}/*.parquet"

    # ---- shared base tables (persisted once in the duckdb file) ----
    con = fresh_con(db, work)
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")
    print("building char-4-gram table ...", flush=True)
    con.execute("""
      CREATE TABLE ch AS
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
          unnest(list_transform(generate_series(1, len(text) - 3),
                                i -> substr(text, i, 4))) AS s
        FROM documents)""")
    con.execute("""
      CREATE TABLE ch_cnt AS
      SELECT doc_id, COUNT(*) AS n FROM ch GROUP BY doc_id""")
    con.execute("""
      CREATE TABLE chl AS
      SELECT ch.doc_id, ch.s, d.n_chars,
             CAST(floor(d.n_chars / 10) AS BIGINT) AS blk
      FROM ch JOIN documents d USING (doc_id)""")
    print("building word-3-gram table ...", flush=True)
    con.execute("""
      CREATE TABLE wd AS
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
          unnest(list_transform(generate_series(1, len(ws) - 2),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))""")
    con.execute("""
      CREATE TABLE wd_cnt AS
      SELECT doc_id, COUNT(*) AS n FROM wd GROUP BY doc_id""")
    con.execute("""
      CREATE TABLE wdl AS
      SELECT wd.doc_id, wd.s, c.n,
             CAST(floor(log2(c.n)) AS BIGINT) AS lblk
      FROM wd JOIN wd_cnt c USING (doc_id)""")
    con.close()

    # ---- d_ngram_jaccard: sharded length-blocked inter ----
    ngram_dir = f"{work}/ngram_shards"
    shutil.rmtree(ngram_dir, ignore_errors=True)
    os.makedirs(ngram_dir)
    for k in range(k_char):
        con = fresh_con(db, work)
        con.execute(f"""
          COPY (
            WITH probe AS (
              SELECT doc_id, s, n_chars, blk + d AS jblk
              FROM chl, (VALUES (-1), (0), (1)) t(d)
              WHERE doc_id % {k_char} = {k}),
            inter AS (
              SELECT p.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
              FROM probe p JOIN chl y
                ON y.s = p.s AND y.blk = p.jblk
               AND p.doc_id < y.doc_id
               AND abs(p.n_chars - y.n_chars) <= 10
              GROUP BY 1, 2)
            SELECT a, b,
              CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) AS jaccard
            FROM inter
            JOIN ch_cnt ca ON ca.doc_id = a
            JOIN ch_cnt cb ON cb.doc_id = b
            WHERE CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) >= 0.6
          ) TO '{ngram_dir}/shard_{k}.parquet' (FORMAT PARQUET)""")
        con.close()
        print(f"ngram shard {k+1}/{k_char} done", flush=True)

    # ---- d_triangles: sharded log2-blocked word pair graph ----
    pairs_dir = f"{work}/word_pair_shards"
    shutil.rmtree(pairs_dir, ignore_errors=True)
    os.makedirs(pairs_dir)
    for k in range(k_word):
        con = fresh_con(db, work)
        con.execute(f"""
          COPY (
            WITH probe AS (
              SELECT doc_id, s, n, lblk + d AS jblk
              FROM wdl, (VALUES (-1), (0), (1)) t(d)
              WHERE doc_id % {k_word} = {k}),
            inter AS (
              SELECT p.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
              FROM probe p JOIN wdl y
                ON y.s = p.s AND y.lblk = p.jblk
               AND p.doc_id < y.doc_id
               AND least(p.n, y.n) >= 0.7 * greatest(p.n, y.n)
              GROUP BY 1, 2)
            SELECT a, b
            FROM inter
            JOIN wd_cnt ca ON ca.doc_id = a
            JOIN wd_cnt cb ON cb.doc_id = b
            WHERE CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) >= 0.7
          ) TO '{pairs_dir}/shard_{k}.parquet' (FORMAT PARQUET)""")
        con.close()
        print(f"word pair shard {k+1}/{k_word} done", flush=True)

    # ---- tails + compare ----
    con = fresh_con(db, work)
    ok1 = compare("d_ngram_jaccard", con, f"{out_dir}/d_ngram_jaccard",
        f"""SELECT a, b, jaccard
            FROM read_parquet('{ngram_dir}/*.parquet')
            ORDER BY a, b""")
    ok2 = compare("d_triangles", con, f"{out_dir}/d_triangles",
        f"""WITH pairs AS (
              SELECT a, b FROM read_parquet('{pairs_dir}/*.parquet')),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM pairs e1
              JOIN pairs e2 ON e2.a = e1.b
              JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b),
            nodes AS (
              SELECT x AS node FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
            SELECT node AS doc_id, COUNT(*) AS n_triangles
            FROM nodes GROUP BY 1 ORDER BY 1""")
    con.close()
    print(f"\n{'2 pass' if ok1 and ok2 else 'FAIL'}")
    return 0 if ok1 and ok2 else 1


if __name__ == "__main__":
    a = sys.argv[1:]
    sys.exit(main(a[0], a[1],
                  a[2] if len(a) > 2 else "/tmp/oracle_shard_work",
                  int(a[3]) if len(a) > 3 else 16,
                  int(a[4]) if len(a) > 4 else 4))
