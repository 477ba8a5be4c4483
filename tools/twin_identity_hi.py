#!/usr/bin/env python3
"""Exact-twin structural oracle for d_ngram_jaccard_hi at sf1 (r16) —
validation tooling only, never an engine dependency.

The hi row's textbook brute oracle (all-pairs char-4-gram Jaccard,
threshold 0.85, NO length band) is infeasible at the x10 twin board on
this token-poor corpus: ~1k distinct grams means the shingle self-join
streams sum(df^2) ~ 1.9e11 rows, and unlike d_ngram_jaccard there is no
length band to push into the join as an equi-key (the shingle-COUNT
ratio bound that replaces it yields only ~5 log2 size classes here —
no selectivity). Instead this check uses the x10 board's CONSTRUCTION:
every base doc appears as 10 byte-identical copies at ids shifted by
i*1e9, and Jaccard is a pure function of the two texts, so the exact
x10 answer is an algebraic consequence of the sf0.1 answer:

  - every sf0.1 qualifying pair (a, b, j) expands to the full 10x10
    copy grid (100 pairs, reoriented lexicographically, same j);
  - every base doc with len(text) >= 4 contributes its C(10,2) = 45
    intra-copy pairs at Jaccard exactly 1.0 (identical texts);
  - nothing else qualifies (a cross pair of copies of (a, b) has
    EXACTLY the base pair's Jaccard, so it qualifies iff the base
    does).

The prediction is built from the DRIVER-VERIFIED sf0.1 output (itself
DuckDB-oracled) plus the raw documents table — no engine machinery.
A PASS proves the engine's x10 answer value-for-value.

Usage: python3 tools/twin_identity_hi.py <sf01VerifyDir> <x10VerifyDir>
         [query] [docsParquet]
  (each dir must contain <query>/ parquet from graft.Verify; query
   defaults to d_ngram_jaccard_hi; the identity argument holds for ANY
   pair query whose qualification predicate is a pure function of the
   two texts — r17 uses it for d_ngram_jaccard_auto too: its band
   |len_a − len_b| <= 10 is also a pure text function, cross-copy
   pairs inherit the base pair's band verdict and intra-copy pairs
   have len diff 0. The sf0.1 documents table defaults to
   /root/testdata/sf0.1.)
"""
import sys, glob
import duckdb

G = 1000000000  # ScaleSmoke key offset


def main(sf01_dir, x10_dir, query="d_ngram_jaccard_hi",
         docs="/root/testdata/sf0.1/documents.parquet"):
    con = duckdb.connect()
    sf01 = glob.glob(f"{sf01_dir}/{query}/*.parquet")
    x10 = glob.glob(f"{x10_dir}/{query}/*.parquet")
    if not sf01 or not x10:
        print("MISS: verify outputs not found")
        return 1
    con.execute(f"CREATE TABLE base AS SELECT * FROM read_parquet({sf01!r})")
    con.execute(f"CREATE TABLE docs AS SELECT doc_id FROM read_parquet('{docs}') "
                "WHERE len(text) >= 4")
    con.execute(f"CREATE TABLE got AS SELECT * FROM read_parquet({x10!r})")
    con.execute(f"""
      CREATE TABLE pred AS
      SELECT least(a + i*{G}, b + k*{G}) AS a,
             greatest(a + i*{G}, b + k*{G}) AS b, jaccard
      FROM base, generate_series(0,9) s(i), generate_series(0,9) t(k)
      UNION ALL
      SELECT doc_id + i*{G}, doc_id + k*{G}, 1.0
      FROM docs, generate_series(0,9) s(i), generate_series(0,9) t(k)
      WHERE i < k""")
    n_pred, n_got = con.execute(
        "SELECT (SELECT count(*) FROM pred), (SELECT count(*) FROM got)").fetchone()
    d1 = con.execute("""SELECT count(*) FROM (
        SELECT a, b, round(jaccard, 9) j FROM pred
        EXCEPT SELECT a, b, round(jaccard, 9) j FROM got)""").fetchone()[0]
    d2 = con.execute("""SELECT count(*) FROM (
        SELECT a, b, round(jaccard, 9) j FROM got
        EXCEPT SELECT a, b, round(jaccard, 9) j FROM pred)""").fetchone()[0]
    ok = n_pred == n_got and d1 == 0 and d2 == 0
    print(f"predicted={n_pred} engine={n_got} pred-not-got={d1} got-not-pred={d2}")
    print(f"PASS {query} (exact-twin identity)" if ok else f"FAIL {query}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], *sys.argv[3:5]))
