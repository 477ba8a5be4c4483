package graft

import org.apache.spark.sql.functions._

/** Stage decomposition of the blocked exact-ngram-Jaccard wall on a twin
  * board (r16 verdict item 1: the mutated ×100 `d_ngram_jaccard` row, at
  * 394 s, is the ladder's dominant row by 5× — is the wall the
  * block-candidate join, the verify kernel, or something upstream?).
  *
  * Times each internal boundary of [[graft.operators.TextDedup
  * .ngramJaccardPairs]] with everything upstream IDENTICAL to the
  * shipped plan (the frames come from the shared
  * `ngramBlockedInternals` — one definition, no drill-side
  * reimplementation):
  *
  *   - `est`      — the catalog's plan-sizing aggregate (also prints the
  *                  derived salt / shard / broadcast decisions)
  *   - `collapse` — exact-dup census + rep selection (count of reps)
  *   - `shingle`  — + charShingleHashes kernel over the reps
  *                  (sum of array sizes forces every hash)
  *   - `cand`     — + the salted block join, pair emission only
  *                  (count(1) over the candidate stream — pays scan,
  *                  exchanges, sort/merge and the join condition, NOT
  *                  the verify probes or the Jaccard kernel);
  *                  `cand:N` overrides the salt to N for sweeps
  *   - `full`     — the whole operator, catalog parameters (the board
  *                  row, minus the orderBy the bench strips anyway)
  *   - `hist[:PCT]` — exact-Jaccard deciles over a PCT% hash-sample of
  *                  the candidate stream (default 1%): the candidate
  *                  similarity DISTRIBUTION picks the verify cut — an
  *                  early-exit merge pays off on low-Jaccard candidate
  *                  mass, a pre-merge bound sketch on mid-Jaccard mass
  *
  * Same decomposition for the simhash family (r17, the ladder's #2
  * after the ngram cut) via `sim_base` (widened scan + word shingles +
  * collapse + signature/hashed-shingle materialization), `sim_cand`
  * (+ banded self-join, hamming filter, distinct — rides the
  * materialized base within one JVM, so its wall minus sim_base's is
  * the candidate stage), `sim_hist[:PCT]` (candidate jaccard deciles),
  * and `sim_full` (the catalog row)
  *
  * Stage wall differences attribute the row's cost: kernel+probes ≈
  * full − cand; emission ≈ cand − shingle. Single timed run per stage
  * (the multi-minute ×100 rows drown the ~5-9 s cold-JIT tax; cheap
  * stages run first, so the scan/shingle JIT is warm by the heavy ones).
  *
  * Usage: runMain graft.NgramWallSmoke <dir> <stage,stage,...>
  *   (stages from {est, collapse, shingle, cand[:SALT], full[:SALT]})
  */
object NgramWallSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val stages = args(1).split(",").toSeq
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.core.GraftSession.local(cpus, "graft-ngram-wall")
    val docs = graft.core.Tables.documents(spark, dir)
    import graft.operators.TextDedup
    // catalog parameters (DedupQueries d_ngram_jaccard)
    val (n, t, bw) = (4, 0.6, 20)
    // the estimate AND the derived plan come from the catalog's own
    // memoized derivation (review r17: an inline copy of the
    // salt/shards/bcast formulas would silently drift from the shipped
    // plan — the same hazard ngramBlockedInternals closed for the
    // frames). Lazy: stages that don't need them must not pay — or
    // time-pollute — the estimate aggregate at startup.
    lazy val est = graft.queries.DedupQueries.ngramEstStats(spark, dir)
    lazy val plan = graft.queries.DedupQueries.ngramPlan(spark, dir)
    lazy val saltDefault = plan._3
    def frames(salt: Int, hint: String = "merge") = {
      val (base, _, sh, blocked) = TextDedup.ngramBlockedInternals(
        docs, "doc_id", "text", col("n_chars"), n, bw)
      (base, sh, TextDedup.blockedCandJoin(blocked, "doc_id", bw, salt, hint))
    }
    def timed(label: String)(body: => String): Unit = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[ngramwall] $label%-14s ${(System.nanoTime() - t0) / 1e9}%9.2f s  $out")
    }
    stages.foreach { st =>
      val (stage, salt, hint) = st.split(":") match {
        case Array(s)       => (s, saltDefault, "merge")
        case Array(s, k)    => (s, k.toInt, "merge")
        case Array(s, k, h) => (s, k.toInt, h)
      }
      stage match {
        case "est" =>
          timed("est")(s"pairs=${est.candidatePairs} candBytes=${est.candidateBytes} " +
            s"shingleBytes=${est.shingleBytes} salt=${plan._3} " +
            s"shards=${plan._2} bcast=${plan._1}")
        case "collapse" =>
          timed("collapse")(s"reps=${frames(1)._1.count()}")
        case "shingle" =>
          timed("shingle") {
            val r = frames(1)._2.agg(sum(size(col("__sh")))).head()
            s"sumShingles=${if (r.isNullAt(0)) 0L else r.getLong(0)}"
          }
        case "cand" =>
          timed(s"cand:$salt:$hint")(
            s"candidates=${frames(salt, hint)._3.count()}")
        case "hist" =>
          // salt slot doubles as the sample percent for this stage
          val pct = if (st.contains(":")) salt else 1
          timed(s"hist:$pct%") {
            val (_, sh, cand) = frames(saltDefault)
            val sample = cand.filter(
              pmod(xxhash64(col("a"), col("b")), lit(100L)) < pct)
            val sa = broadcast(sh.select(col("doc_id").as("a"), col("__sh").as("__sha")))
            val sb = broadcast(sh.select(col("doc_id").as("b"), col("__sh").as("__shb")))
            val j = sample.join(sa, "a").join(sb, "b")
              .select(TextDedup.jaccardSorted(col("__sha"), col("__shb")).as("j"))
            val q = j.agg(
              count(lit(1)).as("n"),
              expr("approx_percentile(j, array(0.1,0.25,0.5,0.75,0.9,0.95,0.99), 1000)").as("q"),
              avg(col("j")).as("mean")).head()
            s"n=${q.getLong(0)} mean=${"%.3f".format(q.getDouble(2))} " +
              s"deciles=${q.getSeq[Double](1).map(d => "%.3f".format(d)).mkString(",")}"
          }
        case "sim_base" | "sim_sigs" | "sim_cand" | "sim_hist" | "sim_full" =>
          // catalog parameters (DedupQueries d_simhash)
          lazy val sim = TextDedup.simhashInternals(docs, "doc_id", "text",
            shingleN = 3, maxHamming = 15, numBands = 16, minShingles = 32)
          stage match {
            case "sim_base" =>
              timed("sim_base")(s"reps=${sim._1.count()}")
            case "sim_sigs" =>
              // would collapsing identical signatures cut the banded
              // join's within-bucket combos? Only if sig-groups are big
              timed("sim_sigs")(
                s"reps=${sim._1.count()} distinctSigs=${
                  sim._1.select(col("__sim")).distinct().count()}")
            case "sim_cand" =>
              timed("sim_cand")(s"candidates=${sim._4.count()}")
            case "sim_hist" =>
              val pct = if (st.contains(":")) salt else 1
              timed(s"sim_hist:$pct%") {
                val sh = sim._3
                val sample = sim._4.filter(
                  pmod(xxhash64(col("a"), col("b")), lit(100L)) < pct)
                val sa = broadcast(sh.select(col("doc_id").as("a"), col("__sh").as("__sha")))
                val sb = broadcast(sh.select(col("doc_id").as("b"), col("__sh").as("__shb")))
                val q = sample.join(sa, "a").join(sb, "b")
                  .select(TextDedup.jaccardSorted(col("__sha"), col("__shb")).as("j"))
                  .agg(count(lit(1)).as("n"),
                    expr("approx_percentile(j, array(0.1,0.25,0.5,0.75,0.9,0.95,0.99), 1000)").as("q"),
                    avg(col("j")).as("mean")).head()
                s"n=${q.getLong(0)} mean=${"%.3f".format(q.getDouble(2))} " +
                  s"deciles=${q.getSeq[Double](1).map(d => "%.3f".format(d)).mkString(",")}"
              }
            case "sim_full" =>
              timed("sim_full") {
                val pairs = graft.queries.DedupQueries
                  .queries("d_simhash")(spark, dir)
                s"pairs=${pairs.count()}"
              }
          }
        case "full" =>
          timed(s"full:$salt") {
            val (bcast, shards, _) = plan
            val pairs = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
              lenCol = col("n_chars"), n = n, threshold = t, blockWidth = bw,
              shards = shards, streamParallelism = salt,
              broadcastVerify = Some(bcast))
            s"pairs=${pairs.count()}"
          }
        case other => println(s"[ngramwall] unknown stage: $other")
      }
    }
    spark.stop()
  }
}
