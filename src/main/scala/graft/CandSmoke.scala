package graft

import org.apache.spark.sql.functions._

/** Candidate-volume gate for the candidate-proportional rows — makes
  * "candidate-proportional" a MEASURED claim, not an asserted one
  * (round-9 verdict item 3): prints raw and distinct candidate-pair
  * counts for the PassJoin edit-distance blocking and the SRP-LSH band
  * join at 1× and K×, alongside the query wall times ScaleSmoke reports
  * for the same rows. The runtime-vs-candidate comparison is the scale
  * contract: a candidate-proportional operator's K× wall ratio should
  * track its K× candidate ratio, not its K× row ratio.
  *
  * Note ScaleSmoke's K× copies are byte-identical (the worst realistic
  * dedup shape): every vector/doc gains K−1 exact twins, so every band
  * bucket holds K× members and candidate volume grows ~K² within
  * buckets — the counts printed here are exactly that blowup, measured.
  *
  * Usage: runMain graft.CandSmoke [srcSfDir] [K] [outDirOverride]
  *
  * `outDirOverride` points the K× leg at an already-built twin dir (e.g.
  * the mutated-twin board `/tmp/graft_scale_m10`) instead of
  * building/reusing the exact-twin dir.
  */
object CandSmoke {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 100
    val override_ = args.length > 2
    val out =
      if (override_) {
        // an override dir is a PRE-BUILT board (e.g. the mutated twins);
        // require its completion marker rather than silently building
        // EXACT twins into a path whose name promises something else —
        // wrong K or a partial build must fail fast, not mislabel counts
        require(new java.io.File(s"${args(2)}/_DONE_$k").exists(),
          s"override dir ${args(2)} lacks _DONE_$k — wrong K or partial " +
            "build; refusing to overwrite it with exact twins")
        args(2)
      } else s"${System.getProperty("java.io.tmpdir")}/graft_scale_x$k"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.core.GraftSession.local(cpus, "graft-cand-smoke")
    if (!override_) ScaleSmoke.build(spark, src, out, k)
    println(f"${"dir"}%-34s ${"pj_raw"}%12s ${"pj_pairs"}%12s ${"srp_raw"}%12s ${"srp_pairs"}%12s")
    Seq(src, out).foreach { dir =>
      val docs = graft.core.Tables.documents(spark, dir)
      val pj = graft.operators.TextDedup.passJoinCandidates(
        docs, "doc_id", "text", maxEdits = 5, headLen = 40,
        lengthBand = 10, lenCol = Some("n_chars"))
      val pjRaw = pj.count()
      val pjPairs = pj.select("a", "b").distinct().count()
      val emb = graft.core.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val srpRaw = graft.operators.VectorSim.srpCandidates(
        emb, "vec_id", "embedding", dims = 64, dedup = false).count()
      val srpPairs = graft.operators.VectorSim.srpCandidates(
        emb, "vec_id", "embedding", dims = 64).count()
      println(f"$dir%-34s $pjRaw%12d $pjPairs%12d $srpRaw%12d $srpPairs%12d")
    }
    spark.stop()
  }
}
