package graft

import org.apache.spark.sql.functions._

/** A/B of the LSH broadcast-verify ESTIMATE on a high-duplication corpus
  * (r16 verdict item 4 / ADVICE): the r16 `lshBcast` estimated the
  * verify side PRE-collapse (8 bytes per word 3-gram over the raw
  * corpus) — on exactly the corpus the exact-dup collapse exists for (a
  * re-crawl where most docs are byte-identical copies) the raw estimate
  * exceeds the broadcast budget by the copy count while the
  * post-collapse side fits, so the old form silently refuses the
  * broadcast and the verify falls off the planner's 50 MB cliff into
  * sort-merge joins carrying two shingle arrays per candidate.
  *
  * The drill BUILDS that corpus — K byte-identical, id-shifted copies of
  * a source documents table (default: the mutated ×100 board, so the
  * collapsed side is ~500k DISTINCT docs ≈ 230 MB of arrays: big enough
  * that the planner will NOT silently broadcast it, small enough that
  * the budget admits it) — then runs `minhashLshPairs` once under each
  * estimate's decision and prints walls + output counts (which must be
  * identical: the override changes the plan, never the answer).
  *
  * Usage: runMain graft.LshBudgetSmoke [srcDir] [K] [variant,variant]
  *   variants from {old, new}; corpus cached at
  *   /tmp/graft_hd<K>_docs (rebuild by deleting the _DONE marker).
  */
object LshBudgetSmoke {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/tmp/graft_scale_m100"
    val k = if (args.length > 1) args(1).toInt else 10
    val variants = (if (args.length > 2) args(2) else "old,new").split(",").toSeq
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_hd${k}_docs"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.core.GraftSession.local(cpus, "graft-lsh-budget")
    val done = new java.io.File(s"$out/_DONE_$k")
    if (!done.exists()) {
      val base = graft.core.Tables.documents(spark, src)
        .select(col("doc_id"), col("text"))
      // per-copy shift MUST clear the source's id space: a ×K twin
      // board's ids already occupy d + j·1e9 for j < K_src (ScaleSmoke
      // Offset), so m100 ids reach ~1e11 — a 2e9 shift would collide
      // copy (i, j) with (i−1, j+2), binding one doc_id to two
      // different texts (review r17). 1e12 clears any board this drill
      // points at; the build asserts it.
      val shift = 1000000000000L
      val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
      require(maxId < shift, s"source ids reach $maxId >= shift $shift")
      val copies = (0 until k).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i.toLong * shift)))
      copies.reduce(_ unionAll _).write.mode("overwrite")
        .parquet(s"$out/documents.parquet")
      done.getParentFile.mkdirs(); done.createNewFile()
    }
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val budget = graft.operators.TextDedup.ngramBroadcastBudgetBytes
    // r16 form: pre-collapse, arrays only
    val rawBytes = {
      val r = docs.agg(sum(greatest(size(split(col("text"), " ")) - 2, lit(0))
        .cast("long"))).head()
      (if (r.isNullAt(0)) 0L else r.getLong(0)) * 8L
    }
    // r17 form — THE CATALOG'S OWN estimator (shared helper, so the A/B
    // measures the formula the shipped decision uses; an inline copy
    // would silently drift). The corpus dir doubles as a documents
    // table dir for it. (The r16 form above stays inline: it no longer
    // exists in the catalog — it IS the historical baseline.)
    val newBytes = graft.queries.DedupQueries.lshBcastBytes(spark, out)
    val oldDecision = rawBytes <= budget
    val newDecision = newBytes <= budget
    println(s"[lshbudget] budget=$budget rawEst=$rawBytes -> bcast=$oldDecision; " +
      s"collapsedEst=$newBytes -> bcast=$newDecision")
    variants.foreach { v =>
      val decision = if (v == "old") oldDecision else newDecision
      val t0 = System.nanoTime()
      val pairs = graft.operators.TextDedup.minhashLshPairs(docs, "doc_id",
        "text", shingleN = 3, threshold = 0.7,
        broadcastVerify = Some(decision)).count()
      println(f"[lshbudget] variant=$v bcast=$decision " +
        f"${(System.nanoTime() - t0) / 1e9}%9.2f s  pairs=$pairs")
    }
    spark.stop()
  }
}
