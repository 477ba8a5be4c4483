package graft

import org.apache.spark.sql.functions._

/** Blocked-vs-prefix candidate measurement for exact n-gram Jaccard
  * (r15, verdict item 3): the claim that prefix filtering (PPJoin) wins
  * on NATURAL text — Zipfian token frequencies, wide length spread —
  * while the length-blocked plan wins on the synthetic corpus was
  * asserted in scaladoc since r3 but never measured on a natural-shape
  * corpus. This main measures it: for each input dir it counts
  *
  *   - blocked candidates ([[graft.operators.TextDedup.ngramBlockedCandidates]],
  *     the pre-verify pair volume the length-blocked join stages), and
  *   - prefix candidates ([[graft.operators.TextDedup.ngramPrefixCandidates]],
  *     raw + distinct — the PPJoin family's pre-verify volume), and
  *   - true pairs at the threshold (prefix path's verified output —
  *     NOTE: the blocked operator's contract additionally requires
  *     |Δlen| ≤ blockWidth/2, so its output is a subset on corpora
  *     where near-dups drift in length),
  *
  * on the base sf dir (synthetic shape) and on a natural-shape twin
  * board built by ScaleSmoke's `shape` mode (Zipf tokens, lognormal
  * lengths, ×K near-dup copies). The routing rule the numbers back:
  * candidates(prefix) ≪ candidates(blocked) on natural text — route to
  * PPJoin; the reverse on token-poor/homogeneous corpora — route to
  * blocked.
  *
  * Usage: runMain graft.NgramRouteSmoke [srcSfDir] [K]
  *    or:  runMain graft.NgramRouteSmoke dirs <dir> [dir...]
  *         (measure pre-built boards — e.g. the mutated m30/m100 twins —
  *         without building anything; `counts` instead of `dirs` skips
  *         the prefix/true columns, for boards where only the blocked
  *         candidate count is wanted)
  */
object NgramRouteSmoke {
  def main(args: Array[String]): Unit = {
    val dirsMode = args.nonEmpty && (args(0) == "dirs" || args(0) == "counts")
    val countsOnly = args.nonEmpty && args(0) == "counts"
    // threshold axis for the routing table: prefix size is
    // |A| − ceil(t·|A|) + 1, so t is the lever that decides whether the
    // prefix contains only genuinely rare shingles (high t) or 40% of
    // the doc (the catalog's t=0.6)
    val threshold = sys.env.get("SPARK_GRAFT_ROUTE_THRESHOLD")
      .flatMap(_.toDoubleOption).getOrElse(0.6)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.core.GraftSession.local(cpus, "graft-ngram-route-smoke")
    val dirs: Seq[String] =
      if (dirsMode) args.drop(1).toSeq
      else {
        val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
        val k = if (args.length > 1) args(1).toInt else 30
        val out = s"${System.getProperty("java.io.tmpdir")}/graft_scale_z$k"
        ScaleSmoke.build(spark, src, out, k, mutate = true, shape = true)
        Seq(src, out)
      }
    println(f"${"dir"}%-30s ${"docs"}%8s ${"grams4"}%10s ${"blocked"}%14s " +
      f"${"prefix_raw"}%14s ${"prefix_pairs"}%14s ${"true_pairs"}%12s")
    dirs.foreach { dir =>
      val docs = graft.core.Tables.documents(spark, dir)
      val nDocs = docs.count()
      val grams = docs
        .select(explode(graft.operators.TextDedup.charShingles(col("text"), 4)).as("g"))
        .agg(approx_count_distinct(col("g"))).head().getLong(0)
      def cnt(df: org.apache.spark.sql.DataFrame): Long = df.count()
      val blocked = cnt(graft.operators.TextDedup.ngramBlockedCandidates(
        docs, "doc_id", "text", lenCol = col("n_chars"), n = 4, blockWidth = 20))
      val (prefRaw, prefPairs, truePairs) =
        if (countsOnly) (-1L, -1L, -1L)
        else (
          cnt(graft.operators.TextDedup.ngramPrefixCandidates(
            docs, "doc_id", "text", n = 4, threshold = threshold)),
          cnt(graft.operators.TextDedup.ngramPrefixCandidates(
            docs, "doc_id", "text", n = 4, threshold = threshold).distinct()),
          cnt(graft.operators.TextDedup.ngramJaccardPairsPrefix(
            docs, "doc_id", "text", n = 4, threshold = threshold)))
      println(f"$dir%-30s $nDocs%8d $grams%10d $blocked%14d " +
        f"$prefRaw%14d $prefPairs%14d $truePairs%12d")
    }
    spark.stop()
  }
}
