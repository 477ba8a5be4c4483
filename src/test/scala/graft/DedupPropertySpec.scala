package graft

import graft.operators.{TextDedup, Windows}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property tests: the bucketed operators must equal their brute-force /
  * single-task definitions on randomized corpora (fixed seeds — the
  * corpus is deterministic, so these are stable). */
class DedupPropertySpec extends SparkSpec {

  /** 200 random docs + 20 planted near-dup pairs (1-word edits of 60-120
    * word docs → Jaccard ≳ 0.9). Docs are deliberately NOT shorter:
    * simhash's Hamming ≤ 12 recall guarantee erodes below ~0.85 Jaccard
    * (a 1-word edit of a 30-word doc can land at Hamming 13+), which is
    * exactly why d_simhash ships with the widest banded tolerance. */
  private lazy val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(11)
    val vocab = Vector.tabulate(60)(i => s"w$i")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 200L).map(i => i -> doc(60 + rnd.nextInt(60)))
    val dups = (0 until 20).map { i =>
      val (_, text) = base(rnd.nextInt(base.size))
      val words = text.split(" ").toBuffer
      words(rnd.nextInt(words.size)) = vocab(rnd.nextInt(vocab.size)) // 1-word edit
      (200L + i) -> words.mkString(" ")
    }
    // exact twins: byte-identical copies at new ids — a copy of the
    // min-id doc, a TRIPLE group (7 twice), and 12 random copies. They
    // route every pair operator below through the collapseExactDups
    // path while the brute-force references keep scanning all copies.
    val twins = (Seq(0, 7, 7) ++ Seq.fill(12)(rnd.nextInt(base.size)))
      .zipWithIndex.map { case (src, i) => (300L + i) -> base(src)._2 }
    base ++ dups ++ twins
  }

  private def exactPairs(threshold: Double): Set[(Long, Long)] = {
    def shingles(t: String): Set[Seq[String]] =
      t.split(" ").sliding(3).map(_.toSeq).toSet
    val sh = corpus.map { case (id, t) => id -> shingles(t) }
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      inter = (sa & sb).size
      if inter > 0 && inter.toDouble / (sa | sb).size >= threshold
    } yield (a, b)).toSet
  }

  test("minhashLshPairs == driver-side brute-force exact Jaccard") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = TextDedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactPairs(0.7) && got.nonEmpty)
    // r16: the broadcastVerify override (family-wide verify-budget
    // discipline) is plan-only — both values produce the same pair set
    Seq(true, false).foreach { b =>
      val o = TextDedup.minhashLshPairs(docs, "doc_id", "text",
          shingleN = 3, threshold = 0.7, broadcastVerify = Some(b))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(o == got, s"broadcastVerify=Some($b) changed the pair set")
    }
  }

  test("simhashPairs == { pairs with Hamming <= maxHamming AND Jaccard >= t }") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = TextDedup.simhashPairs(docs, "doc_id", "text",
        shingleN = 3, maxHamming = 12, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the operator's exact contract: banded recall is guaranteed for
    // Hamming <= maxHamming (pigeonhole), then the exact-Jaccard filter
    val sims = docs
      .select(col("doc_id"),
        TextDedup.simhash64(TextDedup.wordShingles(col("text"), 3)).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = exactPairs(0.5).filter { case (a, b) =>
      java.lang.Long.bitCount(sims(a) ^ sims(b)) <= 12
    }
    assert(got == want && got.nonEmpty)
  }

  test("prefix-filter ngram join == brute-force exact pairs (recall proof)") {
    import spark.implicits._
    // char-4-gram ground truth over the word corpus
    def charShingles(t: String): Set[String] =
      t.sliding(4).toSet
    val want = (for {
      (a, ta) <- corpus; (b, tb) <- corpus if a < b
      sa = charShingles(ta); sb = charShingles(tb)
      inter = (sa & sb).size
      if inter > 0 && inter.toDouble / (sa ++ sb).size >= 0.6
    } yield (a, b)).toSet
    val got = TextDedup.ngramJaccardPairsPrefix(
        corpus.toDF("doc_id", "text"), "doc_id", "text", n = 4, threshold = 0.6)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("ngramJaccardPairsPrefix t=0.85: broadcast override is plan-only; collapse expands twins") {
    // r16 parity contract (VERDICT r15 #3/#4): the prefix path is the
    // documented route for t >= 0.85, wrapped in collapseExactDups and
    // carrying the same broadcastVerify override as the blocked path.
    // Both override values must produce the identical pair set (the
    // override changes plan shape only), equal to brute force — and the
    // corpus's exact-twin groups must surface as jaccard-1.0 pairs
    // through the collapse expansion.
    import spark.implicits._
    def charShingles(t: String): Set[String] = t.sliding(4).toSet
    val want = (for {
      (a, ta) <- corpus; (b, tb) <- corpus if a < b
      sa = charShingles(ta); sb = charShingles(tb)
      inter = (sa & sb).size
      if inter > 0 && inter.toDouble / (sa ++ sb).size >= 0.85
    } yield (a, b)).toSet
    val docs = corpus.toDF("doc_id", "text")
    def run(bcast: Boolean) = TextDedup.ngramJaccardPairsPrefix(
        docs, "doc_id", "text", n = 4, threshold = 0.85,
        broadcastVerify = Some(bcast))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val onB = run(bcast = true)
    val offB = run(bcast = false)
    assert(onB.map(r => (r._1, r._2)).toSet == want && want.nonEmpty)
    assert(onB.sortBy(r => (r._1, r._2)).toSeq ==
      offB.sortBy(r => (r._1, r._2)).toSeq)
    // the exact-twin pairs (0, 300) and (7's triple group) ride the
    // collapse's intra expansion at literal 1.0
    val byPair = onB.map(r => (r._1, r._2) -> r._3).toMap
    assert(byPair.get((0L, 300L)).contains(1.0))
    assert(byPair.get((301L, 302L)).contains(1.0))
  }

  test("asofJoin == brute-force latest-at-or-before on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // ~40% of right payloads null to stress atomic struct carry; right
    // rows unique per (key, ts) by construction
    val left = Seq.fill(400)((rnd.nextInt(20).toLong, rnd.nextInt(1000)))
      .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      .toDF("lid", "k", "t")
    val right = rnd.shuffle((0 until 1000).toList).take(300)
      .map { t =>
        (rnd.nextInt(20).toLong, t,
          if (rnd.nextBoolean()) s"p$t" else null,
          if (rnd.nextDouble() < 0.4) null else s"q$t")
      }.distinct.toDF("k", "rt", "rv1", "rv2")
        .dropDuplicates("k", "rt")
    val got = graft.operators.AsOf
      .asofJoin(left, right, Seq("k"), "t", "rt", Seq("rv1", "rv2"))
      .select("lid", "rv1", "rv2").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
      .toSet
    // brute force: for each left row take the max rt <= t, both payloads
    // from THAT row (nulls stay null — no backfill)
    val rightRows = right.collect()
      .map(r => (r.getLong(0), r.getInt(1), Option(r.getString(2)), Option(r.getString(3))))
    val want = left.collect().map { lr =>
      val (lid, k, t) = (lr.getLong(0), lr.getLong(1), lr.getInt(2))
      val m = rightRows.filter(rr => rr._1 == k && rr._2 <= t)
        .sortBy(_._2).lastOption
      (lid, m.flatMap(_._3), m.flatMap(_._4))
    }.toSet
    assert(got == want)
  }

  test("hashed-shingle jaccard == string-shingle jaccard on every pair") {
    // the round-4 verify path carries sorted 64-bit hash arrays instead
    // of string arrays; absent collisions (~k²/2⁶⁴) the Jaccard values
    // must be IDENTICAL doubles on every candidate pair
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val a = docs.alias("a"); val b = docs.alias("b")
    val pairs = a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(
        TextDedup.jaccard(
          TextDedup.charShingles(col("a.text"), 4),
          TextDedup.charShingles(col("b.text"), 4)).as("js"),
        TextDedup.jaccardSorted(
          TextDedup.charShingleHashes(col("a.text"), 4),
          TextDedup.charShingleHashes(col("b.text"), 4)).as("jh"),
        TextDedup.jaccardSorted(
          TextDedup.hashedShingles(TextDedup.wordShingles(col("a.text"), 3)),
          TextDedup.hashedShingles(TextDedup.wordShingles(col("b.text"), 3))).as("jw"),
        TextDedup.jaccard(
          TextDedup.wordShingles(col("a.text"), 3),
          TextDedup.wordShingles(col("b.text"), 3)).as("jws"))
    assert(pairs.filter(col("js") =!= col("jh") ||
      col("jw") =!= col("jws")).count() == 0)
    assert(pairs.filter(col("js") > 0.1).count() > 0) // non-degenerate
  }

  test("multi-probe IVF with nprobe = #cells == brute force (exhaustive probe)") {
    import graft.operators.VectorSim
    val emb = graft.core.Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 5)
    def key(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
      df.select("q_id", "rnk", "nn_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    val exhaustive = key(VectorSim.ivfCosineTopKMultiProbe(
      emb, q, "vec_id", "embedding", "label", k = 5, nprobe = 10))
    val brute = key(VectorSim.bruteForceCosineTopK(
      emb, q, "vec_id", "embedding", k = 5))
    assert(exhaustive == brute && brute.nonEmpty)
  }

  test("sq8 ANN recall vs brute force is monotone in oversample") {
    import graft.operators.VectorSim
    val emb = graft.core.Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 10)
    val brute = VectorSim.bruteForceCosineTopK(emb, q, "vec_id", "embedding", 5)
      .select("q_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalls = Seq(1, 2, 4).map { os =>
      val got = VectorSim.sq8CosineTopK(emb, q, "vec_id", "embedding", 5, os)
        .select("q_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & brute).size.toDouble / brute.size
    }
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in oversample: $recalls")
    assert(recalls.head > 0.5, s"sq8 candidate quality floor broken: $recalls")
    assert(recalls.last > 0.9, s"oversample=4 should be near-exhaustive: $recalls")
  }

  /** Reference reimplementation of NativeEval.winnowFingerprints. */
  private def bruteWinnow(text: String, k: Int = 5, w: Int = 8): Seq[Long] = {
    val cps = text.codePoints().toArray
    if (cps.length < k) return Seq.empty
    val M = 2147483647L
    val hs = (0 to cps.length - k).map { i =>
      (i until i + k).foldLeft(0L)((acc, j) => (acc * 31 + cps(j)) % M)
    }
    val nw = math.max(hs.length - w + 1, 1)
    (0 until nw).map(j => hs.slice(j, math.min(j + w, hs.length)).min)
      .distinct.sorted
  }

  test("winnowing: expression == reimplementation, pair join == shared-fp sets") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextDedup.winnowFingerprints(col("text"), 5, 8).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = corpus.map { case (id, t) => id -> bruteWinnow(t) }.toMap
    assert(got == want)

    val fpSets = want.view.mapValues(_.toSet).toMap
    val wantPairs = (for {
      (a, sa) <- fpSets; (b, sb) <- fpSets if a < b
      shared = (sa & sb).size if shared >= 3
    } yield (a, b, shared.toLong)).toSet
    val gotPairs = TextDedup.winnowPairs(docs, "doc_id", "text",
        k = 5, w = 8, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotPairs == wantPairs && gotPairs.nonEmpty)

    // the winnowing guarantee: a shared substring of >= w+k-1 = 12 chars
    // forces at least one shared fingerprint
    val shared = "the quick brown fox jumps"
    val g = Seq((1L, s"aaaa $shared zzzz"), (2L, s"qqqq $shared mmmm"))
      .toDF("doc_id", "text")
    assert(TextDedup.winnowPairs(g, "doc_id", "text", minShared = 1)
      .count() == 1)
  }

  test("dedupAgainstIndex == cross-side restriction of the all-pairs join") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val batchIds = corpus.map(_._1).filter(_ % 10 == 3).toSet
    val batch = docs.filter(col("doc_id") % 10 === 3)
    val index = TextDedup.buildMinhashIndex(
      docs.filter(col("doc_id") % 10 =!= 3), "doc_id", "text", shingleN = 3)
    def run(bcast: Option[Boolean]) = TextDedup.dedupAgainstIndex(batch, index,
        "doc_id", "text", shingleN = 3, threshold = 0.7,
        broadcastBatch = bcast)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run(Some(true))
    // ground truth: exact pairs with exactly one endpoint in the batch,
    // oriented (batch, corpus)
    val want = exactPairs(0.7).collect {
      case (a, b) if batchIds(a) && !batchIds(b) => (a, b)
      case (a, b) if !batchIds(a) && batchIds(b) => (b, a)
    }
    assert(got == want && got.nonEmpty)
    // r16: the broadcastBatch override is plan-only — the planner-shaped
    // fallback AND the default estimate path (None: a construction-time
    // bounded aggregate derives the decision) must produce the identical
    // pair set
    assert(run(Some(false)) == want)
    assert(run(None) == want)
  }

  test("multi-probe IVF recall vs brute force is monotone in nprobe") {
    import graft.operators.VectorSim
    val emb = graft.core.Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 20)
    def keys(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = keys(VectorSim.bruteForceCosineTopK(
      emb, q, "vec_id", "embedding", k = 10))
    val recalls = Seq(1, 2, 4).map { np =>
      val ann = keys(VectorSim.ivfCosineTopKMultiProbe(
        emb, q, "vec_id", "embedding", "label", k = 10, nprobe = np))
      np -> (ann & brute).size.toDouble / brute.size
    }
    // a true top-k neighbor found under a smaller probe set cannot leave
    // the top-k under a wider one (anything outranking it has higher
    // cosine, and globally only k-1 such items exist), so recall is
    // monotone in nprobe. The synthetic embeddings are label-uniform
    // (cells carry no semantic locality — measured own-cell recall
    // ≈ 0.13), so the curve should track ~nprobe/cells: assert monotone,
    // a sane floor, and strict growth by nprobe=4.
    recalls.sliding(2).foreach { case Seq((_, r1), (_, r2)) =>
      assert(r1 <= r2 + 1e-12, s"recall not monotone: $recalls")
    }
    assert(recalls.head._2 > 0.02 && recalls.last._2 > recalls.head._2,
      s"recall curve degenerate: $recalls")
  }

  test("globalRowNumber / scalableNtile == single-task window equivalents") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(5000)((rnd.nextInt(1000), rnd.nextLong())).zipWithIndex
      .map { case ((v, salt), i) => (i.toLong, v, salt) }
      .toDF("id", "v", "salt")
    val order = Seq(col("v"), col("id"))

    val gotRank = Windows.globalRowNumber(df, order, "rn")
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val wantRank = df.withColumn("rn",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotRank == wantRank)

    // k=1 (degenerate single tile) and k=6000 > n (size==0 branch:
    // every row is its own tile) are the arithmetic edge cases
    for (k <- Seq(1, 3, 4, 7, 16, 6000)) {
      val got = Windows.scalableNtile(df, order, k, "tile")
        .select("id", "tile").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val want = df.withColumn("tile", ntile(k).over(Window.orderBy(order: _*)))
        .select("id", "tile").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(got == want, s"ntile($k) mismatch")
    }

    // duplicate ORDER keys (ties): per-row assignment is engine-choice,
    // but rows of equal v occupy a contiguous index range under any
    // stable order, so the per-KEY histogram of (v, tile) counts is
    // fully determined — compare it, not just tile sizes (tile sizes
    // alone are a function of n and k and would pass a ntile that
    // routes the wrong keys into each tile)
    val dup = Seq.tabulate(997)(i => (i.toLong, i % 7)).toDF("id", "v")
    for (k <- Seq(2, 5, 32)) {
      def hist(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("v", "tile").count().collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val got = hist(Windows.scalableNtile(dup, Seq(col("v")), k, "tile"))
      val want = hist(dup.withColumn("tile",
        ntile(k).over(Window.orderBy(col("v")))))
      assert(got == want, s"tie-case ntile($k) (v, tile) histogram mismatch")
    }
  }

  test("bloom-gated markNew == brute-force set membership on random corpora") {
    import graft.operators.BloomIndex
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // 5 randomized rounds, varying sizes and overlap rates, incl. an
    // empty batch and a fully-duplicated batch
    val shapes = Seq((500, 100, 0.3), (50, 200, 0.0), (300, 0, 0.5),
      (120, 120, 1.0), (1, 1, 1.0))
    for (((nCorpus, nBatch, dupRate), round) <- shapes.zipWithIndex) {
      val corpusTexts = (0 until nCorpus).map(i => s"r$round corpus $i ${rnd.nextInt(1000)}")
      val batchTexts = (0 until nBatch).map { i =>
        if (rnd.nextDouble() < dupRate && corpusTexts.nonEmpty)
          corpusTexts(rnd.nextInt(corpusTexts.size))
        else s"r$round fresh $i ${rnd.nextInt(1000)}"
      }
      val hashOf = when(col("text").isNotNull, xxhash64(col("text")))
      val idx = corpusTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text").withColumn("__h", hashOf).select("id", "__h")
      val batch = batchTexts.zipWithIndex.map { case (t, i) => (10000L + i, t) }
        .toDF("id", "text").withColumn("__h", hashOf)
      val bf = BloomIndex.buildLongBloom(idx, "__h", fpp = 0.05)
      val marked = BloomIndex.markNewAgainstHashIndex(batch, "id", "__h",
          idx, BloomIndex.broadcastBloom(spark, bf))
        .select("id", "is_new").as[(Long, Boolean)].collect().toMap
      val corpusSet = corpusTexts.toSet
      batchTexts.zipWithIndex.foreach { case (t, i) =>
        val want = !corpusSet.contains(t)
        assert(marked(10000L + i) == want,
          s"round $round: '$t' marked ${marked(10000L + i)}, want $want")
      }
    }
  }

  test("passageScrub == driver-side reference on randomized planted corpora") {
    // semantic proof independent of the DuckDB replica: random docs
    // (incl. sub-block and empty), planted block-aligned shared passages,
    // and exact copies — the scrubbed frame must equal a straightforward
    // driver-side reimplementation of keep-first block dedup, token for
    // token
    import spark.implicits._
    val B = 10
    val rnd = new scala.util.Random(77)
    val vocab = Vector.tabulate(30)(i => s"v$i")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 120L).map(i => i -> doc(rnd.nextInt(46)))
    val shared = doc(B) // one 10-token passage planted at aligned offsets
    val planted = (0 until 15).map { i =>
      val pre = doc(B * rnd.nextInt(3)) // 0/10/20 tokens -> stays aligned
      val post = doc(rnd.nextInt(25))
      (200L + i) -> Seq(pre, shared, post).filter(_.nonEmpty).mkString(" ")
    }
    val copies = (0 until 10).map(i => (300L + i) -> base(rnd.nextInt(base.size))._2)
    val corpus = base ++ planted ++ copies

    // driver-side reference
    val occ = for {
      (id, t) <- corpus
      toks = t.split(" ")
      k <- 0 until toks.length / B
    } yield (id, k, toks.slice(k * B, k * B + B).mkString(" "))
    val removed: Set[(Long, Int)] = occ.groupBy(_._3).values.flatMap { os =>
      if (os.map(_._1).distinct.size >= 2) {
        val first = os.minBy(o => o._1 * 1000000L + o._2)
        os.filterNot(o => (o._1, o._2) == ((first._1, first._2)))
          .map(o => (o._1, o._2))
      } else Nil
    }.toSet
    val expected = corpus.map { case (id, t) =>
      val toks = t.split(" ")
      val nblk = toks.length / B
      val keptBlocks = (0 until nblk).filterNot(k => removed((id, k)))
        .flatMap(k => toks.slice(k * B, k * B + B))
      val tail = toks.drop(nblk * B).toSeq
      id -> ((nblk.toLong, (0 until nblk).count(k => removed((id, k))).toLong,
        keptBlocks ++ tail))
    }.toMap

    val got = TextDedup.passageScrub(corpus.toDF("doc_id", "text"),
        "doc_id", "text", B)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[String](3)))).toMap
    assert(got.keySet == expected.keySet)
    for ((id, exp) <- expected)
      assert(got(id) == exp, s"doc $id: got ${got(id)}, want $exp")
    // the planted passage must survive exactly once across the corpus
    val survivors = got.values.map(_._3.mkString(" "))
      .count(_.contains(shared))
    assert(removed.nonEmpty && survivors >= 1)
  }

  test("PassJoin pigeonhole blocking is lossless for ed<=5 head pairs") {
    // randomized replica of t_edit_distance's candidate generation
    // (TextQueries "t_edit_distance"): any doc pair inside the oracle's
    // semantics (|n_chars diff| <= 10, levenshtein of 40-char heads <= 5)
    // must be admitted by segments(a) ⋈ probes(b) (both heads full) or by
    // the short-head fallback pool (min length < 40, both <= 49).
    // Pure-driver property: the claim is about the blocking scheme's
    // combinatorics, not the Spark plan (the plan is oracle-hash-proven).
    val segStarts = Seq(1, 8, 15, 22, 29, 35)
    val segLens = Seq(7, 7, 7, 7, 6, 6)
    def head(s: String) = s.take(40)
    def segments(h: String): Set[(Int, String)] =
      (0 until 6).map(i =>
        i -> h.slice(segStarts(i) - 1, segStarts(i) - 1 + segLens(i))).toSet
    def probes(h: String): Set[(Int, String)] =
      (for {
        i <- 0 until 6; d <- -5 to 5; st = segStarts(i) + d
        if st >= 1 && st <= 40 - segLens(i) + 1
      } yield (i, h.slice(st - 1, st - 1 + segLens(i)))).toSet
    def ed(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    def admitted(la: Int, ha: String, lb: Int, hb: String): Boolean = {
      val full = la >= 40 && lb >= 40 &&
        (segments(ha) & probes(hb)).nonEmpty
      val short = math.min(la, lb) < 40 && la <= 49 && lb <= 49
      full || short
    }
    val rnd = new scala.util.Random(4242)
    val alpha = "abcde" // small alphabet: edits often collide/cancel
    var tested = 0
    for (trial <- 0 until 5000) {
      val la = 35 + rnd.nextInt(26) // 35..60
      val sa = Seq.fill(la)(alpha(rnd.nextInt(alpha.length))).mkString
      // mutate with up to 5 random edits (ins/del/sub anywhere)
      var t = sa
      for (_ <- 0 until rnd.nextInt(6)) {
        val p = rnd.nextInt(t.length + 1)
        rnd.nextInt(3) match {
          case 0 if p < t.length => // substitute
            t = t.updated(p, alpha(rnd.nextInt(alpha.length)))
          case 1 => // insert
            t = t.take(p) + alpha(rnd.nextInt(alpha.length)) + t.drop(p)
          case _ if t.length > 1 && p < t.length => // delete
            t = t.take(p) + t.drop(p + 1)
          case _ => ()
        }
      }
      val (lb, sb) = (t.length, t)
      val d = ed(head(sa), head(sb))
      if (math.abs(la - lb) <= 10 && d <= 5) {
        tested += 1
        assert(admitted(la, head(sa), lb, head(sb)),
          s"trial $trial: missed pair ed=$d la=$la lb=$lb\n a=$sa\n b=$sb")
        assert(admitted(lb, head(sb), la, head(sa)), // either join order
          s"trial $trial (swapped): missed pair ed=$d la=$la lb=$lb")
      }
    }
    assert(tested > 2000, s"only $tested in-threshold pairs generated")

    // the OPERATOR (TextDedup.passJoinCandidates, the round-10 library
    // promotion t_edit_distance is the oracle proof of) must admit every
    // in-band, in-threshold pair end-to-end on a randomized corpus —
    // the Spark plan, not just the driver-side combinatorics above
    import spark.implicits._
    val rnd2 = new scala.util.Random(777)
    val alpha2 = "abcde"
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    for (i <- 0 until 150) {
      val la = 30 + rnd2.nextInt(36) // 30..65: spans the short-head branch
      val sa = Seq.fill(la)(alpha2(rnd2.nextInt(alpha2.length))).mkString
      docs += ((i.toLong * 2, sa))
      var t = sa
      for (_ <- 0 until rnd2.nextInt(6)) {
        val p = rnd2.nextInt(t.length + 1)
        rnd2.nextInt(3) match {
          case 0 if p < t.length =>
            t = t.updated(p, alpha2(rnd2.nextInt(alpha2.length)))
          case 1 => t = t.take(p) + alpha2(rnd2.nextInt(alpha2.length)) + t.drop(p)
          case _ if t.length > 1 && p < t.length => t = t.take(p) + t.drop(p + 1)
          case _ => ()
        }
      }
      docs += ((i.toLong * 2 + 1, t))
    }
    val want2 = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      if math.abs(ta.length - tb.length) <= 10
      d = ed(head(ta), head(tb)) if d <= 5
    } yield (ia, ib, d)).toSet
    val got2 = TextDedup.passJoinCandidates(
        docs.toSeq.toDF("doc_id", "text"), "doc_id", "text",
        maxEdits = 5, headLen = 40, lengthBand = 10)
      .groupBy(col("a"), col("b"))
      .agg(max(col("head_a")).as("ha"), max(col("head_b")).as("hb"))
      .withColumn("d", levenshtein(col("ha"), col("hb"), 5))
      .filter(col("d") >= 0)
      .select("a", "b", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got2 == want2, s"operator recall mismatch: " +
      s"missing=${(want2 -- got2).take(3)} extra=${(got2 -- want2).take(3)}")
    assert(want2.size > 100, s"only ${want2.size} true pairs in fixture")
  }

  test("bounded jaccard kernel: never prunes a qualifying pair, exact at the boundary") {
    // r17 verify kernel (the ×100 ngram wall): bounded(a,b,t) must equal
    // the plain kernel whenever the plain value is >= t (kept rows are
    // value-identical), and may return the sentinel -1.0 ONLY when the
    // plain value is < t. Randomized + exactly-at-threshold fixtures.
    import graft.functions.NativeEval
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Array[Long]) = new GenericArrayData(xs)
    val rnd = new scala.util.Random(7)
    val thresholds = Seq(0.3, 0.5, 0.6, 0.85, 1.0)
    (0 until 5000).foreach { k =>
      def gen() = Array.fill(1 + rnd.nextInt(60))(rnd.nextInt(80).toLong)
        .distinct.sorted
      val (a, b) = (gen(), gen())
      val t = thresholds(k % thresholds.size)
      val exact = NativeEval.arrayJaccardSortedLong(arr(a), arr(b))
      val bounded = NativeEval.arrayJaccardSortedLongBounded(arr(a), arr(b), t)
      if (exact >= t)
        assert(bounded == exact, s"false prune: j=$exact t=$t got $bounded")
      else
        assert(bounded == -1.0 || bounded == exact,
          s"corrupted value under t: j=$exact t=$t got $bounded")
    }
    // exactly-at-threshold pairs (J == t bit-for-bit): |A|=|B|=n with
    // intersection i gives J = i/(2n−i); (i=3,n=4) → 0.6, (i=2,n=3) → 0.5
    val a6 = Array(1L, 2L, 3L, 10L); val b6 = Array(1L, 2L, 3L, 20L)
    assert(NativeEval.arrayJaccardSortedLongBounded(arr(a6), arr(b6), 0.6) == 0.6)
    val a5 = Array(1L, 2L, 10L); val b5 = Array(1L, 2L, 20L)
    assert(NativeEval.arrayJaccardSortedLongBounded(arr(a5), arr(b5), 0.5) == 0.5)
    // identical arrays at t = 1.0 must survive
    assert(NativeEval.arrayJaccardSortedLongBounded(arr(a6), arr(a6), 1.0) == 1.0)
  }

  test("parity sketch: h <= |A∆B|, and the verify pre-filter never prunes a qualifying pair") {
    // r17 verify pre-filter: h = popcount(sigA^sigB) must lower-bound
    // the symmetric difference (parity: shared elements cancel, each ∆
    // element flips one bucket, collisions only cancel), so the bound
    // J <= (S−h)/(S+h) can never reject a pair whose exact jaccard is
    // >= t. Randomized + exactly-at-threshold fixtures + a live-prune
    // fixture (the filter must actually fire on a hopeless pair).
    import graft.functions.NativeEval
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Array[Long]) = new GenericArrayData(xs)
    def passes(a: Array[Long], b: Array[Long], t: Double): Boolean = {
      // the production predicate's arithmetic (TextDedup.paritySketchPasses):
      // h ≤ S·(1−t')/(1+t'), t' = t·(1−1e-12)
      val h = NativeEval.xorPopcount(
        NativeEval.paritySketch(arr(a)), NativeEval.paritySketch(arr(b)))
      val s = (a.length + b.length).toDouble
      val tp = t * (1 - 1e-12)
      h.toDouble <= s * ((1 - tp) / (1 + tp))
    }
    val rnd = new scala.util.Random(13)
    val thresholds = Seq(0.3, 0.5, 0.6, 0.85, 1.0)
    (0 until 5000).foreach { k =>
      def gen() = Array.fill(1 + rnd.nextInt(60))(rnd.nextInt(120).toLong)
        .distinct.sorted
      val (a, b) = (gen(), gen())
      val t = thresholds(k % thresholds.size)
      val h = NativeEval.xorPopcount(
        NativeEval.paritySketch(arr(a)), NativeEval.paritySketch(arr(b)))
      val delta = ((a.toSet diff b.toSet) ++ (b.toSet diff a.toSet)).size
      assert(h <= delta, s"parity bound broken: h=$h > |∆|=$delta")
      val exact = NativeEval.arrayJaccardSortedLong(arr(a), arr(b))
      if (exact >= t)
        assert(passes(a, b, t), s"false prune: j=$exact t=$t h=$h")
    }
    // exactly-at-threshold pairs must pass the filter (the kernel then
    // computes their exact value): J == t bit-for-bit fixtures from the
    // bounded-kernel test
    val a6 = Array(1L, 2L, 3L, 10L); val b6 = Array(1L, 2L, 3L, 20L)
    assert(passes(a6, b6, 0.6), "at-threshold pair pruned (t=0.6)")
    val a5 = Array(1L, 2L, 10L); val b5 = Array(1L, 2L, 20L)
    assert(passes(a5, b5, 0.5), "at-threshold pair pruned (t=0.5)")
    assert(passes(a6, a6, 1.0), "identical pair pruned (t=1.0)")
    // ... and the filter is LIVE: two disjoint 40-element docs at t=0.6
    // (deterministic inputs — the parity popcount is a fixed value far
    // over the prune line, so this asserts the filter actually fires)
    val da = Array.tabulate(40)(i => i * 7919L + 1)
    val db = Array.tabulate(40)(i => i * 7919L + 1000000L)
    assert(!passes(da.sorted, db.sorted, 0.6),
      "filter failed to prune disjoint docs — sketch is dead weight")
  }

  test("ngramJaccardAuto: both routed branches == brute-force banded jaccard") {
    // r16 verdict item 6: the measured blocked-vs-prefix routing rule as
    // an entry point. The contract is the BANDED semantics at every
    // threshold, so both branches must produce identical (pair, value)
    // sets — proven against brute force at a threshold on each side of
    // PrefixRouteThreshold, plus the routing itself (plan shape differs).
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    def shing(t: String): Set[String] = t.sliding(4).toSet
    def brute(t: Double): Map[(Long, Long), Double] = (for {
      (a, ta) <- corpus; (b, tb) <- corpus
      if a < b && ta.length >= 4 && tb.length >= 4 &&
        math.abs(ta.length - tb.length) <= 10
      sa = shing(ta); sb = shing(tb)
      j = (sa & sb).size.toDouble / (sa | sb).size if j >= t
    } yield (a, b) -> j).toMap
    for (t <- Seq(0.6, 0.9)) {
      val got = TextDedup.ngramJaccardAuto(docs, "doc_id", "text",
          lenCol = length(col("text")), n = 4, threshold = t, blockWidth = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got == brute(t), s"auto route at t=$t diverges from brute: " +
        s"missing=${(brute(t).keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- brute(t).keySet).take(3)}")
      assert(got.nonEmpty, s"vacuous fixture at t=$t")
    }
    // and the routing actually routes — marker columns that survive the
    // prefix frame's Materialize pin (its window sits behind the pin, so
    // plan-node sniffing is blind): the blocked branch plans the __blk
    // block key, the prefix branch plans the __la/__lb post-band filter
    def planOf(t: Double): String =
      TextDedup.ngramJaccardAuto(docs, "doc_id", "text",
        lenCol = length(col("text")), n = 4, threshold = t, blockWidth = 20)
        .queryExecution.executedPlan.toString
    assert(planOf(0.6).contains("__blk") && !planOf(0.6).contains("__la"),
      "t=0.6 should take the length-blocked branch")
    assert(planOf(0.9).contains("__la") && !planOf(0.9).contains("__blk"),
      "t=0.9 should take the prefix branch with the band post-filter")
  }

  /** The length-blocked char-n-gram operator (its oracle can't run on
    * the ×K twin boards — DuckDB's brute CTE exceeds local scratch), so
    * its collapse path gets a dedicated driver-side proof: ids must
    * match the brute-force length-banded jaccard over ALL copies, and
    * every twin pair must carry jaccard exactly 1.0. */
  test("ngramJaccardPairs with exact twins == brute-force banded jaccard") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    def shing(t: String): Set[String] = t.sliding(4).toSet
    val want = (for {
      (a, ta) <- corpus; (b, tb) <- corpus
      if a < b && ta.length >= 4 && tb.length >= 4 &&
        math.abs(ta.length - tb.length) <= 10
      sa = shing(ta); sb = shing(tb)
      if (sa & sb).size.toDouble / (sa | sb).size >= 0.6
    } yield (a, b)).toSet
    val rows = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
        lenCol = length(col("text")), n = 4, threshold = 0.6,
        blockWidth = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = rows.map(t => (t._1, t._2)).toSet
    assert(got == want, s"pair mismatch: missing=${(want -- got).take(3)} " +
      s"extra=${(got -- want).take(3)}")
    val byId = corpus.toMap
    val twinPairs = rows.filter { case (a, b, _) => byId(a) == byId(b) }
    assert(twinPairs.nonEmpty && twinPairs.forall(_._3 == 1.0),
      "twin pairs must be present with jaccard exactly 1.0")
    // r14 bounded-scratch sharding: the residue partition of the pair
    // space must be invisible — every shard count yields the same rows
    // (values included), because each pair is emitted by exactly one
    // block and each block lives in exactly one residue class
    val sharded = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
        lenCol = length(col("text")), n = 4, threshold = 0.6,
        blockWidth = 20, shards = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sharded == rows.toSet, s"shards=3 diverges: " +
      s"missing=${(rows.toSet -- sharded).take(3)} " +
      s"extra=${(sharded -- rows.toSet).take(3)}")
    // r15 stream-parallelism salt: the (block, hash(a) % R) key space is
    // a true partition of the pair space — every R yields the same rows
    val salted = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
        lenCol = length(col("text")), n = 4, threshold = 0.6,
        blockWidth = 20, streamParallelism = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == rows.toSet, s"streamParallelism=5 diverges: " +
      s"missing=${(rows.toSet -- salted).take(3)} " +
      s"extra=${(salted -- rows.toSet).take(3)}")
    // derivation ladder for the catalog's shard count (r15: derived from
    // estimated candidate staging bytes vs a per-shard budget, not a
    // doc-count proxy): ceil-divide, floor 1, cap 32
    val B = 1L << 40
    assert(TextDedup.ngramScratchShards(0, B) == 1 &&
      TextDedup.ngramScratchShards(B, B) == 1 &&
      TextDedup.ngramScratchShards(B + 1, B) == 2 &&
      TextDedup.ngramScratchShards(3 * B + 1, B) == 4 &&
      TextDedup.ngramScratchShards(Long.MaxValue, B) == 32)
    // the estimator itself: within-block pair arithmetic on a corpus
    // with two known length blocks. Block math at blockWidth=10:
    // 4 docs of len 12 (block 1) and 2 docs of len 25 (block 2) →
    // within-block pairs (4·3/2)·0.75 + (2·1/2)·0.75; block-2 docs also
    // see block-1's 4 docs as cross candidates at weight /4.
    val estCorpus = spark.createDataFrame(
      (1 to 4).map(i => (i.toLong, "x" * 12)) ++
        (5 to 6).map(i => (i.toLong, "y" * 25))).toDF("doc_id", "text")
    val est = TextDedup.estimateNgramCandidateBytes(estCorpus, "text",
      length(col("text")), n = 4, blockWidth = 10)
    val estWant = ((4.0 * 3 / 2 * 0.75) * 16 * 12 +
      (2.0 * 1 / 2 * 0.75 + 2.0 * 4 / 4) * 16 * 25).toLong
    assert(est == estWant, s"estimator arithmetic: got $est want $estWant")
  }

  /** The SRP pair lister's collapse+expand must equal the uncollapsed
    * band-join pipeline bit-for-bit on a corpus with byte-identical
    * twin vectors — including the micro-floored cosine values (intra
    * pairs carry the COMPUTED self-cosine, not a literal 1.0). */
  test("srp collapse+expand == uncollapsed band-join pipeline on twins") {
    import spark.implicits._
    import graft.operators.VectorSim
    import org.apache.spark.sql.DataFrame
    val rnd = new scala.util.Random(31)
    val dim = 16
    def vec() = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    val base = (0L until 150L).map(i => (i, vec()))
    val twins = (Seq(base(0)) ++ Seq.fill(20)(base(rnd.nextInt(base.size))) ++
        Seq(base(3), base(3)))
      .zipWithIndex.map { case ((_, v), k) => (500L + k, v) }
    val emb = (base ++ twins).toDF("vec_id", "embedding")
    def rerank(e: DataFrame, cand: DataFrame): DataFrame = {
      val va = e.select(col("vec_id").as("a"), col("embedding").as("__ea"))
      val vb = e.select(col("vec_id").as("b"), col("embedding").as("__eb"))
      cand.join(va, "a").join(vb, "b")
        .withColumn("cos", VectorSim.cosine(col("__ea"), col("__eb")))
        .select(col("a"), col("b"), col("cos"))
    }
    def toSet(df: DataFrame) = df.filter(col("cos") >= 0.4)
      .select(col("a"), col("b"), floor(col("cos") * 1e6).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = toSet(rerank(emb,
      VectorSim.srpCandidates(emb, "vec_id", "embedding", dims = dim)))
    val (reps, expand) = VectorSim.collapseExactVecDups(emb, "vec_id", "embedding")
    val collapsed = toSet(expand(rerank(reps,
      VectorSim.srpCandidates(reps, "vec_id", "embedding", dims = dim))))
    assert(collapsed == plain, s"mismatch: missing=${(plain -- collapsed).take(3)} " +
      s"extra=${(collapsed -- plain).take(3)}")
    assert(plain.exists { case (a, b, _) => a >= 500 || b >= 500 },
      "fixture must produce twin pairs")
  }

  /** r14 capacity-safe SRP defaults: the band geometry derives from the
    * corpus count by an integer-exact rule (no floating log — the
    * oracle's GREATEST(8, length(bin(n−1)) − 3) must land on the SAME
    * integers), and the derivation reproduces the historical fixture
    * geometry below 2^11 vectors so every green board is unchanged. */
  test("srpBandBits/srpBands derivation ladder (integer-exact, fixture-stable)") {
    import graft.operators.VectorSim.{srpBandBits, srpBands}
    // values cross-checked against DuckDB's bin-length form this round
    val ladder = Seq(1L -> 8, 2L -> 8, 500L -> 8, 2000L -> 8,
      2048L -> 8, 2049L -> 9, 20000L -> 12, 60000L -> 13,
      65536L -> 13, 65537L -> 14, 200000L -> 15, 1000000000L -> 27)
    ladder.foreach { case (n, want) =>
      assert(srpBandBits(n) == want, s"srpBandBits($n)")
    }
    assert(srpBands(8) == 4 && srpBands(13) == 9 && srpBands(15) == 11)
    // exact powers of two must NOT wobble (a floating log2 would):
    // ceilLog2(2^k) == k because we take the binary length of n−1
    assert(srpBandBits(1L << 20) == 17 && srpBandBits((1L << 20) + 1) == 18)
  }

  test("srp derived defaults == explicit (32, 8) below the 2^11 threshold") {
    import spark.implicits._
    import graft.operators.VectorSim
    val rnd = new scala.util.Random(83)
    val dim = 8
    val emb = (0L until 120L)
      .map(i => (i, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val derived = pairs(VectorSim.srpCandidates(emb, "vec_id", "embedding", dims = dim))
    val pinned = pairs(VectorSim.srpCandidates(emb, "vec_id", "embedding",
      dims = dim, nPlanes = 32, bandBits = 8))
    assert(derived == pinned,
      "derived geometry must reproduce the historical fixture chain at small N")
    // numVectors short-circuits the count and drives the SAME derivation
    val viaN = pairs(VectorSim.srpCandidates(emb, "vec_id", "embedding",
      dims = dim, numVectors = 120L))
    assert(viaN == pinned)
  }

  test("cellCosinePairs collapse == uncollapsed within-cell join on twins") {
    import spark.implicits._
    import graft.operators.VectorSim
    import org.apache.spark.sql.DataFrame
    val rnd = new scala.util.Random(47)
    val dim = 16
    def vec() = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    // base corpus over 3 cells; twins duplicate (vector, cell) rows —
    // PLUS the adversarial cases the (vector, cell) group key exists
    // for: the same vector planted in a DIFFERENT cell (must NOT
    // collapse with its same-cell twins) and a NULL cell (must stay a
    // singleton — NULL never equi-joins in the uncollapsed plan)
    val base = (0L until 90L).map(i => (i, s"c${i % 3}", vec()))
    val twins = Seq.fill(25)(base(rnd.nextInt(base.size)))
      .zipWithIndex.map { case ((_, c, v), k) => (500L + k, c, v) }
    val crossCell = (600L, "c1", base(0)._3) // base(0) lives in c0
    val nullCell = (601L, null.asInstanceOf[String], base(1)._3)
    val emb = (base ++ twins :+ crossCell :+ nullCell)
      .toDF("vec_id", "label", "embedding")
    def plainPairs(e: DataFrame): DataFrame = {
      val v = e.select(col("vec_id").as("__id"), col("label").as("__cell"),
        col("embedding").as("__v"))
      val x = v.alias("__px"); val y = v.alias("__py")
      x.join(y, col("__px.__cell") === col("__py.__cell") &&
          col("__px.__id") < col("__py.__id"))
        .withColumn("cos", VectorSim.cosine(col("__px.__v"), col("__py.__v")))
        .filter(col("cos") >= 0.4)
        .select(col("__px.__id").as("a"), col("__py.__id").as("b"), col("cos"))
    }
    def toSet(df: DataFrame) = df
      .select(col("a"), col("b"), floor(col("cos") * 1e6).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = toSet(plainPairs(emb))
    val collapsed = toSet(VectorSim.cellCosinePairs(
      emb, "vec_id", "embedding", "label", 0.4))
    assert(collapsed == plain, s"mismatch: missing=${(plain -- collapsed).take(3)} " +
      s"extra=${(collapsed -- plain).take(3)}")
    assert(plain.exists { case (a, b, _) => (a >= 500 && a < 600) || (b >= 500 && b < 600) },
      "fixture must produce twin pairs")
    assert(!plain.exists { case (a, b, _) => b == 600L && a == 0L },
      "cross-cell planted row must not pair with its same-vector origin")
  }

  /** The round-12 rep-graph operators must equal the expanded-graph
    * composition bit-for-bit on the twin corpus: the blown-up pair graph
    * (what minhashLshPairs emits) fed to the ENUMERATING operators vs
    * the collapsed rep graph fed to the closed-form/label-expansion
    * ones. The corpus's triple twin group (7,301,302) plus twins of
    * near-dup endpoints exercise intra-clique, bipartite-bundle, and
    * H-triangle corner terms at once. */
  test("rep-graph triangles + components == expanded-graph composition on twins") {
    import spark.implicits._
    import graft.operators.Components
    import org.apache.spark.sql.DataFrame
    val docs = corpus.toDF("doc_id", "text")
    val c = TextDedup.minhashLshPairsCollapsed(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.7)
    val expanded = c.expand(c.repPairs).select("a", "b")
    def keyed(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantTri = keyed(Components.triangleCounts(expanded))
    val gotTri = keyed(Components.weightedTriangleCounts(
      c.repPairs.select("a", "b"), c.dupMembers))
    assert(gotTri == wantTri, s"triangle mismatch: " +
      s"missing=${(wantTri -- gotTri).take(3)} extra=${(gotTri -- wantTri).take(3)}")
    assert(gotTri.nonEmpty, "fixture must produce triangles")
    val wantComp = keyed(Components.connectedComponents(expanded))
    val gotComp = keyed(Components.connectedComponentsCollapsed(
      c.repPairs.select("a", "b"), c.dupMembers))
    assert(gotComp == wantComp, s"component mismatch: " +
      s"missing=${(wantComp -- gotComp).take(3)} extra=${(gotComp -- wantComp).take(3)}")
    // the twin groups must actually be present as dup members (else this
    // test silently degenerates to the w=1 case)
    assert(c.dupMembers.count() >= 15)
  }

  /** VectorSim.semDedup's exact-duplicate collapse must be invisible:
    * the survivors on a corpus WITH byte-identical twins must equal a
    * driver-side reference that scans every copy (the uncollapsed
    * spec). The reference uses the same left-fold double arithmetic as
    * dotFold, so comparisons are bit-identical. */
  test("semDedup with exact twins == uncollapsed driver-side reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 8
    def vec() = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    val base = (0L until 120L).map(i => (i, vec()))
    // twins: copies of random rows at new higher ids (incl. a triple
    // copy and a twin of the min-id row — the contiguous-rank edge)
    val twinSrc = Seq(base(0)) ++ Seq.fill(18)(base(rnd.nextInt(base.size))) ++
      Seq(base(7), base(7))
    val twins = twinSrc.zipWithIndex.map { case ((_, v), k) => (200L + k, v) }
    val all = base ++ twins
    val cents = (0 until 3).map(c => (s"c$c", vec()))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    // uncollapsed reference over ALL copies
    val assigned = all.map { case (id, v) =>
      val (lbl, cc) = cents.map { case (l, c) => (l, cos(v, c)) }
        .minBy { case (l, cc) => (-cc, l) }
      (id, v, lbl, cc)
    }
    val want = assigned.groupBy(_._3).flatMap { case (_, cell) =>
      val ranked = cell.sortBy { case (id, _, _, cc) => (cc, id) }
      ranked.zipWithIndex.collect { case ((id, v, lbl, cc), r)
        if !ranked.take(r).exists { case (_, hv, _, _) => cos(v, hv) > 0.3 } =>
          (lbl, id, math.floor(cc * 1e6).toLong)
      }
    }.toSet
    val emb = all.toDF("vec_id", "v")
    val cdf = cents.map { case (l, c) => (l, c) }.toDF("c_label", "c")
    val got = graft.operators.VectorSim
      .semDedup(emb, cdf, "vec_id", "v", simThreshold = 0.3)
      .select(col("cell"), col("vec_id"),
        floor(col("ccos") * 1e6).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"survivor mismatch: missing=${(want -- got).take(3)} " +
      s"extra=${(got -- want).take(3)}")
    // every twin id must be gone, and no twin may have displaced its rep
    assert(twins.map(_._1).forall(id => !got.exists(_._2 == id)))
    assert(got.size < all.size && got.nonEmpty)
  }

  /** The r13 two-phase witness search (prefix-kPrefix probe + full scan
    * over the remainder) must be invisible on a NEAR-dup corpus — the
    * shape where the exact collapse does nothing and the split carries
    * all the work. Same driver-side uncollapsed reference as the
    * exact-twins test; the corpus is built so phase B is provably
    * exercised (some removed row's every witness ranks past the
    * prefix). */
  test("semDedup near-dup corpus == uncollapsed reference (two-phase split)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val dim = 8
    def vec() = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    val base = (0L until 150L).map(i => (i, vec()))
    // near-dup twins: ±0.1% perturbed copies (distinct bytes — the
    // collapse sees nothing) of random rows at higher ids
    val twins = (0 until 40).map { k =>
      val (_, v) = base(rnd.nextInt(base.size))
      (300L + k, v.map(x => x * (1.0 + (rnd.nextDouble() - 0.5) * 2e-3)))
    }
    val all = base ++ twins
    val cents = (0 until 3).map(c => (s"c$c", vec()))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val thr = 0.3
    val assigned = all.map { case (id, v) =>
      val (lbl, cc) = cents.map { case (l, c) => (l, cos(v, c)) }
        .minBy { case (l, cc) => (-cc, l) }
      (id, v, lbl, cc)
    }
    val byCell = assigned.groupBy(_._3).map { case (lbl, cell) =>
      lbl -> cell.sortBy { case (id, _, _, cc) => (cc, id) }
    }
    val want = byCell.values.flatten.collect {
      case (id, v, lbl, cc) if !byCell(lbl).takeWhile(_._1 != id)
        .exists { case (_, hv, _, _) => cos(v, hv) > thr } =>
        (lbl, id, math.floor(cc * 1e6).toLong)
    }.toSet
    // phase-B coverage proof: at least one REMOVED row must have no
    // witness inside the prefix the production code probes (kPrefix=8)
    // but a witness beyond it — without such a row this test would pass
    // on a phase-A-only implementation
    val phaseBRows = byCell.values.flatMap { ranked =>
      ranked.zipWithIndex.collect { case ((id, v, _, _), r) if r >= 8 &&
        !ranked.take(8).exists { case (_, hv, _, _) => cos(v, hv) > thr } &&
        ranked.slice(8, r).exists { case (_, hv, _, _) => cos(v, hv) > thr } =>
          id
      }
    }
    assert(phaseBRows.nonEmpty,
      "corpus does not exercise phase B — regenerate with another seed")
    val emb = all.toDF("vec_id", "v")
    val cdf = cents.toDF("c_label", "c")
    val got = graft.operators.VectorSim
      .semDedup(emb, cdf, "vec_id", "v", simThreshold = thr)
      .select(col("cell"), col("vec_id"),
        floor(col("ccos") * 1e6).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"survivor mismatch: missing=${(want -- got).take(3)} " +
      s"extra=${(got -- want).take(3)}")
  }

  /** r14: the DESIGNED worst case for the two-phase split — a corpus
    * where NO removal has a witness inside the prefix (every pruning
    * neighbor ranks past kPrefix), so phase A prunes NOTHING and phase
    * B must reproduce the one-phase plan's output exactly. Construction:
    * kPrefix+4 mutually-near-orthogonal "decoy" vectors with tiny
    * centroid affinity occupy the earliest ranks (ccos ranks ascending,
    * so low-affinity rows rank FIRST) and prune nothing; a tight
    * near-dup cluster sits entirely past the prefix, where each member's
    * only witnesses are other cluster members. kPrefix=0 IS the
    * one-phase plan (empty prefix, full scan over everything), giving an
    * in-engine equivalence oracle on top of the driver-side model. */
  test("semDedup worst case: all witnesses past the prefix — phase B == one-phase plan") {
    import spark.implicits._
    val kp = 8
    val dim = kp + 6
    val thr = 0.9
    // decoys fill ranks 1..kp+4: near-orthogonal (pairwise cos ≈ 0.0025),
    // centroid affinity ≈ 0.05 — lowest in the cell, so they rank first
    val decoys = (0 until kp + 4).map { j =>
      val v = Array.fill(dim)(0.0)
      v(0) = 0.05; v(1 + j) = 1.0
      (j.toLong, v)
    }
    // cluster past the prefix: pairwise cos ≈ 1 > thr; distinct bytes
    // (no exact collapse) and distinct ccos (no rank ties beyond id)
    val cluster = (0 until 20).map { k =>
      val v = Array.fill(dim)(0.0)
      v(0) = 1.0; v(dim - 1) = 1e-3 * (k + 1)
      (100L + k, v)
    }
    val all = decoys ++ cluster
    // two centroids so cell assignment is a real argmax: everything has
    // positive e0-affinity, so all rows land in c0
    val cents = Seq(("c0", Array.fill(dim)(0.0).updated(0, 1.0)),
      ("c1", Array.fill(dim)(0.0).updated(0, -1.0)))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val assigned = all.map { case (id, v) =>
      val (lbl, cc) = cents.map { case (l, c) => (l, cos(v, c)) }
        .minBy { case (l, cc) => (-cc, l) }
      (id, v, lbl, cc)
    }
    val ranked = assigned.sortBy { case (id, _, _, cc) => (cc, id) }
    val want = ranked.zipWithIndex.collect { case ((id, v, lbl, cc), r)
      if !ranked.take(r).exists { case (_, hv, _, _) => cos(v, hv) > thr } =>
        (lbl, id, math.floor(cc * 1e6).toLong)
    }.toSet
    // the DESIGN assertions: decoys occupy the full prefix, removals
    // exist, and EVERY removal's earliest witness ranks past the prefix
    assert(ranked.take(kp).forall(_._1 < 100L), "prefix must be all decoys")
    val removals = ranked.zipWithIndex.filter { case ((id, v, _, _), r) =>
      ranked.take(r).exists { case (_, hv, _, _) => cos(v, hv) > thr } }
    assert(removals.size == cluster.size - 1, "cluster must collapse to one")
    assert(removals.forall { case ((_, v, _, _), r) =>
      val firstWitness = ranked.take(r).indexWhere {
        case (_, hv, _, _) => cos(v, hv) > thr }
      firstWitness >= kp
    }, "worst case broken: some witness ranks inside the prefix")
    val emb = all.toDF("vec_id", "v")
    val cdf = cents.toDF("c_label", "c")
    def run(kPrefix: Int) = graft.operators.VectorSim
      .semDedup(emb, cdf, "vec_id", "v", simThreshold = thr, kPrefix = kPrefix)
      .select(col("cell"), col("vec_id"),
        floor(col("ccos") * 1e6).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val onePhase = run(0)          // kPrefix=0 disables phase A entirely
    val twoPhase = run(kp)         // production default geometry
    val midPhase = run(2)          // partial prefix, still all-phase-B
    assert(onePhase == want, "one-phase plan diverges from driver model")
    assert(twoPhase == want, s"two-phase diverges: missing=" +
      s"${(want -- twoPhase).take(3)} extra=${(twoPhase -- want).take(3)}")
    assert(midPhase == want)
  }

  /** ScaleSmoke's mutated-twin builder must be a pure function (twin
    * boards are reproducible) with the documented invariants: copy 0
    * untouched, identical texts mutate identically within a copy,
    * different copies diverge, substitution rate near the nominal 3%. */
  test("ScaleSmoke mutators: deterministic, content-seeded, copy-0 identity") {
    val text = (1 to 400).map(i => s"tok$i").mkString(" ")
    assert(ScaleSmoke.mutateText(text, 0) == text)
    val m1 = ScaleSmoke.mutateText(text, 1)
    assert(m1 == ScaleSmoke.mutateText(text, 1)) // deterministic
    assert(m1 != ScaleSmoke.mutateText(text, 2)) // copies diverge
    val changed = text.split(" ").zip(m1.split(" ")).count { case (a, b) => a != b }
    assert(changed > 0 && changed < 40, s"substitution rate off: $changed/400")
    val v = Seq.tabulate(64)(i => (i + 1) * 0.125f)
    assert(ScaleSmoke.mutateVec(v, 0) == v)
    val mv = ScaleSmoke.mutateVec(v, 3)
    assert(mv == ScaleSmoke.mutateVec(v, 3) && mv != v)
    assert(v.zip(mv).forall { case (a, b) => math.abs(b / a - 1.0) <= 1.001e-3 })
  }

  /** sqlLiteral renders every fixture-travelling type as parseable SQL:
    * ANSI '' quote doubling, string-cast forms for non-finite floats
    * (bare NaN/Infinity tokens are not valid SQL anywhere). */
  test("JdbcIO.sqlLiteral: quote doubling and non-finite floats") {
    import graft.sources.JdbcIO.sqlLiteral
    assert(sqlLiteral("don't") == "'don''t'")
    // backslash handling is dialect-threaded: doubled for Spark/hive2
    // endpoints (escape-parsing), literal for ANSI endpoints (Derby)
    assert(sqlLiteral("a\\b", backslashEscapes = true) == "'a\\\\b'")
    assert(sqlLiteral("a\\b", backslashEscapes = false) == "'a\\b'")
    // dialect detection: escape-parsing endpoints (hive2, mysql,
    // mariadb) and UNKNOWN urls double (a trailing '\' must never
    // swallow the closing quote); known-ANSI endpoints take it literal
    import graft.sources.JdbcIO.backslashEscapesFor
    assert(backslashEscapesFor("jdbc:hive2://h:10000/db"))
    assert(backslashEscapesFor("jdbc:mysql://h:3306/db"))
    assert(backslashEscapesFor("jdbc:mariadb://h:3306/db"))
    assert(backslashEscapesFor("jdbc:unknown_endpoint://h/db"))
    assert(!backslashEscapesFor("jdbc:derby:memory:x;create=true"))
    assert(!backslashEscapesFor("jdbc:postgresql://h:5432/db"))
    // r16: common ANSI-literal endpoints joined the allowlist — these
    // previously defaulted to doubling and silently landed 'a\b' as 'a\\b'
    assert(!backslashEscapesFor("jdbc:sqlserver://h:1433;databaseName=db"))
    assert(!backslashEscapesFor("jdbc:oracle:thin:@h:1521:orcl"))
    assert(!backslashEscapesFor("jdbc:sqlite:/tmp/x.db"))
    assert(!backslashEscapesFor("jdbc:h2:mem:x"))
    assert(!backslashEscapesFor("jdbc:db2://h:50000/db"))
    assert(sqlLiteral(Double.NaN) == "CAST('NaN' AS DOUBLE)")
    assert(sqlLiteral(Double.PositiveInfinity) == "CAST('Infinity' AS DOUBLE)")
    assert(sqlLiteral(Float.NegativeInfinity) == "CAST('-Infinity' AS FLOAT)")
    assert(sqlLiteral(null) == "NULL")
    assert(sqlLiteral(1.5) == "CAST(1.5 AS DOUBLE)")
    // the doubled-quote form must parse back to the original on this
    // engine (Spark accepts '' under both parser modes)
    val got = spark.sql(s"SELECT ${sqlLiteral("don't")} AS s")
      .collect().head.getString(0)
    assert(got == "don't")
  }
}
