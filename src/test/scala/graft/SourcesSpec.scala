package graft

import graft.core.{SchemaDsl, Tables}
import graft.sources.{FileIO, Synthetic}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink unit tests beyond what the oracle round-trip queries cover:
  * ledger idempotence counts, partition pruning in the physical plan, and
  * the schema DSL's code table. */
class SourcesSpec extends SparkSpec {

  private def tmp(leaf: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_test_io/$leaf"

  test("SchemaDsl.fromSpec maps reference-style codes") {
    val st = SchemaDsl.fromSpec("memnum:c;begindt:date;qty:d;n:i;big:l;ok:b")
    assert(st.map(_.dataType) == Seq(StringType, DateType, DoubleType,
      IntegerType, LongType, BooleanType))
    assert(st.map(_.name) == Seq("memnum", "begindt", "qty", "n", "big", "ok"))
    intercept[IllegalArgumentException](SchemaDsl.fromSpec("x:nope"))
  }

  test("copyInto loads each source file exactly once") {
    import spark.implicits._
    val src = tmp("ci_src"); val target = tmp("ci_target"); val ledger = tmp("ci_ledger")
    Seq(src, target, ledger).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    FileIO.writeCsv(df, src)
    val schema = SchemaDsl.fromSpec("id:l;v:c")
    assert(FileIO.copyInto(spark, src, schema, target, ledger) == 3L)
    assert(FileIO.copyInto(spark, src, schema, target, ledger) == 0L)
    assert(spark.read.parquet(target).count() == 3L)
  }

  test("partitioned sink read-back prunes to the filtered partition") {
    val path = tmp("prune")
    FileIO.writePartitioned(
      graft.core.Tables.orders(spark, sf001), path, Seq("o_orderstatus"))
    val q = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    // the parquet scan itself must carry the partition filter
    assert(scan.contains("PartitionFilters") && scan.contains("o_orderstatus"),
      s"no partition filter in scan:\n$scan")
    assert(q.count() > 0)
  }

  test("S16: external partitioned table registers partitions via MSCK REPAIR") {
    val path = tmp("reg")
    FileIO.writePartitioned(
      graft.core.Tables.orders(spark, sf001), path, Seq("o_orderstatus"))
    spark.sql("DROP TABLE IF EXISTS graft_orders_ext")
    spark.sql(
      s"""CREATE TABLE graft_orders_ext (
         |  o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE,
         |  o_orderdate TIMESTAMP, o_orderpriority STRING, o_orderstatus STRING)
         |USING parquet PARTITIONED BY (o_orderstatus)
         |LOCATION '$path'""".stripMargin)
    // external tables see no partitions until they are registered
    spark.sql("MSCK REPAIR TABLE graft_orders_ext")
    val parts = spark.sql("SHOW PARTITIONS graft_orders_ext").count()
    assert(parts >= 2, s"expected discovered partitions, got $parts")
    val n = spark.table("graft_orders_ext").count()
    assert(n == graft.core.Tables.orders(spark, sf001).count())
    spark.sql("DROP TABLE graft_orders_ext")
  }

  test("permissive CSV scan quarantines malformed rows instead of failing") {
    val dir = new java.io.File(tmp("corrupt")); dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir.getPath, "data.csv"),
      "id,qty\n1,10\nnot_a_number,20\n3,thirty\n4,40\n")
    // Spark disallows querying only _corrupt_record off the raw scan
    // (SPARK-21610) — materialize first, as the scaladoc instructs
    val df = FileIO.readCsvPermissive(spark, dir.getPath,
      SchemaDsl.fromSpec("id:l;qty:i")).cache()
    df.count()
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 2 && bad.count() == 2)
    assert(good.agg(sum(col("qty"))).head().getLong(0) == 50L)
  }

  test("DriveSource: revision pinning picks latest <= asOf; missing throws") {
    import graft.sources.DriveSource
    val store: DriveSource.Store = Map("f" -> Seq(
      DriveSource.Revision("b", 2000L, "2".getBytes),
      DriveSource.Revision("a", 1000L, "1".getBytes), // unordered on purpose
      DriveSource.Revision("c", 3000L, "3".getBytes)))
    assert(new String(DriveSource.revisionAsOf(store, "f", 2500L).content) == "2")
    assert(new String(DriveSource.revisionAsOf(store, "f", 3000L).content) == "3") // inclusive
    intercept[NoSuchElementException] { DriveSource.revisionAsOf(store, "f", 500L) }
    intercept[NoSuchElementException] { DriveSource.revisionAsOf(store, "nope", 5000L) }
  }

  test("HiveUdfRegistrar: class-name registration, null contract, idempotent") {
    import graft.functions.HiveUdfRegistrar
    HiveUdfRegistrar.registerIfAbsent(spark, "t_region_of_ip",
      "graft.functions.RegionOfIpUdf")
    // second call must be a no-op, not a re-register error
    HiveUdfRegistrar.registerIfAbsent(spark, "t_region_of_ip",
      "graft.functions.RegionOfIpUdf")
    val r = spark.sql(
      """SELECT t_region_of_ip('10.1.2.3') AS ok, t_region_of_ip('nope') AS bad,
        |       t_region_of_ip('10.999.0.1') AS oob,
        |       t_region_of_ip(CAST(NULL AS STRING)) AS nul""".stripMargin).head()
    assert(r.getString(0) == s"REGION_${(10 * 7 + 1) % 5}")
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("api-to-columnar composition: REST pages -> staging view -> diff check -> parquet") {
    import graft.sources.RestSource
    import graft.operators.SetOps
    val pages = Iterator(
      """[{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]""",
      """[{"id": 3, "v": "c"}]""")
    val incoming = RestSource.fromJsonPages(spark, pages, SchemaDsl.fromSpec("id:l;v:c"))
    FileIO.stageTempView(incoming, "stg_api")
    val staged = spark.table("stg_api")
    // count-reconciliation gate before the columnar write (A9 shape)
    val (onlyIn, onlyOut) = SetOps.symmetricDiffCounts(incoming, staged)
    assert(onlyIn == 0 && onlyOut == 0)
    val out = tmp("api_columnar")
    staged.write.mode("overwrite").parquet(out)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("HTML report sink renders the frame and caps misrouted big inputs") {
    val report = Tables.region(spark, sf001)
      .select(col("r_regionkey"), col("r_name")).orderBy("r_regionkey")
    val out = tmp("html_report")
    FileIO.writeHtmlReport(report, out, "Region <Report>")
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/report.html"))
    assert(html.contains("Region &lt;Report&gt;")) // title escaped
    assert(html.contains("<th>r_name</th>"))
    assert(html.contains("AFRICA"))
    intercept[IllegalArgumentException] {
      FileIO.writeHtmlReport(Tables.orders(spark, sf001), out, "too big",
        maxRows = 100)
    }
  }

  test("propagateDeletes rewrites only affected partitions; emptied dirs removed") {
    import spark.implicits._
    val path = tmp("del_prop")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val df = Seq(
      (1L, "a", 10), (2L, "a", 20), (3L, "a", 30),
      (4L, "b", 40), (5L, "b", 50),
      (6L, "c", 60), (7L, "c", 70)).toDF("k", "p", "v")
    FileIO.writePartitioned(df, path, Seq("p"))
    def files(part: String): Map[String, Long] = {
      val d = new java.io.File(s"$path/p=$part")
      Option(d.listFiles()).toSeq.flatten.filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val bBefore = files("b")
    assert(bBefore.nonEmpty)
    // tombstones hit part of 'a' and ALL of 'c'; 'b' untouched
    val tombstones = Seq(1L, 6L, 7L).toDF("k")
    val (affected, emptied) =
      FileIO.propagateDeletes(spark, path, "k", tombstones, "p")
    assert((affected, emptied) == (2, 1))
    // untouched partition: identical files, byte-level (name + mtime)
    assert(files("b") == bBefore)
    // fully-emptied partition directory is GONE (dynamic overwrite alone
    // would have silently retained it)
    assert(!new java.io.File(s"$path/p=c").exists())
    val got = spark.read.parquet(path).select("k", "p", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((2L, "a", 20), (3L, "a", 30), (4L, "b", 40), (5L, "b", 50)))
    // idempotent: a second propagation with the same tombstones is a no-op
    assert(FileIO.propagateDeletes(spark, path, "k", tombstones, "p") == ((0, 0)))
  }

  test("propagateDeletes handles NULL and Hive-escaped partition values") {
    import spark.implicits._
    val path = tmp("del_prop_esc")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    // 'a:b' lands on disk Hive-escaped (p=a%3Ab); NULL lands in
    // __HIVE_DEFAULT_PARTITION__ — both must be rewritten/deleted, not
    // silently retained
    val df = Seq((1L, Option("a:b"), 10), (2L, Option("a:b"), 20),
        (3L, Option.empty[String], 30), (4L, Option.empty[String], 40),
        (5L, Option("ok"), 50))
      .toDF("k", "p", "v")
    FileIO.writePartitioned(df, path, Seq("p"))
    assert(new java.io.File(s"$path/p=a%3Ab").exists())
    // tombstone part of the escaped partition, ALL of the null partition
    val (affected, emptied) = FileIO.propagateDeletes(
      spark, path, "k", Seq(1L, 3L, 4L).toDF("k"), "p")
    assert((affected, emptied) == (2, 1))
    assert(!new java.io.File(s"$path/p=__HIVE_DEFAULT_PARTITION__").exists())
    val got = spark.read.parquet(path).select("k").as[Long].collect().toSet
    assert(got == Set(2L, 5L))
  }

  test("propagateDeletes keeps numeric-looking string partitions verbatim") {
    import spark.implicits._
    val path = tmp("del_prop_num")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    // '007' would be inferred as INT 7 by partition-type inference:
    // survivors would then be rewritten under a NEW dir p=7 while the
    // original p=007 dir retained every tombstoned row
    val df = Seq((1L, "007", 10), (2L, "007", 20), (3L, "9", 30))
      .toDF("k", "p", "v")
    FileIO.writePartitioned(df, path, Seq("p"))
    assert(new java.io.File(s"$path/p=007").exists())
    val (affected, emptied) = FileIO.propagateDeletes(
      spark, path, "k", Seq(1L).toDF("k"), "p")
    assert((affected, emptied) == (1, 0))
    assert(!new java.io.File(s"$path/p=7").exists())
    // read each partition DIR directly — a whole-table read would
    // itself re-infer '007' as 7 and mask the very bug under test
    assert(new java.io.File(s"$path/p=007").exists())
    assert(spark.read.parquet(s"$path/p=007")
      .select("k").as[Long].collect().toSet == Set(2L))
    assert(spark.read.parquet(s"$path/p=9")
      .select("k").as[Long].collect().toSet == Set(3L))
    // the session conf is restored after the call
    assert(spark.conf.get(
      "spark.sql.sources.partitionColumnTypeInference.enabled") == "true")
  }

  test("synthetic generator is deterministic and distributed") {
    val a = Synthetic.table(spark, 1000L).collect().sortBy(_.getLong(0))
    val b = Synthetic.table(spark, 1000L).collect().sortBy(_.getLong(0))
    assert(a.toSeq == b.toSeq)
    assert(Synthetic.table(spark, 1000L).rdd.getNumPartitions > 1)
  }

  test("compactParquet merges small files losslessly and swaps atomically") {
    val path = tmp("compact_t")
    Tables.orders(spark, sf001).repartition(20)
      .write.mode("overwrite").parquet(path)
    def parquetFiles(): Array[java.io.File] =
      new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
    val before = Tables.orders(spark, sf001).collect().map(_.toString).sorted
    assert(parquetFiles().length == 20)
    val (nBefore, nAfter) = FileIO.compactParquet(spark, path)
    assert(nBefore == 20 && nAfter == 1 && parquetFiles().length == 1)
    val after = spark.read.parquet(path).collect().map(_.toString).sorted
    assert(after.toSeq == before.toSeq)
    // no swap debris left behind
    val parent = new java.io.File(path).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.contains("__compact")))
    // empty / non-flat directory → no-op, never a failed read
    val empty = tmp("compact_empty")
    new java.io.File(empty).mkdirs()
    assert(FileIO.compactParquet(spark, empty) == ((0, 0)))
  }

  test("copyInto drops the ledger broadcast hint above the size cap") {
    import spark.implicits._
    val src = tmp("cib_src"); val target = tmp("cib_target"); val ledger = tmp("cib_ledger")
    Seq(src, target, ledger).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    FileIO.writeCsv(df, src)
    val schema = SchemaDsl.fromSpec("id:l;v:c")
    def hintedPlans(cap: Long): Boolean = {
      // capture whether the anti-join side carries the explicit broadcast
      // hint by replaying the exact plan copyInto builds
      val srcDf = FileIO.readCsv(spark, src, schema)
        .withColumn("__src_file", input_file_name())
      val led = spark.read.parquet(ledger)
      val ledgerBytes = org.apache.commons.io.FileUtils
        .sizeOfDirectory(new java.io.File(ledger))
      val side = if (ledgerBytes <= cap) broadcast(led) else led
      val plan = srcDf.join(side, Seq("__src_file"), "left_anti")
        .queryExecution.optimizedPlan.toString
      plan.contains("ResolvedHint") || plan.toLowerCase.contains("broadcast")
    }
    assert(FileIO.copyInto(spark, src, schema, target, ledger) == 3L)
    // under the default cap the tiny ledger is hint-broadcast; with a
    // zero cap (a stand-in for a multi-year, over-cap ledger) the hint is
    // gone and join strategy is left to the optimizer/AQE
    assert(hintedPlans(cap = FileIO.copyIntoBroadcastCapBytes))
    assert(!hintedPlans(cap = 0L))
    // behavior is unchanged either way: repeat load stays a no-op
    assert(FileIO.copyInto(spark, src, schema, target, ledger,
      broadcastCapBytes = 0L) == 0L)
    assert(spark.read.parquet(target).count() == 3L)
  }

  test("fromCursoredPages fails loudly on loops and error envelopes") {
    import graft.sources.RestSource
    val schema = SchemaDsl.fromSpec("id:l")
    // a server that keeps handing out tokens must hit the maxPages guard,
    // not return a partial frame
    val loop = intercept[IllegalStateException] {
      RestSource.fromCursoredPages(spark,
        _ => """{"data":[{"id":1}],"next":"again"}""", schema, maxPages = 5)
    }
    assert(loop.getMessage.contains("maxPages"))
    // a 200-OK GraphQL-style error envelope (no data array) must throw,
    // not silently contribute zero rows
    val err = intercept[IllegalStateException] {
      RestSource.fromCursoredPages(spark,
        _ => """{"errors":[{"message":"rate limited"}]}""", schema)
    }
    assert(err.getMessage.contains("no 'data' array"))
    // happy path: two pages chained by one token
    val pages = Map[Option[String], String](
      None -> """{"data":[{"id":1},{"id":2}],"next":"t1"}""",
      Some("t1") -> """{"data":[{"id":3}]}""")
    val got = RestSource.fromCursoredPages(spark, pages(_), schema)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("copyInto recovers from an uncommitted ledger directory") {
    import spark.implicits._
    val src = tmp("cil_src"); val target = tmp("cil_target"); val ledger = tmp("cil_ledger")
    Seq(src, target, ledger).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    FileIO.writeCsv(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), src)
    // simulate a crash during the FIRST ledger append: the dir exists but
    // holds no committed parquet footer
    val debris = new java.io.File(ledger, "_temporary"); debris.mkdirs()
    val schema = SchemaDsl.fromSpec("id:l;v:c")
    assert(FileIO.copyInto(spark, src, schema, target, ledger) == 2L)
    assert(FileIO.copyInto(spark, src, schema, target, ledger) == 0L)
    assert(spark.read.parquet(target).count() == 2L)
  }

  test("compactParquet self-heals a crash window between the swap renames") {
    val path = tmp("compact_heal")
    Tables.nation(spark, sf001).write.mode("overwrite").parquet(path)
    val want = spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
    // simulate a JVM death exactly between rename(path→bak) and
    // rename(tmp→path): the table sits at __compact_old, path is absent
    val f = new java.io.File(path)
    val bak = new java.io.File(path + "__compact_old")
    org.apache.commons.io.FileUtils.deleteQuietly(bak)
    assert(f.renameTo(bak) && !f.exists())
    val (nb, na) = FileIO.compactParquet(spark, path)
    assert(nb > 0 && na >= 1, s"recovery compact returned ($nb,$na)")
    assert(spark.read.parquet(path).collect().map(_.toString).sorted.toSeq == want)
    assert(!bak.exists())
    // stale backup WITH the table present (failed final delete): entry
    // recovery deletes the leftover and proceeds
    Tables.nation(spark, sf001).write.mode("overwrite").parquet(bak.getPath)
    FileIO.compactParquet(spark, path)
    assert(!bak.exists() &&
      spark.read.parquet(path).collect().map(_.toString).sorted.toSeq == want)
  }

  test("winnowPairs stop-fingerprint cap bounds degenerate buckets") {
    import spark.implicits._
    // 40 docs sharing one boilerplate sentence (a universal fingerprint
    // source) plus 2 genuine near-dups that also share distinctive text
    val boiler = "all rights reserved contact support for help today"
    val docs = ((1L to 40L).map(i => (i, s"$boiler unique token stream number $i")) ++
      Seq((101L, s"the quick brown fox jumps over the lazy dog $boiler"),
          (102L, s"the quick brown fox jumps over the lazy dog variant $boiler")))
      .toDF("doc_id", "text")
    val unguarded = graft.operators.TextDedup
      .winnowPairs(docs, "doc_id", "text", minShared = 1, maxDocFreq = Int.MaxValue)
    val guarded = graft.operators.TextDedup
      .winnowPairs(docs, "doc_id", "text", minShared = 1, maxDocFreq = 10)
    // boilerplate fingerprints pair everything with everything unguarded;
    // the cap removes them, keeping only pairs with sub-cap evidence
    val gPairs = guarded.select("a", "b").as[(Long, Long)].collect().toSet
    assert(gPairs.contains((101L, 102L)), "genuine near-dup must survive the cap")
    assert(guarded.count() < unguarded.count() / 4,
      s"cap should collapse the boilerplate blow-up: ${guarded.count()} vs ${unguarded.count()}")
  }

  test("winnowPairs default is the capped semantics (contract pin)") {
    // the no-argument call is the CAPPED form at the published constant —
    // a caller wanting unguarded quadratic pairing must opt in with
    // maxDocFreq = Int.MaxValue. This pins the default value itself so a
    // silent change shows up as a test diff, not a behavior surprise.
    assert(graft.operators.TextDedup.WinnowDefaultMaxDocFreq == 10000)
    import spark.implicits._
    val docs = (0L until 6L).map(i => (i, s"totally unique document body number $i with plenty of distinct words $i"))
      .toDF("doc_id", "text")
    val dflt = graft.operators.TextDedup.winnowPairs(docs, "doc_id", "text")
    val pinned = graft.operators.TextDedup.winnowPairs(docs, "doc_id", "text",
      maxDocFreq = graft.operators.TextDedup.WinnowDefaultMaxDocFreq)
    assert(dflt.collect().toSet == pinned.collect().toSet)
  }

  test("writeZOrdered bounds per-file ranges in BOTH dimensions") {
    val ev = Tables.events(spark, sf001).select("event_id", "user_id")
    val zpath = tmp("zorder_t"); val spath = tmp("zsort_t")
    FileIO.writeZOrdered(ev, zpath, "user_id", "event_id", numFiles = 16)
    // the single-dimension alternative: lexicographic range sort on user_id
    ev.repartitionByRange(16, col("user_id")).sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(spath)
    val fullRow = ev.agg(
      (max(col("user_id")) - min(col("user_id"))).cast("double"),
      (max(col("event_id")) - min(col("event_id"))).cast("double")).head()
    val full = Map("user_id" -> fullRow.getDouble(0),
      "event_id" -> fullRow.getDouble(1))
    def avgNormRange(path: String, dim: String): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max(col(dim)) - min(col(dim))).cast("double") / full(dim)).as("w"))
        .collect().map(_.getAs[Double]("w"))
      perFile.sum / perFile.length
    }
    val zU = avgNormRange(zpath, "user_id")
    val zE = avgNormRange(zpath, "event_id")
    val sE = avgNormRange(spath, "event_id")
    // z-order: both dimensions bounded per file; lexicographic: the
    // trailing dimension spans nearly the whole domain in every file
    assert(zU < 0.6 && zE < 0.6, s"z-order ranges too wide: user=$zU event=$zE")
    assert(sE > 0.8, s"expected unbounded trailing dim under sort, got $sE")
    assert(zE < sE / 2)
  }

  test("footerRowCount == scanning count; 0 on empty/missing dir") {
    import spark.implicits._
    val path = tmp("footer_cnt")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val df = (1L to 4321L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    FileIO.writePartitioned(df, path, Seq("g"))
    assert(FileIO.footerRowCount(spark, path) == 4321L)
    assert(FileIO.footerRowCount(spark, tmp("footer_cnt_missing")) == 0L)
  }

  test("normalizeEventTs yields the same catalog contract for every ts encoding") {
    // The driver has shipped events.ts as TIMESTAMP(NANOS) (arrives as
    // long nanos under nanosAsLong), as plain micros NTZ, and a frame
    // already normalized (LTZ + ts_ns) must pass through unchanged.
    import spark.implicits._
    val micros = Seq(
      (1L, 1704067200000000L), // 2024-01-01 00:00:00 UTC
      (2L, 1704067200123456L),
      (3L, 1704070800000001L)).toDF("event_id", "us")
    val asNanos = micros.select(col("event_id"),
      (col("us") * 1000L).as("ts"))
    val asNtz = micros.select(col("event_id"),
      expr("to_timestamp_ntz(timestamp_micros(us))").as("ts"))
    val asLtz = micros.select(col("event_id"),
      expr("timestamp_micros(us)").as("ts"),
      (col("us") * 1000L).as("ts_ns"))
    val frames = Seq(asNanos, asNtz, asLtz).map(Tables.normalizeEventTs)
    for (f <- frames) {
      assert(f.schema("ts").dataType == TimestampType)
      assert(f.schema("ts_ns").dataType == LongType)
    }
    val rows = frames.map(
      _.select("event_id", "ts", "ts_ns").orderBy("event_id").collect().toSeq)
    assert(rows(0) == rows(1), "nanos and NTZ encodings must normalize identically")
    assert(rows(0) == rows(2), "already-normalized frame must pass through unchanged")
    // the contract's absolute anchor: session runs UTC, so ts_ns is epoch nanos
    assert(rows(0).head.getAs[Long]("ts_ns") == 1704067200000000000L)
    // a frame carrying BOTH raw long ts and a stale ts_ns must not end
    // up with two ts_ns columns (rename-into-occupied-name regression)
    val withStale = micros.select(col("event_id"),
      (col("us") * 1000L).as("ts"), lit(-1L).as("ts_ns"))
    val fixed = Tables.normalizeEventTs(withStale)
    assert(fixed.columns.count(_ == "ts_ns") == 1)
    assert(fixed.select("event_id", "ts", "ts_ns").orderBy("event_id")
      .collect().toSeq == rows(0))
  }
}
