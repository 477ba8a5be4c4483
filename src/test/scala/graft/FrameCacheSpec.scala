package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Keying/lifetime contract of the analyzed-frame cache
  * ([[graft.core.Tables.apply]], r15 rework): entries key on
  * `sessionUUID` (never collidable, unlike the r14 identityHashCode),
  * a regenerated source REPLACES its stale frame instead of
  * accumulating one per mtime, a vanished repack version dir forces a
  * re-resolve instead of serving deleted files, and the outer map is
  * bounded so session-churning JVMs cannot pin unbounded analyzed
  * plans. */
class FrameCacheSpec extends SparkSpec {

  // small single-file source under RepackMinBytes → cache serves the raw
  // path (repack layer exercised separately in RepackSpec)
  private def writeTable(dir: File, name: String, rows: Int): File = {
    val src = new File(dir, s"$name.parquet")
    val one = new File(dir, s"stage_$name")
    spark.range(rows).select(col("id"), (col("id") % 13).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(one.getPath)
    val part = Option(one.listFiles()).toSeq.flatten
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, src.toPath)
    src
  }

  test("same session hits the cache; distinct sessions get distinct frames") {
    val dir = Files.createTempDirectory("graft_fcache1").toFile
    writeTable(dir, "t", 100)
    val a1 = graft.core.Tables(spark, dir.getPath, "t")
    val a2 = graft.core.Tables(spark, dir.getPath, "t")
    assert(a1 eq a2, "same (session, dir, table) must serve the cached frame")
    val s2 = spark.newSession()
    val b = graft.core.Tables(s2, dir.getPath, "t")
    assert(!(b eq a1), "two live sessions must never share a cache entry")
    assert(b.sparkSession eq s2, "the second session's frame must bind to it")
    assert(b.count() == 100)
  }

  test("regenerated source replaces the stale frame (no per-mtime accumulation)") {
    val dir = Files.createTempDirectory("graft_fcache2").toFile
    val src = writeTable(dir, "t", 50)
    val before = graft.core.Tables(spark, dir.getPath, "t")
    assert(before.count() == 50)
    // regenerate with a different row count and a NEWER mtime
    val mt = src.lastModified()
    assert(src.delete())
    writeTable(dir, "t", 75).setLastModified(mt + 5000): Unit
    val after = graft.core.Tables(spark, dir.getPath, "t")
    assert(!(after eq before), "mtime move must re-resolve")
    assert(after.count() == 75, "the re-resolved frame must read the new data")
    assert(graft.core.Tables(spark, dir.getPath, "t") eq after,
      "the replacement must itself be cached")
  }

  test("dead/stopped sessions are dropped and the outer map stays bounded") {
    val dir = Files.createTempDirectory("graft_fcache3").toFile
    writeTable(dir, "t", 10)
    graft.core.Tables(spark, dir.getPath, "t"): Unit
    // churn far past the cap: every newSession shares the live context,
    // so only LRU eviction can bound the map
    (1 to graft.core.Tables.FrameCacheMaxSessions + 8).foreach { _ =>
      graft.core.Tables(spark.newSession(), dir.getPath, "t"): Unit
    }
    graft.core.Tables.frameCacheSweep()
    assert(graft.core.Tables.frameCacheSessionCount <=
      graft.core.Tables.FrameCacheMaxSessions,
      "session churn must not grow the cache past its cap")
    // the long-lived shared session was evicted or kept — either way a
    // fresh call still serves correct data
    assert(graft.core.Tables(spark, dir.getPath, "t").count() == 10)
  }
}
