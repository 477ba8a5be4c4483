package graft

import graft.operators.Intervals
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interval-collapse correctness.
  *
  * The golden pair is the reference's own fixture
  * (`/root/reference/resources/collapsed_data_pre.csv` →
  * `collapsed_data_post.csv`, produced by
  * `slow_temp_table_write_in_palce_of_recursive_cte.py:189-202`): 199
  * per-member eligibility intervals collapse to 87 when merged across
  * overlaps and ≤1-day gaps. The post file's date-format quirk —
  * `eligeff_coll` ISO, `eligend_coll` MM/dd/yyyy — is reproduced, not
  * fixed (SURVEY.md §7.4-7).
  */
class IntervalsSpec extends SparkSpec {

  private val preSchema = StructType(Seq(
    StructField("memnum", StringType),
    StructField("begindt", DateType),
    StructField("enddt", DateType)))

  private def golden = {
    val pre = spark.read.option("header", "true").schema(preSchema)
      .csv("/root/reference/resources/collapsed_data_pre.csv")
    Intervals.collapse(pre, Seq("memnum"), "begindt", "enddt", gapDays = 1)
  }

  test("golden fixture: collapse(pre) == post, byte-for-byte incl. format quirk") {
    val got = golden
      .select(col("memnum"),
        date_format(col("begindt"), "yyyy-MM-dd").as("eligeff_coll"),
        date_format(col("enddt"), "MM/dd/yyyy").as("eligend_coll"))
      .orderBy("memnum", "eligeff_coll")
      .collect()
      .map(r => s"${r.getString(0)},${r.getString(1)},${r.getString(2)}")
    val want = spark.read.option("header", "true")
      .csv("/root/reference/resources/collapsed_data_post.csv")
      .orderBy("memnum", "eligeff_coll")
      .collect()
      .map(r => s"${r.getString(0)},${r.getString(1)},${r.getString(2)}")
    assert(want.length == 87)
    assert(got.toSeq == want.toSeq)
  }

  test("collapseFixedPoint reaches the same result as the sweep-line collapse") {
    val pre = spark.read.option("header", "true").schema(preSchema)
      .csv("/root/reference/resources/collapsed_data_pre.csv")
    val a = golden.orderBy("memnum", "begindt")
      .collect().map(_.toSeq).toSeq
    val b = Intervals.collapseFixedPoint(pre, Seq("memnum"), "begindt", "enddt",
        gapDays = 1).orderBy("memnum", "begindt")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("collapse invariants on random intervals: disjoint-with-gap, covering, idempotent") {
    val rnd = new scala.util.Random(7)
    import spark.implicits._
    val rows = Seq.fill(300) {
      val key = s"k${rnd.nextInt(12)}"
      val b = rnd.nextInt(300)
      (key, b, b + rnd.nextInt(40))
    }
    val df = rows.toDF("k", "bi", "ei")
      .select(col("k"),
        expr("date_add(DATE '2020-01-01', bi)").as("b"),
        expr("date_add(DATE '2020-01-01', ei)").as("e"))
    val out = Intervals.collapse(df, Seq("k"), "b", "e", gapDays = 1)

    // 1. per-key output intervals are separated by > gapDays
    val perKey = out.orderBy("k", "b").collect()
      .groupBy(_.getString(0)).values
    perKey.foreach { ivs =>
      ivs.sliding(2).foreach {
        case Array(x, y) =>
          assert(y.getDate(1).toLocalDate.isAfter(
            x.getDate(2).toLocalDate.plusDays(1)),
            s"intervals not gap-separated: $x $y")
        case _ =>
      }
    }
    // 2. every input interval is covered by exactly one output interval
    val uncovered = df.as("i").join(out.as("o"),
      col("i.k") === col("o.k") &&
        col("i.b") >= col("o.b") && col("i.e") <= col("o.e"),
      "left_anti")
    assert(uncovered.count() == 0)
    // 3. idempotent: collapsing the output changes nothing
    val again = Intervals.collapse(out, Seq("k"), "b", "e", gapDays = 1)
    assert(again.count() == out.count())
    assert(again.except(out).count() == 0)
  }
}
