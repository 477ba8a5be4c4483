package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-group quantiles in DISTRIBUTION form: histogram of (group,
  * value) counts, cumulative distribution in value order, each quantile q
  * resolved as the LOWEST value whose cumulative count reaches ceil(q·n).
  *
  * The shuffle carries (group, value) pairs — value cardinality, not row
  * count — the 100 TB alternative to Spark's value-buffering `percentile`.
  * NULL values are excluded up front (SQL aggregate semantics; engines
  * also disagree on NULL sort order, so excluding them is what keeps the
  * definition engine-portable).
  */
object Quantiles {

  /** @param qs      (outputColumnName, quantile) pairs, e.g. ("p50", 0.5)
    * @param countName when set, prepends a per-group row-count column
    * @return one row per group: groupCol, [countName], then one column
    *         per entry of `qs` */
  def distQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                    qs: Seq[(String, Double)],
                    countName: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty)
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .withColumn("__tot", sum(col("__cnt")).over(
        Window.partitionBy(col(groupCol))))
    val qCols = qs.map { case (name, q) =>
      min(when(col("__cum") >= ceil(lit(q) * col("__tot")), col(valueCol)))
        .as(name)
    }
    val aggs = countName.map(n => max(col("__tot")).as(n)).toSeq ++ qCols
    cum.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
