package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S10/S19: JDBC scan with partitioned parallel read + JDBC sink
  * (ref: windowed_lagN_awskms_postgres_date_partition.py:200-216 postgres
  * sink; sap_bw_api.scala JDBC source).
  *
  * Scale notes: a JDBC scan without `partitionColumn` is a single-task
  * read — always pass the column + bounds so Spark issues `numPartitions`
  * range-predicated queries in parallel. Predicates push down through the
  * JDBC source (shown in the plan as PushedFilters), so filter before
  * reading, not after.
  */
object JdbcIO {

  def read(spark: SparkSession, url: String, table: String,
           partitionColumn: Option[(String, Long, Long, Int)] = None,
           props: java.util.Properties = new java.util.Properties()): DataFrame =
    partitionColumn match {
      case Some((colName, lower, upper, numParts)) =>
        spark.read.jdbc(url, table, colName, lower, upper, numParts, props)
      case None =>
        spark.read.jdbc(url, table, props)
    }

  /** `maxConnections` caps sink parallelism (each partition opens one
    * connection; the reference caps at 10 —
    * fmaps_from_hive_insert_mysql.py:143-144). */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Overwrite,
            maxConnections: Int = 10,
            props: java.util.Properties = new java.util.Properties()): Unit = {
    val capped =
      if (df.rdd.getNumPartitions > maxConnections) df.coalesce(maxConnections)
      else df
    capped.write.mode(mode).jdbc(url, table, props)
  }
}
