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

  /** JDBC sink for endpoints WITHOUT prepared-statement batch support
    * (hive-jdbc / Spark thrift: `addBatch` throws "Method not
    * supported", which kills Spark's stock JDBC writer). Executors
    * stream multi-row `INSERT INTO … VALUES (…), (…)` statement TEXT
    * over their own connections instead — same overwrite semantics and
    * connection cap as [[write]], DDL derived from the frame's schema
    * (Spark SQL type names, which hive2 endpoints parse natively).
    *
    * Deadlock note for in-process thrift endpoints ([[ThriftEndpoint]]):
    * each INSERT the server executes needs a task slot, while
    * `maxConnections` writer tasks sit occupied waiting on their
    * statements — keep `maxConnections` well under the cluster's total
    * cores (the default 10 is fine for the 32-core drills). */
  def writeStatements(df: DataFrame, url: String, table: String,
                      maxConnections: Int = 10,
                      rowsPerStatement: Int = 500,
                      props: java.util.Properties = new java.util.Properties(),
                      backslashEscapes: Option[Boolean] = None): Unit = {
    val bsEsc = backslashEscapes.getOrElse(backslashEscapesFor(url))
    val schema = df.schema
    val ddlCols = schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    withConnection(url, props) { st =>
      st.execute(s"DROP TABLE IF EXISTS `$table`")
      st.execute(s"CREATE TABLE `$table` ($ddlCols)")
    }
    val capped =
      if (df.rdd.getNumPartitions > maxConnections) df.coalesce(maxConnections)
      else df
    val (u, t, n, p, bs) =
      (url, table, rowsPerStatement, propsMap(props), bsEsc)
    capped.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val pp = new java.util.Properties()
        p.foreach { case (k, v) => pp.setProperty(k, v) }
        withConnection(u, pp) { st =>
          it.grouped(n).foreach { chunk =>
            val values = chunk.map(r =>
              (0 until r.length).map(i => sqlLiteral(r.get(i), bs))
                .mkString("(", ", ", ")")).mkString(", ")
            st.execute(s"INSERT INTO `$t` VALUES $values")
          }
        }
      }
    }
  }

  /** Backslash-escaping dialect for [[writeStatements]], by URL prefix.
    *
    * Endpoints whose DEFAULT string-literal parser treats `\` as an
    * escape introducer must have it doubled (hive2/Spark-thrift;
    * MySQL/MariaDB unless NO_BACKSLASH_ESCAPES is set). Known
    * ANSI-literal endpoints (Derby; Postgres with
    * standard_conforming_strings, its default since 9.1) take `\`
    * literally, where doubling would corrupt the landed value. UNKNOWN
    * dialects default to doubling — the failure modes are asymmetric:
    * on an ANSI parser a doubled backslash merely pads the value
    * ('a\b' lands as 'a\\b'), while an UNdoubled backslash on an
    * escape-parsing endpoint lets a value ending in `\` swallow the
    * closing quote (unterminated literal → statement breakage, an
    * injection surface). Callers on a known-ANSI endpoint outside this
    * list pass `backslashEscapes = Some(false)` explicitly.
    *
    * The allowlist covers the common ANSI-literal endpoints (r16 — the
    * two-entry r15 list silently double-escaped values landed on SQL
    * Server/Oracle/SQLite/H2/DB2, all of which parse string literals
    * per ANSI with no backslash escapes by default); doubling remains
    * the default ONLY for genuinely unknown URLs, per the asymmetry
    * above. */
  private[graft] def backslashEscapesFor(url: String): Boolean = {
    val ansiLiteral = Seq(
      "jdbc:derby:", "jdbc:postgresql:", "jdbc:sqlserver:", "jdbc:oracle:",
      "jdbc:sqlite:", "jdbc:h2:", "jdbc:db2:")
    !ansiLiteral.exists(url.startsWith)
  }

  private def propsMap(props: java.util.Properties): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    props.stringPropertyNames().asScala.map(k => k -> props.getProperty(k)).toMap
  }

  private def withConnection(url: String, props: java.util.Properties)
                            (body: java.sql.Statement => Unit): Unit = {
    Option(props.getProperty("driver"))
      .foreach(c => Class.forName(c)) // force driver registration
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try body(st) finally st.close()
    } finally conn.close()
  }

  /** Literal SQL rendering for [[writeStatements]] — covers the types a
    * fixture/warehouse landing actually ships (integral, fractional,
    * decimal, string, boolean, date, timestamp).
    *
    * Quotes are escaped by ANSI-standard `''` doubling (parses on every
    * SQL endpoint, including Spark thrift under default AND
    * `escapedStringLiterals=true` parser modes — verified empirically on
    * this Spark). Backslash handling is DIALECT-DEPENDENT and therefore
    * a parameter: Spark/Hive's default parser treats `\` as an escape
    * introducer (so it must be doubled), while ANSI endpoints (Derby,
    * Postgres standard_conforming_strings) take it literally (doubling
    * would corrupt the value — 'a\b' landing as 'a\\b'). Non-finite
    * floats render as string-cast forms (`CAST('NaN' AS DOUBLE)`): the
    * bare tokens NaN/Infinity are not valid SQL literals anywhere. */
  private[graft] def sqlLiteral(v: Any, backslashEscapes: Boolean = true): String = v match {
    case null => "NULL"
    case s: String =>
      val b = if (backslashEscapes) s.replace("\\", "\\\\") else s
      "'" + b.replace("'", "''") + "'"
    case d: java.sql.Date => s"DATE '$d'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case b: Boolean => if (b) "true" else "false"
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.underlying.toPlainString
    case f: Float if f.isNaN || f.isInfinite =>
      s"CAST('${if (f.isNaN) "NaN" else if (f > 0) "Infinity" else "-Infinity"}' AS FLOAT)"
    case f: Float => s"CAST(${f.toString} AS FLOAT)"
    case d: Double if d.isNaN || d.isInfinite =>
      s"CAST('${if (d.isNaN) "NaN" else if (d > 0) "Infinity" else "-Infinity"}' AS DOUBLE)"
    case d: Double => s"CAST(${d.toString} AS DOUBLE)"
    case n: Number => n.toString
    case other => throw new IllegalArgumentException(
      s"writeStatements cannot render ${other.getClass.getName} as a SQL literal")
  }
}
