package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Explicit null-vs-blank normalizers (SURVEY.md §7.4-4): the reference is
  * ambivalent about "" vs NULL (bof_30_migrate.scala:1121-1123,1218-1220
  * and the `length(col) < 1` checks everywhere); graft makes the choice
  * explicit at the edges instead of scattering length-checks. */
object Normalize {

  /** "" / whitespace-only → NULL (the ingest-side normalization). */
  def nullIfBlank(c: Column): Column =
    when(length(trim(c)) < 1, lit(null)).otherwise(c)

  /** NULL → "" (the report-side normalization). */
  def blankIfNull(c: Column): Column = coalesce(c, lit(""))

  /** The reference's blank-check predicate, named. */
  def isBlank(c: Column): Column = c.isNull || length(trim(c)) < 1
}
