package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Native (codegen-friendly) replacements for the reference's yyyyMMdd
  * string-date UDF family (`bof_30_migrate.scala:425-523`). All return null
  * on malformed input, matching the reference's try/catch→null semantics,
  * and all take explicit clock parameters where the reference read the wall
  * clock (SURVEY.md §7.4-5 determinism requirement).
  */
object DateOps {

  /** Strict yyyyMMdd validation → the same string, or null if not a real
    * date (ref: `dateParse2`, bof_30_migrate.scala:428-447). */
  def validateYyyymmdd(c: Column): Column = {
    val d = to_date(c, "yyyyMMdd")
    when(d.isNotNull && length(c) === 8, c)
  }

  /** yyyyMMdd string → DateType, null on error. */
  def parseYyyymmdd(c: Column): Column = to_date(c, "yyyyMMdd")

  /** Add N days to a yyyyMMdd string, returning yyyyMMdd
    * (ref: `addDays`, bof_30_migrate.scala:464-481). */
  def addDaysYyyymmdd(c: Column, days: Column): Column =
    date_format(date_add(to_date(c, "yyyyMMdd"), days), "yyyyMMdd")

  /** Last day of month of a yyyyMMdd string, as yyyyMMdd
    * (ref: `getLastDoM`, bof_30_migrate.scala:501-523). */
  def lastDayOfMonthYyyymmdd(c: Column): Column =
    date_format(last_day(to_date(c, "yyyyMMdd")), "yyyyMMdd")

  /** Shift a yyyyMM(dd) string +2 months and pin day to "00"
    * (ref: `lagDate`, bof_30_migrate.scala:483-499). */
  def lagDateYyyymm00(c: Column): Column = {
    val d = to_date(concat(substring(c, 1, 6), lit("01")), "yyyyMMdd")
    when(d.isNotNull, concat(date_format(add_months(d, 2), "yyyyMM"), lit("00")))
  }

  /** October-start fiscal yyyyMM of a yyyyMMdd string
    * (ref: `getFiscalYYYYMM`, bof_30_migrate.scala:170-189; Oct→01 of FY+1,
    * Jan→04, Sep→12). */
  def fiscalYyyymm(c: Column): Column = {
    val d  = to_date(c, "yyyyMMdd")
    val m  = month(d)
    val fm = (m + lit(2)) % 12 + lit(1)
    val fy = when(m >= 10, year(d) + 1).otherwise(year(d))
    when(d.isNotNull, concat(format_string("%04d", fy), format_string("%02d", fm)))
  }

  /** Julian YDDD (single year digit + day-of-year) → yyyyMMdd-prefix string,
    * resolved against an explicit `today` yyyyMMdd anchor instead of the
    * wall clock (ref: `julianDateParse`, bof_30_migrate.scala:449-462:
    * prepend today's decade; if that lands in the future, step back one
    * decade). Output is decade-prefix + YDDD, as in the reference. */
  def julianYddd(c: Column, today: String): Column = {
    require(today.matches("\\d{8}"), s"today must be yyyyMMdd, got $today")
    val decade = today.substring(0, 3)
    val asIs   = concat(lit(decade), c)
    when(length(c) === 4 && c.rlike("^[0-9]{4}$"),
      when(asIs > lit(today),
        concat(lit((decade.toInt - 1).toString), c)).otherwise(asIs))
  }

  /** Null-vs-blank normalizers (SURVEY.md §7.4-4). */
  def nullIfBlank(c: Column): Column = when(length(trim(c)) > 0, c)
  def blankIfNull(c: Column): Column = coalesce(c, lit(""))
}
