package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-attribute derivation — the reference's P1/P2 operators
  * (`/root/reference/src/Meshjoin.java:303-318`): year, month, day, week,
  * quarter `(m-1)/3+1`, upper-case day name, weekend flag.
  *
  * Week semantics (SURVEY.md G1): the reference uses Java
  * `WeekFields.ISO.weekOfYear()` (week-of-calendar-year, can be 0); we
  * deliberately standardize on ISO week-of-week-based-year
  * (`weekofyear()`, 1–53) — the divergence is documented and pinned by
  * tests. Day-name casing per G2: `upper(date_format(_, "EEEE"))`.
  *
  * All derivations are pure column expressions → whole-stage codegen,
  * no UDFs; they cost nothing extra at 100 TB because they fuse into the
  * scan stage.
  */
object TimeDim {

  def yearCol(c: Column): Column = year(c)
  def monthCol(c: Column): Column = month(c)
  def dayCol(c: Column): Column = dayofmonth(c)
  def weekCol(c: Column): Column = weekofyear(c)
  def quarterCol(c: Column): Column = quarter(c)
  def dayOfWeekCol(c: Column): Column = upper(date_format(c, "EEEE"))
  /** Spark `dayofweek`: 1=Sunday .. 7=Saturday; weekend = {SAT, SUN}
    * (`/root/reference/src/Meshjoin.java:312`). */
  def isWeekendCol(c: Column): Column = dayofweek(c).isin(1, 7)

  /** Appends the full attribute set derived from `dateCol`. */
  def withTimeAttrs(df: DataFrame, dateCol: String): DataFrame = {
    val c = col(dateCol)
    df.withColumn("year", yearCol(c))
      .withColumn("month", monthCol(c))
      .withColumn("day", dayCol(c))
      .withColumn("week", weekCol(c))
      .withColumn("quarter", quarterCol(c))
      .withColumn("day_of_week", dayOfWeekCol(c))
      .withColumn("is_weekend", isWeekendCol(c))
  }

  /** The reference's week VERBATIM (bug-compatible twin of [[weekCol]]):
    * Java `WeekFields.ISO.weekOfYear()` (`Meshjoin.java:309`) counts
    * weeks within the CALENDAR year — week 1 is the first Monday-started
    * week with ≥ 4 days in the year, days before it are week 0, and a
    * year's final days run up to week 53 instead of rolling into next
    * year's week 1. Derivation: with weekday(Jan 1) ∈ 0(Mon)..6(Sun),
    * week 1 starts `weekday` days BEFORE Jan 1 when Jan 1 falls Mon–Thu,
    * else `7 − weekday` days after; the week index is then a floor
    * division of the day offset. Pure builtins ⇒ codegen, engine-portable
    * (the DuckDB twin spells the same arithmetic with isodow). */
  def weekLiteralCol(c: Column): Column = {
    val d = to_date(c)
    val jan1 = trunc(d, "year")
    val wd = weekday(jan1)
    val week1Start = when(wd <= 3, -wd).otherwise(lit(7) - wd)
    (floor((datediff(d, jan1) - week1Start).cast("double") / 7.0d) + 1).cast("int")
  }

  /** Parse the reference's `yyyy-MM-dd H:mm:ss` transaction timestamps
    * (single-`H` accepts 1- and 2-digit hours, SURVEY.md G7); unparseable
    * rows yield NULL, which the caller drops (reference Q-b: invalid
    * Order_Date ⇒ record dropped, `/root/reference/src/Meshjoin.java:280-284`).
    * `try_to_timestamp`, not `to_timestamp`: Spark 4 runs ANSI mode by
    * default, where a failed parse is a runtime error — the reference's
    * semantic is drop, not fail. */
  def parseOrderDate(c: Column): Column = try_to_timestamp(c, lit("yyyy-M-d H:mm:ss"))
}
