package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the time-derivation semantics (SURVEY.md G1/G2/G7 and reference
  * P1/P2, `/root/reference/src/Meshjoin.java:303-318`). */
class TimeDimSpec extends SparkSpec {
  import spark.implicits._

  private def attrs(ts: String): Row = {
    val df = Seq(ts).toDF("raw")
      .withColumn("d", to_timestamp(col("raw")))
    TimeDim.withTimeAttrs(df, "d")
      .select("year", "month", "day", "week", "quarter", "day_of_week", "is_weekend")
      .head()
  }

  test("plain weekday derivation") {
    val r = attrs("2024-03-05 10:00:00") // a Tuesday
    assert(r.getInt(0) == 2024 && r.getInt(1) == 3 && r.getInt(2) == 5)
    assert(r.getInt(4) == 1)
    assert(r.getString(5) == "TUESDAY")
    assert(!r.getBoolean(6))
  }

  test("weekend flag covers Saturday and Sunday only") {
    assert(attrs("2024-03-09 12:00:00").getBoolean(6)) // Saturday
    assert(attrs("2024-03-10 12:00:00").getBoolean(6)) // Sunday
    assert(!attrs("2024-03-11 12:00:00").getBoolean(6)) // Monday
  }

  test("leap day derives correctly") {
    val r = attrs("2024-02-29 00:00:00")
    assert(r.getInt(1) == 2 && r.getInt(2) == 29 && r.getInt(4) == 1)
    assert(r.getString(5) == "THURSDAY")
  }

  test("ISO week at year boundary: Jan 1 can belong to week 52/53 of prior year") {
    // 2021-01-01 is a Friday — ISO week 53 of 2020 (the documented G1
    // decision: week-of-week-based-year, not the reference's week 0).
    assert(attrs("2021-01-01 00:00:00").getInt(3) == 53)
    // 2024-12-30 is a Monday — ISO week 1 of 2025.
    assert(attrs("2024-12-30 00:00:00").getInt(3) == 1)
  }

  test("literal week matches Java WeekFields.ISO.weekOfYear over 1200 consecutive days") {
    // the exact API the reference calls (Meshjoin.java:309), evaluated
    // driver-side as the truth set; the range covers years whose Jan 1
    // falls Fri (2021), Sat (2022), Sun (2023) and Mon (2024) — week-0
    // and week-53 regimes both included.
    import java.time.LocalDate
    import java.time.temporal.WeekFields
    val start = LocalDate.of(2020, 12, 25)
    val dates = (0 until 1200).map(start.plusDays(_))
    val expected = dates.map(d => d.toString -> d.get(WeekFields.ISO.weekOfYear())).toMap
    val got = dates.map(_.toString).toDF("raw")
      .withColumn("d", to_date(col("raw")))
      .withColumn("w", TimeDim.weekLiteralCol(col("d")))
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(got == expected)
  }

  test("literal week 0 where ISO week says 53 (the pinned G1 divergence)") {
    val df = Seq("2021-01-01").toDF("raw").withColumn("d", to_date(col("raw")))
      .select(
        TimeDim.weekLiteralCol(col("d")).as("lit"),
        TimeDim.weekCol(col("d")).as("iso"))
      .head()
    assert(df.getInt(0) == 0 && df.getInt(1) == 53)
  }

  test("quarter arithmetic (m-1)/3+1 across all months") {
    val byMonth = (1 to 12).map(m => attrs(f"2024-$m%02d-15 00:00:00").getInt(4))
    assert(byMonth == Seq(1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4))
  }

  test("single-digit hour parses (G7) and garbage drops (Q-b)") {
    val df = Seq("2019-03-05 9:05:00", "not-a-date", "2019-13-40 00:00:00")
      .toDF("raw").withColumn("ts", TimeDim.parseOrderDate(col("raw")))
    val parsed = df.where(col("ts").isNotNull).collect()
    assert(parsed.length == 1)
    assert(parsed.head.getTimestamp(1).toString.startsWith("2019-03-05 09:05"))
  }
}
