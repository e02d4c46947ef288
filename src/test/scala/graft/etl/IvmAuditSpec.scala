package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVM refresh, χ² independence, NDV profile and conjunctive search:
  * the delta-merge ≡ recompute identity in-engine, an exactly
  * independent contingency table, planted nulls, and a controlled-df
  * retrieval fixture. End-to-end values are pinned by the DuckDB
  * twins. */
class IvmAuditSpec extends SparkSpec {
  import spark.implicits._

  test("ivm: base excludes the delta day; base ⊕ delta equals the full recompute") {
    val full = Star.salesFact(spark, sfSmoke)
      .groupBy("store_id", "time_id")
      .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"),
        count(lit(1)).as("n_rows"))
    val cut = full.agg(max("time_id").as("cut"))
    assert(Ivm.dailyMvBase(spark, sfSmoke).crossJoin(broadcast(cut))
      .where(col("time_id") >= col("cut")).count() == 0)
    val refreshed = Ivm.ivmDailyRefresh(spark, sfSmoke)
    assert(refreshed.crossJoin(broadcast(cut))
      .where(col("time_id") === col("cut")).count() > 0)
    val diff = refreshed.join(full, Seq("store_id", "time_id"), "full_outer")
      .where(refreshed("cents") =!= full("cents") ||
        refreshed("n_rows") =!= full("n_rows") ||
        refreshed("cents").isNull || full("cents").isNull)
    assert(diff.count() == 0)
  }

  test("streaming mv maintenance: per-batch delta appends fold to the batch recompute") {
    val fact = Star.salesFact(spark, sfSmoke)
      .select("store_id", "time_id", "total_revenue")
    val src = java.nio.file.Files.createTempDirectory("ivm-src").toString
    fact.repartition(4).write.mode("overwrite").parquet(src)
    val sink = TxParquetSink(
      java.nio.file.Files.createTempDirectory("ivm-mv").toString)
    val q = spark.readStream
      .schema(fact.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
      .writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) => Ivm.maintainDailyMv(batch, sink))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ivm-ckpt").toString)
      .start()
    q.awaitTermination()
    // more than one delta commit landed (the log is really incremental)
    assert(sink.version() >= 1)
    val streamed = Ivm.readStreamedMv(spark, sink).get
    val full = fact.groupBy("store_id", "time_id")
      .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"),
        count(lit(1)).as("n_rows"))
    val diff = streamed.as("s").join(full.as("f"),
        Seq("store_id", "time_id"), "full_outer")
      .where(col("s.cents") =!= col("f.cents") ||
        col("s.n_rows") =!= col("f.n_rows") ||
        col("s.cents").isNull || col("f.cents").isNull)
    assert(diff.count() == 0)
  }

  test("ivm join rule: all three delta terms are exercised and the wrong rules fail") {
    // the carve populations: each old/new combination must be nonempty,
    // otherwise the hash gate proves a degenerate rule
    val o = Star.table(spark, sfSmoke, "orders")
    val l = Star.table(spark, sfSmoke, "lineitem")
    def n(lp: String, op: String): Long =
      l.where(lp).join(o.where(op),
        col("l_orderkey") === col("o_orderkey")).count()
    val (dLoO, oLdO, dLdO) = (
      n("l_orderkey % 5 = 1", "o_orderkey % 7 != 3"),
      n("l_orderkey % 5 != 1", "o_orderkey % 7 = 3"),
      n("l_orderkey % 5 = 1", "o_orderkey % 7 = 3"))
    assert(dLoO > 0 && oLdO > 0 && dLdO > 0,
      s"every delta term must be live: $dLoO / $oLdO / $dLdO")

    val full = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"),
        expr("CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT)").as("ship_ym"))
      .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")).as("cents"),
        count(lit(1)).as("n_rows"))
      .orderBy("o_orderpriority", "ship_ym").collect().toSeq
    // the correct three-term refresh reproduces the recompute...
    assert(Ivm.ivmJoinRefresh(spark, sfSmoke).collect().toSeq == full)
    // ...and dropping the cross term visibly breaks it (rows missing),
    // proving the gate distinguishes the rules
    val broken = Ivm.joinMvBase(spark, sfSmoke)
      .unionByName(l.where("l_orderkey % 5 = 1")
        .join(o.where("o_orderkey % 7 != 3"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"),
          expr("CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT)").as("ship_ym"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")).as("cents"),
          count(lit(1)).as("n_rows")))
      .unionByName(l.where("l_orderkey % 5 != 1")
        .join(o.where("o_orderkey % 7 = 3"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"),
          expr("CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT)").as("ship_ym"))
        .agg(sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")).as("cents"),
          count(lit(1)).as("n_rows")))
      .groupBy("o_orderpriority", "ship_ym")
      .agg(sum("cents").as("cents"), sum("n_rows").as("n_rows"))
      .agg(sum("n_rows")).head.getLong(0)
    assert(broken == full.map(_.getLong(3)).sum - dLdO,
      "dropping the cross term must miss exactly the both-new pairs")
  }

  test("ivm minmax retraction: targeting is exact and the refresh equals the recompute") {
    val daily = Star.salesFact(spark, sfSmoke)
      .groupBy("store_id", "time_id")
      .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"))
      .localCheckpoint(eager = true)
    val cut = daily.agg(max(col("time_id").cast("string"))).head().getString(0)
    // independent truth: stores whose cut-day value is their extremum
    val rows = daily.select(col("store_id"), col("time_id").cast("string"),
        col("cents"))
      .as[(Long, String, Long)].collect()
    val byStore = rows.groupBy(_._1)
    val expectAffected = byStore.collect { case (sid, rs)
      if rs.exists(r => r._2 == cut &&
        (r._3 == rs.map(_._3).min || r._3 == rs.map(_._3).max)) => sid
    }.toSet
    val affected = Ivm.ivmMinMaxAffected(spark, sfSmoke)
      .as[Long].collect().toSet
    assert(affected == expectAffected, "targeting must be exact, not conservative")
    // the refresh equals the from-scratch recompute over surviving days
    val refreshed = Ivm.ivmMinMaxRefresh(spark, sfSmoke)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val expect = byStore.toSeq.flatMap { case (sid, rs) =>
      val rest = rs.filter(_._2 != cut).map(_._3)
      if (rest.isEmpty) None
      else Some((sid, rest.min, rest.max, rest.size.toLong))
    }.sortBy(_._1)
    assert(refreshed == expect)
    // the three branches partition the surviving stores (no dup rows)
    assert(refreshed.map(_._1).distinct.size == refreshed.size)

    // constructed retraction hitting EVERY branch: store 1 loses its
    // max (recompute), store 2 loses an interior value (decrement),
    // store 3 is untouched, store 4 loses its only row (vanishes),
    // store 5 loses its min (recompute)
    val hand = Seq(
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 9L, 30L),
      (2L, 1L, 10L), (2L, 2L, 30L), (2L, 9L, 20L),
      (3L, 1L, 7L), (3L, 2L, 8L),
      (4L, 9L, 99L),
      (5L, 1L, 50L), (5L, 2L, 60L), (5L, 9L, 40L))
      .toDF("store_id", "time_id", "cents")
    val handAffected = Ivm.ivmMinMaxAffectedOver(hand).as[Long].collect().toSet
    assert(handAffected == Set(1L, 4L, 5L),
      "extremum-on-cut stores (incl. the vanishing singleton) recompute")
    val handOut = Ivm.ivmMinMaxOver(hand)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(handOut == Seq((1L, 10L, 20L, 2L), (2L, 10L, 30L, 2L),
      (3L, 7L, 8L, 2L), (5L, 50L, 60L, 2L)),
      "recompute, decrement, verbatim, and vanish branches all correct")
  }

  test("stream ivm join: every arrival order is exercised by the replay carve") {
    // under the replay's decorrelated carves, matched (line, header)
    // pairs must land line-after-header, line-before-header, AND
    // same-batch — otherwise the composed-stream gate would pass
    // without ever exercising a cross term
    val B = graft.streaming.StreamIvm.ReplayBatches
    val o = Star.table(spark, sfSmoke, "orders")
      .select(col("o_orderkey"),
        pmod(col("o_orderkey"), lit(B.toLong)).cast("int").as("ob"))
    val l = Star.table(spark, sfSmoke, "lineitem")
      .select(col("l_orderkey"),
        pmod(col("l_orderkey") + col("l_linenumber"), lit(B.toLong))
          .cast("int").as("lb"))
    val pairs = l.join(o, col("l_orderkey") === col("o_orderkey"))
    val after = pairs.where(col("lb") > col("ob")).count()
    val before = pairs.where(col("lb") < col("ob")).count()
    val same = pairs.where(col("lb") === col("ob")).count()
    assert(after > 0 && before > 0 && same > 0,
      s"all three arrival orders must be live: $after / $before / $same")
  }

  test("ivm distinct retraction: multiplicity accounting beats the naive distinct-subtract") {
    // store 1: product 100 sold day 1 AND day 9 (cut) — deleting the
    // day-9 copy must NOT remove it from the view; product 200 sold
    // only day 9 — must leave. store 2 untouched by the cut day.
    val hand = Seq(
      (1L, 100L, 1L), (1L, 100L, 9L), (1L, 200L, 9L), (1L, 300L, 2L),
      (2L, 100L, 1L), (2L, 400L, 2L))
      .toDF("store_id", "product_id", "time_id")
    val out = Ivm.ivmDistinctOver(hand).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 2L),
      "multi-copy product survives, last-copy product leaves, untouched store verbatim")
    // the naive rule (view minus the delta's distinct count) would give
    // store 1: 3 - 2 = 1 — wrong on exactly the multi-copy case
    assert(out(1L) != 1L)
    // real data: refresh ≡ from-scratch recompute over surviving days
    val f = Star.salesFact(spark, sfSmoke)
      .select("store_id", "product_id", "time_id")
    val cut = f.agg(max("time_id").as("cut"))
    val expect = f.crossJoin(broadcast(cut))
      .where(col("time_id") < col("cut"))
      .groupBy("store_id")
      .agg(countDistinct("product_id").as("n_products"))
      .orderBy("store_id").as[(Long, Long)].collect().toSeq
    assert(Ivm.ivmDistinctRefresh(spark, sfSmoke)
      .as[(Long, Long)].collect().toSeq == expect)
  }

  test("ivm deletes: a negated delta retracts exactly the deleted day's rows") {
    // the scaladoc claims the same merge expression handles deletes as
    // negated deltas — checked here: stream the fact in, then retract
    // one full day and compare to the recompute WITHOUT that day
    val fact = Star.salesFact(spark, sfSmoke)
      .select("store_id", "time_id", "total_revenue")
    val sink = TxParquetSink(
      java.nio.file.Files.createTempDirectory("ivm-del").toString)
    Ivm.maintainDailyMv(fact, sink)
    val cut = fact.agg(max("time_id").as("cut"))
    val deleted = fact.crossJoin(broadcast(cut))
      .where(col("time_id") === col("cut"))
      .select("store_id", "time_id", "total_revenue")
    // negated delta: same aggregate shape, negative measures
    sink.append(deleted.groupBy("store_id", "time_id")
      .agg((-sum((col("total_revenue") * 100).cast("long"))).as("cents"),
        (-count(lit(1))).as("n_rows")))
    val state = Ivm.readStreamedMv(spark, sink).get
      .where(col("n_rows") =!= 0L) // fully-retracted groups vanish
    val expect = fact.crossJoin(broadcast(cut))
      .where(col("time_id") < col("cut"))
      .groupBy("store_id", "time_id")
      .agg(sum((col("total_revenue") * 100).cast("long")).as("cents"),
        count(lit(1)).as("n_rows"))
    val diff = state.as("s").join(expect.as("f"),
        Seq("store_id", "time_id"), "full_outer")
      .where(col("s.cents") =!= col("f.cents") ||
        col("s.n_rows") =!= col("f.n_rows") ||
        col("s.cents").isNull || col("f.cents").isNull)
    assert(diff.count() == 0)
  }

  test("chi2: proportional margins give zero everywhere; the grid is zero-filled") {
    val dir = tempDataDir(
      "customer" -> Seq((1L, "X"), (2L, "Y")).toDF("c_custkey", "c_mktsegment"),
      "orders" -> (
        Seq.fill(10)((1L, "P")) ++ Seq.fill(20)((1L, "Q")) ++
          Seq.fill(5)((2L, "P")) ++ Seq.fill(10)((2L, "Q"))
        ).toDF("o_custkey", "o_orderpriority"))
    val r = EtlQueries.chi2Independence(spark, dir).collect()
      .map(row => (row.getString(0), row.getString(1)) ->
        (row.getLong(2), row.getDouble(5))).toMap
    assert(r.size == 4)
    assert(r.values.forall(_._2 == 0.0))
    // drop the (Y, P) cell: the zero-filled grid must still emit it
    val dir2 = tempDataDir(
      "customer" -> Seq((1L, "X"), (2L, "Y")).toDF("c_custkey", "c_mktsegment"),
      "orders" -> (
        Seq.fill(10)((1L, "P")) ++ Seq.fill(10)((1L, "Q")) ++
          Seq.fill(10)((2L, "Q"))
        ).toDF("o_custkey", "o_orderpriority"))
    val r2 = EtlQueries.chi2Independence(spark, dir2).collect()
      .map(row => (row.getString(0), row.getString(1)) ->
        (row.getLong(2), row.getDouble(5))).toMap
    assert(r2((("Y", "P"))) == ((0L, {
      // observed 0, rt = 10, ct = 10, N = 30 → (0·30 − 100)²/(30·10·10)
      val delta = 0.0 * 30.0 - 10.0 * 10.0
      (delta * delta) / ((30.0 * 10.0) * 10.0)
    })))
  }

  test("ndv profile: exact ndv, planted nulls, lexicographic min/max") {
    val rows = Seq(
      (1L, 10L, 100L, 1, "A", "F", Some(java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))),
      (1L, 20L, 100L, 2, "R", "F", Some(java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))),
      (2L, 10L, 200L, 1, "A", "O", None))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val dir = tempDataDir("lineitem" -> rows)
    val r = EtlQueries.ndvProfile(spark, dir).collect()
      .map(row => row.getString(0) ->
        (row.getLong(1), row.getLong(2), row.getLong(3),
          row.getString(4), row.getString(5))).toMap
    assert(r("l_orderkey") == ((3L, 0L, 2L, "1", "2")))
    assert(r("l_shipdate") == ((3L, 1L, 2L, "2024-01-02", "2024-01-03")))
    assert(r("l_returnflag") == ((3L, 0L, 2L, "A", "R")))
    // integer-as-string min/max is lexicographic BY CONTRACT: 100 < 20
    assert(r("l_partkey") == ((3L, 0L, 2L, "10", "20")))
    assert(r("l_suppkey")._4 == "100")
  }

  test("conjunctive search on a nested-df corpus returns exactly the AND set") {
    // doc k holds terms a01..a(13−k): df(a_j) = 13 − j, so df ranks
    // 10 and 11 are a10 (df 3) and a11 (df 2) — both only in docs 1, 2
    val docs = (1 to 12).map { k =>
      (k.toLong, (1 to (13 - k)).map(j => f"a$j%02d").mkString(" "))
    }.toDF("doc_id", "text")
    val dir = tempDataDir("documents" -> docs)
    val r = graft.ext.TextOps.conjunctiveSearch(spark, dir).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    assert(r.toSeq == Seq((1L, 2L), (2L, 2L)))
  }
}
