package graft.streaming

import graft.SparkSpec
import graft.sources.CsvSources
import java.nio.file.{Files, Paths}

/** Mid-stream failure → restart-from-checkpoint → state equals the
  * batch replay. This is the exactly-once demonstration the reference
  * pipeline never had (its recovery story is "the O(n²) seen-list and
  * per-row probes happen to re-filter re-inserts",
  * `/root/reference/src/Meshjoin.java:322,373`): here the crash is
  * injected in the WORST window — after a micro-batch's parquet append
  * is durable, before the engine commits the batch's offsets — so the
  * restart must both resume from the checkpoint (no reprocessing of
  * earlier batches' files) and absorb the replay of the torn batch via
  * the sink-side anti-join. */
class CrashRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val header = "order_id,order_date_raw,product_id,quantity_ordered,customer_id,time_id"

  test("kill after a durable write, restart: fact table equals the batch replay") {
    val srcDir = Files.createTempDirectory("txcrash").toString
    val factDir = Files.createTempDirectory("factcrash").toString + "/fact"
    val ckpt = Files.createTempDirectory("ckptcrash").toString
    val products = Seq(("100", "widget", BigDecimal("2.50")), ("200", "gadget", BigDecimal("4.00")))
      .toDF("product_id", "product_name", "price")
    val customers = Seq(("7", "alice"), ("8", "bob")).toDF("customer_id", "customer_name")

    // four source files = four micro-batches (maxFilesPerTrigger=1);
    // file c re-delivers order 2 so the replayed window also carries a
    // cross-batch duplicate
    val files = Seq(
      "a.csv" -> Seq("1,2024-03-05 9:05:00,100,4,7,t1"),
      "b.csv" -> Seq("2,2024-03-09 12:00:00,200,2,8,t2",
                     "3,2024-03-09 13:00:00,100,1,7,t3"),
      "c.csv" -> Seq("2,2024-03-09 12:00:00,200,2,8,t2", // re-delivery
                     "4,2024-03-10 08:00:00,200,5,8,t4"),
      "d.csv" -> Seq("5,2024-03-11 09:00:00,100,3,7,t5"))
    files.zipWithIndex.foreach { case ((name, rows), i) =>
      val p = Paths.get(s"$srcDir/$name")
      Files.writeString(p, (header +: rows :+ "").mkString("\n"))
      // the file source orders batches by modification time — same-ms
      // mtimes would make "which file is batch 1" nondeterministic
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    }

    // First run: crash AFTER batch 1's parquet append is durable but
    // before its offsets commit. The engine surfaces the injected
    // failure as a StreamingQueryException.
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamETL.runAvailableNow(spark,
        CsvSources.transactionStream(spark, srcDir, maxFilesPerTrigger = 1),
        products, customers, factDir, ckpt,
        afterBatchWrite = id => if (id == 1) sys.error("injected crash after durable write"))
    }
    assert(thrown.getMessage.contains("injected crash"))

    // The torn state is really torn: batch 1's rows are on disk, the
    // remaining files are not.
    val partial = spark.read.parquet(factDir).select("order_id").as[String].collect().toSeq
    assert(partial.sorted == Seq("1", "2", "3"),
      s"expected batches 0-1 durable before the crash, got $partial")

    // Restart from the same checkpoint, no crash: must replay batch 1
    // (offsets were never committed), absorb its re-insert, then finish
    // batches 2-3.
    StreamETL.runAvailableNow(spark,
      CsvSources.transactionStream(spark, srcDir, maxFilesPerTrigger = 1),
      products, customers, factDir, ckpt)

    val recovered = spark.read.parquet(factDir)
      .select("order_id", "quantity_ordered", "total_revenue")
      .orderBy("order_id").collect().toSeq

    // Batch replay twin: the same transforms over the full input in one
    // batch pass, first-wins per order — byte-equal modulo row order.
    val allTx = CsvSources.transactions(spark, srcDir)
    val replay = graft.etl.Upserts.firstWins(
        StreamETL.withMeasures(StreamETL.meshJoin(
          StreamETL.cleanTransactions(allTx), products, customers)),
        Seq("order_id"),
        Seq("product_id", "customer_id", "quantity_ordered", "order_ts"))
      .select("order_id", "quantity_ordered", "total_revenue")
      .orderBy("order_id").collect().toSeq

    assert(recovered == replay,
      "post-recovery warehouse state diverged from the one-shot batch replay")
    assert(recovered.map(_.getString(0)) == Seq("1", "2", "3", "4", "5"),
      "a replayed batch double-inserted or a file was skipped")
  }

  test("ACID sink: torn batch replays to zero inserts, concurrent writer's key wins") {
    val srcDir = Files.createTempDirectory("txcrash2").toString
    val ckpt = Files.createTempDirectory("ckptcrash2").toString
    val sink = graft.etl.TxParquetSink(
      Files.createTempDirectory("txsinkcrash").toString + "/fact")
    val products = Seq(("100", "widget", BigDecimal("2.50")), ("200", "gadget", BigDecimal("4.00")))
      .toDF("product_id", "product_name", "price")
    val customers = Seq(("7", "alice"), ("8", "bob")).toDF("customer_id", "customer_name")

    val files = Seq(
      "a.csv" -> Seq("1,2024-03-05 9:05:00,100,4,7,t1"),
      "b.csv" -> Seq("2,2024-03-09 12:00:00,200,2,8,t2",
                     "3,2024-03-09 13:00:00,100,1,7,t3"),
      "c.csv" -> Seq("2,2024-03-09 12:00:00,200,2,8,t2", // re-delivery
                     "4,2024-03-10 08:00:00,200,5,8,t4"),
      "d.csv" -> Seq("5,2024-03-11 09:00:00,100,3,7,t5"))
    files.zipWithIndex.foreach { case ((name, rows), i) =>
      val p = Paths.get(s"$srcDir/$name")
      Files.writeString(p, (header +: rows :+ "").mkString("\n"))
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    }

    // enrich a raw tx row through the same transforms, so foreign writes
    // carry the exact fact schema
    def enriched(raw: String) = StreamETL.withMeasures(StreamETL.meshJoin(
      StreamETL.cleanTransactions(
        spark.read.option("header", "true")
          .schema(graft.model.Schemas.txSchema)
          .csv(Seq(header, raw).toDS())),
      products, customers))

    // Run 1: crash AFTER batch 1's merge COMMITTED but before offsets.
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamETL.runAvailableNowTx(spark,
        CsvSources.transactionStream(spark, srcDir, maxFilesPerTrigger = 1),
        products, customers, sink, ckpt,
        afterBatchWrite = id => if (id == 1) sys.error("injected crash after commit"))
    }
    assert(thrown.getMessage.contains("injected crash"))
    // no torn state is even POSSIBLE here: every visible row is a
    // committed prefix of the log
    val partial = sink.readSnapshot(spark).get
      .select("order_id").as[String].collect().toSeq
    assert(partial.sorted == Seq("1", "2", "3"))

    // A CONCURRENT writer (backfill) commits order 5 with its own values
    // while the pipeline is down. The stream's later insert of order 5
    // must lose to it — committed-first wins under MERGE semantics.
    val foreign = enriched("5,2024-03-11 09:00:00,200,9,8,t5")
    assert(sink.mergeUpsert(spark, foreign, Seq("order_id"),
      Seq("product_id", "customer_id", "quantity_ordered", "order_ts")) == 1)

    // Restart: batch 1 replays (offsets never committed) and must merge
    // to ZERO new rows; batches 2-3 then land, minus the stolen key.
    StreamETL.runAvailableNowTx(spark,
      CsvSources.transactionStream(spark, srcDir, maxFilesPerTrigger = 1),
      products, customers, sink, ckpt)

    val fin = sink.readSnapshot(spark).get
      .select("order_id", "product_id", "quantity_ordered")
      .as[(String, String, Int)].collect().toSeq.sortBy(_._1)
    assert(fin.map(_._1) == Seq("1", "2", "3", "4", "5"),
      "replayed batch double-inserted or a key was lost")
    assert(fin.find(_._1 == "5").get == (("5", "200", 9)),
      "the concurrent writer's committed row must win the overlapping key")
    // exactly one commit per effective batch + the foreign write; the
    // replayed batch published NOTHING (no empty commits)
    assert(sink.commits().map(_._2.rows).sum == 5,
      "committed row count must equal the distinct keys")
  }
}
