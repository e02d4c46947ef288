package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TxParquetSink
import graft.plans.MvCatalog

/** The DataSourceV2 catalog over the transactional tier: pure SQL
  * text reaches the same snapshot plans, the same ACID commits, and
  * the same optimizer rules as the programmatic API. */
class GraftCatalogSpec extends AnyFunSuite {

  private def fresh(root: String, extensions: Boolean = true): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master("local[2]")
      .appName("GraftCatalogSpec")
      .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      .config("spark.sql.catalog.graft.root", root)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    (if (extensions)
      b.config("spark.sql.extensions", "graft.plans.GraftExtensions")
    else b).getOrCreate()
  }

  private def isLocal(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.isInstanceOf[LocalRelation])

  test("SELECT through the catalog serves the sink's own snapshot plan, masks included") {
    val root = Files.createTempDirectory("graftcat").toString
    val s = fresh(root)
    try {
      import s.implicits._
      val t = TxParquetSink(s"$root/orders")
      t.append((1 to 10).map(i => (i, s"c$i", i * 100L)).toDF("id", "name", "cents"))
      t.append((11 to 20).map(i => (i, s"c$i", i * 100L)).toDF("id", "name", "cents"))
      val viaSql = s.sql(
        "SELECT id, cents FROM graft.orders WHERE id >= 5 ORDER BY id")
      assert(viaSql.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
        (5 to 20).map(i => (i, i * 100L)))
      // a delete mask must be honored — the proof SQL is NOT a bare
      // parquet scan of the data directories
      t.deleteWhere(s, "id = 7")
      assert(s.sql("SELECT count(*) AS n FROM graft.orders WHERE id >= 5")
        .head().getLong(0) == 15L)
      // time travel: the pre-delete commit still answers
      assert(s.sql("SELECT count(*) AS n FROM graft.orders VERSION AS OF 1")
        .head().getLong(0) == 20L)
      // self-join through the catalog: shared cached snapshot frames
      // must deduplicate like any df.join(df)
      val selfJoin = s.sql(
        """SELECT a.id FROM graft.orders a JOIN graft.orders b
          |ON a.id = b.id + 1 ORDER BY a.id LIMIT 3""".stripMargin)
      assert(selfJoin.collect().map(_.getInt(0)).toSeq == Seq(2, 3, 4))
    } finally s.stop()
  }

  test("MetadataAggregates and MvRewrite fire through pure SQL text") {
    val root = Files.createTempDirectory("graftcat").toString
    val s = fresh(root)
    try {
      import s.implicits._
      val t = TxParquetSink(s"$root/monthly")
      Seq("2024-01", "2024-02").zipWithIndex.foreach { case (m, i) =>
        t.appendWithStats(
          (1 to 15).map(d => (m, s"g${d % 3}", (i * 15 + d).toLong))
            .toDF("month", "g", "cents"),
          Seq("month", "cents"))
      }
      // the metadata rule: a whole-profile panel over SQL text is a
      // literal — no scan stage through the CATALOG path either
      val panel = s.sql(
        """SELECT count(*) AS n, min(cents) AS lo, max(cents) AS hi,
          |sum(cents) AS sm FROM graft.monthly""".stripMargin)
      assert(isLocal(panel), panel.queryExecution.optimizedPlan.toString)
      val r = panel.head()
      assert(r.getLong(0) == 30L && r.getLong(1) == 1L &&
        r.getLong(2) == 30L && r.getLong(3) == (1 to 30).sum.toLong)
      // the MV rule: a registered rollup serves a SQL GROUP BY
      val mvPath = s"$root/_views/monthly_by_g"
      MvCatalog.registerRollup(s, t, Seq("g"), Seq("cents"), mvPath)
      try {
        val grouped = s.sql(
          """SELECT g, sum(cents) AS s, count(*) AS c
            |FROM graft.monthly GROUP BY g ORDER BY g""".stripMargin)
        val leaves = grouped.queryExecution.optimizedPlan.collectLeaves()
        assert(leaves.nonEmpty && leaves.forall {
          case lr: LogicalRelation => lr.relation match {
            case h: HadoopFsRelation =>
              h.location.rootPaths.forall(_.toUri.getPath.startsWith(mvPath))
            case _ => false
          }
          case _ => false
        }, grouped.queryExecution.optimizedPlan.toString)
        // and the values match the direct computation
        val direct = t.readSnapshot(s).get.groupBy("g")
          .agg(org.apache.spark.sql.functions.sum("cents").as("s"),
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("c"))
          .orderBy("g")
        assert(grouped.collect().toSeq == direct.collect().toSeq)
      } finally MvCatalog.unregister(t.dir)
    } finally s.stop()
  }

  test("INSERT INTO appends atomically; INSERT OVERWRITE is one base commit; DDL works") {
    val root = Files.createTempDirectory("graftcat").toString
    val s = fresh(root)
    try {
      s.sql("CREATE TABLE graft.ns.items (id INT, label STRING)")
      assert(s.sql("SHOW TABLES IN graft.ns").collect()
        .map(_.getString(1)).contains("items"))
      // empty created table reads as zero rows through its DDL schema
      assert(s.sql("SELECT * FROM graft.ns.items").collect().isEmpty)
      s.sql("INSERT INTO graft.ns.items VALUES (1, 'a'), (2, 'b')")
      s.sql("INSERT INTO graft.ns.items VALUES (3, 'c')")
      val t = TxParquetSink(s"$root/ns/items")
      assert(t.version() == 1L, "two INSERTs = two ACID commits")
      assert(s.sql("SELECT * FROM graft.ns.items ORDER BY id").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq ==
        Seq((1, "a"), (2, "b"), (3, "c")))
      s.sql("INSERT OVERWRITE graft.ns.items VALUES (9, 'z')")
      assert(s.sql("SELECT * FROM graft.ns.items").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((9, "z")))
      assert(t.commits().last._2.base, "overwrite publishes a BASE commit")
      // pre-overwrite history is still addressable
      assert(s.sql("SELECT count(*) AS n FROM graft.ns.items VERSION AS OF 1")
        .head().getLong(0) == 3L)
      s.sql("DROP TABLE graft.ns.items")
      assert(!s.catalog.tableExists("graft.ns.items"))
    } finally s.stop()
  }

  test("a session without the extensions gets a configuration error, not a maskless scan") {
    val root = Files.createTempDirectory("graftcat").toString
    val s = fresh(root, extensions = false)
    try {
      import s.implicits._
      TxParquetSink(s"$root/t").append(Seq((1, 2L)).toDF("a", "b"))
      val e = intercept[Exception] {
        s.sql("SELECT * FROM graft.t").collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("GraftExtensions")),
        s"expected the configuration hint, got: $e")
    } finally s.stop()
  }
}
