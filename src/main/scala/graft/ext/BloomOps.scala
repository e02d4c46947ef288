package graft.ext

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the explicit form of the runtime
  * filtering every warehouse engine applies to selective star joins. The
  * reference's JDBC warehouse delegates this to MySQL's nested-loop inner
  * join (`/root/reference/src/Meshjoin.java:325-336`); at 100 TB the
  * equivalent Spark plan is a shuffle of the full fact table unless the
  * probe side is pre-pruned.
  *
  * Shape: build a bloom filter over the qualifying build-side keys (ONE
  * small aggregate, map-side merged), inline the serialized filter as a
  * constant in a codegen'd `might_contain` probe ON THE FACT SCAN, then
  * run the exact semi-join on the survivors. The bloom is a pure
  * prefilter: false positives are removed by the exact join, so results
  * are bit-identical to the plain semi-join while the shuffle carries
  * only `fp_rate + selectivity` of the fact rows instead of all of them.
  * Spark's own `InjectRuntimeFilter` does exactly this rewrite when both
  * sides sit in one query; owning the pattern as an operator covers the
  * cases it cannot see — a filter built once and applied to many
  * downstream jobs, or applied behind an API boundary the optimizer
  * does not cross.
  *
  * The materialized filter is a driver-side CONSTANT (like a broadcast
  * variable, ~`numBits/8` bytes — 256 KiB here), not a per-row collect;
  * that is the same data movement Spark's runtime filter performs via its
  * scalar-subquery broadcast.
  */
object BloomOps {

  /** Prune `probe` to rows whose `probeKey` might be in `buildKeys`
    * (exactly: a superset of the matching rows), then exact semi-join.
    * `expectedItems` sizes the filter; `numBits` trades constant size
    * against false-positive rate (n·8 bits ⇒ ~2 % fp at capacity). The
    * defaults carry a 64 KiB constant — size both up for larger build
    * sides (the filter itself scales to ~n·8 bits, still KBs per million
    * keys, which is why this pattern survives build sides far too big to
    * broadcast as a hash relation). */
  def bloomSemiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedItems: Long = 1L << 16, numBits: Long = 1L << 19): DataFrame = {
    val bloom = build
      .agg(GraftColumnBridge.bloomAgg(xxhash64(col(buildKey)), expectedItems, numBits)
        .as("bloom"))
      .head().getAs[Array[Byte]]("bloom")
    probe
      .where(GraftColumnBridge.bloomMightContain(lit(bloom), xxhash64(col(probeKey))))
      .join(build, probe(probeKey) === build(buildKey), "left_semi")
  }

  /** Line items of urgent 1997 orders (~3 % of orders), aggregated by
    * return flag — the canonical selective star probe. Money crosses the
    * comparison surface as integer cents via `floor(x · 100)`: the
    * double multiply and floor are bit-identical in both engines, and
    * BIGINT sums are order-independent (a raw double sum would depend on
    * partitioning; see ExtOracleSql's determinism rules). */
  def urgentOrderRevenue(spark: SparkSession, dir: String): DataFrame = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .where(col("o_orderpriority") === "1-URGENT" &&
        year(col("o_orderdate").cast("date")) === 1997)
      .select("o_orderkey")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
    bloomSemiJoin(lineitem, "l_orderkey", orders, "o_orderkey")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_items"),
        sum(expr("CAST(floor(l_quantity) AS BIGINT)")).as("sum_qty"),
        sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")).as("revenue_cents"))
      .orderBy("l_returnflag")
  }
}
