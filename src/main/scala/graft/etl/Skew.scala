package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins — the manual fallback when AQE's runtime
  * skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by default)
  * isn't enough: AQE only splits SORT-MERGE join partitions, and only
  * after a shuffle has already materialized the skew. Salting rewrites
  * the plan so one hot key becomes `factor` distinct keys from the start:
  *
  *   left (large, skewed):  key → (key, rand salt ∈ [0, factor))
  *   right (smaller):       key → (key, s) for every s — `factor`× replicate
  *
  * Equi-join on (key, salt) then spreads the hot key over `factor`
  * reducers. Replication multiplies the right side, so `factor` trades
  * right-side volume against reducer balance — at 100 TB you salt only
  * the keys diagnosed hot, joining the rest normally; this utility salts
  * uniformly for simplicity and is exercised by `SkewSpec` for
  * result-equivalence with the plain join. */
object Skew {

  /** Inner equi-join on `key` with uniform salting. Semantically identical
    * to `left.join(right, key)` for any data; physically spreads each
    * left key across `factor` partitions. `right` must have unique keys
    * per row-multiplication semantics of the plain join to hold trivially;
    * duplicate right keys are fine too — each copy is replicated the same
    * way. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedEquiJoin uses a temp column named __salt; input already has one")
    val salted = left.withColumn("__salt",
      (rand(seed = 42) * factor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${factor - 1})")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
