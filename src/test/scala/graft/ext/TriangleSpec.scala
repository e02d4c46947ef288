package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting on hand-built graphs. Exact
  * end-to-end values on the co-purchase graph are pinned by the DuckDB
  * twin (`ext_graph_triangles`); here: closed-form counts on known
  * topologies, an independent unoriented spelling, and partitioning
  * independence. */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical (u < v) edge frame from undirected pairs. */
  private def edges(pairs: (Long, Long)*): DataFrame =
    pairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct.toDF("u", "v")

  private def counts(e: DataFrame): Map[Long, Long] =
    GraphOps.triangleCountsOf(e).as[(Long, Long)].collect().toMap

  test("closed forms: K4 has C(3,2)=3 per node, C5 has none, two shared-edge triangles split 1/1/2/2") {
    // K4: every node is in exactly 3 of the 4 triangles
    val k4 = edges((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    assert(counts(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // C5: cycles of length ≥ 4 are triangle-free — empty output
    val c5 = edges((1L,2L),(2L,3L),(3L,4L),(4L,5L),(5L,1L))
    assert(counts(c5).isEmpty)
    // bowtie sharing EDGE (2,3): triangles {1,2,3} and {2,3,4}
    val bowtie = edges((1L,2L),(1L,3L),(2L,3L),(2L,4L),(3L,4L))
    assert(counts(bowtie) == Map(1L -> 1L, 4L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("agrees with the unoriented 3-cycle spelling on a hashed random graph") {
    // deterministic pseudo-random graph: edge (i, j) kept when a hash
    // of the pair lands in the band — dense enough for many triangles
    val n = 30L
    val pairs = for {
      i <- 1L to n; j <- (i + 1) to n
      if ((i * 2654435761L + j * 40503L) % 97) < 30
    } yield (i, j)
    val e = edges(pairs: _*)
    val got = counts(e)
    // independent spelling: symmetric adjacency, count at each corner a
    // the neighbor pairs (b < c) that close — no orientation anywhere
    val sym = e.select(col("u").as("a"), col("v").as("b"))
      .unionByName(e.select(col("v").as("a"), col("u").as("b")))
    val closed = sym.as("x").join(sym.as("y"),
        col("x.a") === col("y.a") && col("x.b") < col("y.b"))
      .select(col("x.a").as("node"), col("x.b").as("u"), col("y.b").as("v"))
      .join(e, Seq("u", "v"))
      .groupBy("node").agg(count(lit(1)).as("t"))
      .as[(Long, Long)].collect().toMap
    assert(got == closed, "oriented and unoriented spellings disagree")
    assert(got.nonEmpty, "hashed graph unexpectedly triangle-free")
    // each triangle is credited to exactly 3 corners
    assert(got.values.sum % 3 == 0)
  }

  test("counts are identical under different input partitionings") {
    val pairs = (1L to 60L).flatMap(i => Seq((i, i % 10 + 100L), (i, i % 7 + 100L)))
    val a = counts(edges(pairs: _*).repartition(1))
    val b = counts(edges(pairs: _*).repartition(13))
    assert(a == b)
  }
}
