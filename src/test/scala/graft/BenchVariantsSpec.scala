package graft

/** The paired-bench reference spellings must be row-for-row identical
  * to the registered queries they control for — otherwise the a/b
  * ratio compares different work and adjudicates nothing. Equality is
  * pinned on the smoke SF including output ORDER (the bench times the
  * full plan, sort included). */
class BenchVariantsSpec extends SparkSpec {

  for ((name, variant) <- BenchVariants.variants.toSeq.sortBy(_._1)) {
    test(s"variant $name matches the registered query row-for-row") {
      val a = SparkEntry.queries(name)(spark, sfSmoke)
      val b = variant(spark, sfSmoke)
      assert(a.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
        b.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        "schemas must match")
      val ra = a.collect().toSeq
      val rb = b.collect().toSeq
      assert(ra === rb, s"variant output diverges for $name")
      assert(ra.nonEmpty, "the pinned pair must exercise real rows")
    }
  }
}
