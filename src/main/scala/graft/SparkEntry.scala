package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  import graft.olap.{Queries, OracleSql}

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01TopProducts(spark, "/root/testdata/sf0.001", weekend = true)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_weekend" -> ((s, dir) => Queries.q01TopProducts(s, dir, weekend = true)),
    "q01_weekday" -> ((s, dir) => Queries.q01TopProducts(s, dir, weekend = false)),
    "q02_quarterly_growth" -> Queries.q02QuarterlyGrowth _,
    "q02_literal" -> Queries.q02LiteralGrowth _,
    "q03_supplier_contribution" -> Queries.q03SupplierContribution _,
    "q04_seasonal" -> Queries.q04Seasonal _,
    "q05_volatility" -> Queries.q05Volatility _,
    "q05_literal" -> Queries.q05LiteralVolatility _,
    "q06_affinity" -> Queries.q06Affinity _,
    "q07_rollup" -> Queries.q07Rollup _,
    "q08_halfyear" -> Queries.q08HalfYear _,
    "q09_spikes" -> Queries.q09Spikes _,
    "q10_store_quarterly" -> Queries.q10StoreQuarterly _,
    "q11_latest_month" -> Queries.q11LatestMonth _,
    "q12_top_per_store" -> ((s, dir) => Queries.q12TopPerStore(s, dir)),
    "etl_time_dim" -> graft.etl.EtlQueries.timeDim _,
    "etl_time_dim_literal" -> graft.etl.EtlQueries.timeDimLiteral _,
    "etl_dim_product" -> graft.etl.EtlQueries.dimProduct _,
    "etl_sales_fact" -> graft.etl.EtlQueries.salesFact _,
    "etl_upsert_antijoin" -> graft.etl.EtlQueries.upsertAntiJoin _,
    "etl_fact_dedup_order" -> graft.etl.EtlQueries.factDedupPerOrder _,
    "etl_dedup_events" -> graft.etl.EtlQueries.dedupEvents _,
    "etl_events_hourly" -> graft.etl.EtlQueries.eventsHourly _,
    "etl_event_sessions" -> graft.etl.EtlQueries.eventSessions _,
    "ext_text_stats" -> graft.ext.ExtQueries.textStats _,
    "ext_text_langid" -> graft.ext.ExtQueries.langId _,
    "ext_text_fingerprint" -> graft.ext.ExtQueries.fingerprint _,
    "ext_text_tfidf" -> graft.ext.ExtQueries.tfidf _,
    "ext_text_length_stats" -> graft.ext.ExtQueries.lengthStats _,
    "ext_dedup_exact" -> graft.ext.ExtQueries.dedupExact _,
    "ext_dedup_jaccard" -> graft.ext.ExtQueries.dedupJaccard _,
    "ext_dedup_minhash_lsh" -> graft.ext.ExtQueries.dedupMinhashLsh _,
    "ext_dedup_simhash" -> graft.ext.ExtQueries.dedupSimhash _,
    "ext_dedup_embedding" -> graft.ext.ExtQueries.dedupEmbedding _,
    "ext_dedup_clusters" -> graft.ext.ExtQueries.dedupClusters _,
    "ext_sim_topk" -> graft.ext.ExtQueries.simTopK _,
    "ext_sim_lsh_topk" -> graft.ext.ExtQueries.simLshTopK _,
    "ext_sim_ivf_topk" -> graft.ext.ExtQueries.simIvfTopK _,
    "ext_sim_lsh_multiprobe" -> graft.ext.ExtQueries.simLshMultiProbe _,
    "ext_asof_events_orders" -> graft.ext.ExtQueries.asofEventsOrders _,
    "ext_split_assign" -> graft.ext.ExtQueries.splitAssign _,
    "ext_sample_stratified" -> graft.ext.ExtQueries.sampleStratified _,
    "ext_sketch_vocab" -> graft.ext.ExtQueries.vocabSketch _,
    "ext_pipeline_clean" -> graft.ext.ExtQueries.pipelineClean _,
    "ext_quality_deciles" -> graft.ext.ExtQueries.qualityDeciles _,
    "ext_text_novelty" -> graft.ext.ExtQueries.novelty _,
    "ext_media_meta" -> graft.ext.ExtQueries.mediaMeta _,
    "ext_media_decode" -> graft.ext.ExtQueries.mediaDecode _,
    "ext_media_frames" -> graft.ext.ExtQueries.mediaFrames _
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_weekend" -> OracleSql.q01(weekend = true),
    "q01_weekday" -> OracleSql.q01(weekend = false),
    "q02_quarterly_growth" -> OracleSql.q02,
    "q02_literal" -> OracleSql.q02Literal,
    "q03_supplier_contribution" -> OracleSql.q03,
    "q04_seasonal" -> OracleSql.q04,
    "q05_volatility" -> OracleSql.q05,
    "q05_literal" -> OracleSql.q05Literal,
    "q06_affinity" -> OracleSql.q06,
    "q07_rollup" -> OracleSql.q07,
    "q08_halfyear" -> OracleSql.q08,
    "q09_spikes" -> OracleSql.q09,
    "q10_store_quarterly" -> OracleSql.q10,
    "q11_latest_month" -> OracleSql.q11,
    "q12_top_per_store" -> OracleSql.q12,
    "etl_time_dim" -> graft.etl.EtlOracleSql.timeDim,
    "etl_time_dim_literal" -> graft.etl.EtlOracleSql.timeDimLiteral,
    "etl_dim_product" -> graft.etl.EtlOracleSql.dimProduct,
    "etl_sales_fact" -> graft.etl.EtlOracleSql.salesFact,
    "etl_upsert_antijoin" -> graft.etl.EtlOracleSql.upsertAntiJoin,
    "etl_fact_dedup_order" -> graft.etl.EtlOracleSql.factDedupPerOrder,
    "etl_dedup_events" -> graft.etl.EtlOracleSql.dedupEvents,
    "etl_events_hourly" -> graft.etl.EtlOracleSql.eventsHourly,
    "etl_event_sessions" -> graft.etl.EtlOracleSql.eventSessions,
    "ext_text_stats" -> graft.ext.ExtOracleSql.textStats,
    "ext_text_langid" -> graft.ext.ExtOracleSql.langId,
    "ext_text_fingerprint" -> graft.ext.ExtOracleSql.fingerprint,
    "ext_text_tfidf" -> graft.ext.ExtOracleSql.tfidfTopTerms,
    "ext_text_length_stats" -> graft.ext.ExtOracleSql.lengthStats,
    "ext_dedup_exact" -> graft.ext.ExtOracleSql.dedupExact,
    "ext_dedup_jaccard" -> graft.ext.ExtOracleSql.dedupJaccard,
    "ext_dedup_minhash_lsh" -> graft.ext.ExtOracleSql.dedupMinhashLsh,
    "ext_dedup_simhash" -> graft.ext.ExtOracleSql.dedupSimhash,
    "ext_dedup_embedding" -> graft.ext.ExtOracleSql.dedupEmbedding,
    "ext_dedup_clusters" -> graft.ext.ExtOracleSql.dedupClusters,
    "ext_sim_topk" -> graft.ext.ExtOracleSql.simTopK,
    "ext_sim_lsh_topk" -> graft.ext.ExtOracleSql.simLshTopK,
    "ext_sim_ivf_topk" -> graft.ext.ExtOracleSql.simIvfTopK,
    "ext_sim_lsh_multiprobe" -> graft.ext.ExtOracleSql.simLshMultiProbe,
    "ext_asof_events_orders" -> graft.ext.ExtOracleSql.asofEventsOrders,
    "ext_split_assign" -> graft.ext.ExtOracleSql.splitAssign,
    "ext_sample_stratified" -> graft.ext.ExtOracleSql.stratifiedSample,
    "ext_sketch_vocab" -> graft.ext.ExtOracleSql.vocabSketch,
    "ext_pipeline_clean" -> graft.ext.ExtOracleSql.cleanCorpus,
    "ext_quality_deciles" -> graft.ext.ExtOracleSql.qualityDeciles,
    "ext_text_novelty" -> graft.ext.ExtOracleSql.noveltyScores,
    "ext_media_meta" -> graft.ext.ExtOracleSql.mediaMeta,
    // decode included since round 3: the stub checksum is pure byte
    // arithmetic, which the oracle reproduces from UTF-8 codepoints.
    "ext_media_decode" -> graft.ext.ExtOracleSql.mediaDecode,
    "ext_media_frames" -> graft.ext.ExtOracleSql.mediaFrames
  )
}
