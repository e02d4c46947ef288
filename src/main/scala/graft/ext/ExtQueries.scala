package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract registry for the extension tier (SURVEY.md §7.5):
  * text analysis, dedup family, similarity search, sampling, temporal
  * joins, multimodal plumbing. Every entry has a DuckDB twin in
  * [[ExtOracleSql]] — including the byte-level decode, whose checksum
  * the oracle reproduces from UTF-8 codepoint arithmetic. */
object ExtQueries {
  def textStats(s: SparkSession, d: String): DataFrame = TextOps.textStats(s, d)
  def langId(s: SparkSession, d: String): DataFrame = TextOps.langId(s, d)
  def fingerprint(s: SparkSession, d: String): DataFrame = TextOps.fingerprint(s, d)
  def winnowing(s: SparkSession, d: String): DataFrame = TextOps.winnowing(s, d)
  def tfidf(s: SparkSession, d: String): DataFrame = TextOps.tfidfTopTerms(s, d)
  def lengthStats(s: SparkSession, d: String): DataFrame = TextOps.lengthStats(s, d)
  def dedupExact(s: SparkSession, d: String): DataFrame = DedupOps.exact(s, d)
  def dedupJaccard(s: SparkSession, d: String): DataFrame = DedupOps.jaccardPairs(s, d)
  def dedupMinhashLsh(s: SparkSession, d: String): DataFrame = DedupOps.minhashLsh(s, d)
  def dedupSimhash(s: SparkSession, d: String): DataFrame = DedupOps.simhashPairs(s, d)
  def dedupEmbedding(s: SparkSession, d: String): DataFrame = DedupOps.embeddingNearDup(s, d)
  def dedupClusters(s: SparkSession, d: String): DataFrame = DedupOps.clusters(s, d)
  def graphPageRank(s: SparkSession, d: String): DataFrame = GraphOps.pageRank(s, d)
  def simMmr(s: SparkSession, d: String): DataFrame = VectorOps.mmrSelect(s, d)
  def dedupIncremental(s: SparkSession, d: String): DataFrame = DedupOps.incrementalDedup(s, d)
  def simTopK(s: SparkSession, d: String): DataFrame = SimilarityOps.bruteForceTopK(s, d)
  def simLshTopK(s: SparkSession, d: String): DataFrame = SimilarityOps.lshTopK(s, d)
  def simIvfTopK(s: SparkSession, d: String): DataFrame = SimilarityOps.ivfTopK(s, d)
  def simLshMultiProbe(s: SparkSession, d: String): DataFrame = SimilarityOps.lshMultiProbeTopK(s, d)
  def asofEventsOrders(s: SparkSession, d: String): DataFrame =
    TemporalOps.eventsWithLatestOrder(s, d)
  def splitAssign(s: SparkSession, d: String): DataFrame = SampleOps.datasetSplit(s, d)
  def vocabSketch(s: SparkSession, d: String): DataFrame = TextOps.vocabSketch(s, d)
  def pipelineClean(s: SparkSession, d: String): DataFrame = PipelineOps.cleanCorpus(s, d)
  def qualityDeciles(s: SparkSession, d: String): DataFrame = TextOps.qualityDeciles(s, d)
  def novelty(s: SparkSession, d: String): DataFrame = TextOps.noveltyScores(s, d)
  def commonness(s: SparkSession, d: String): DataFrame = TextOps.tokenCommonness(s, d)
  def corpusProfile(s: SparkSession, d: String): DataFrame = TextOps.corpusProfile(s, d)
  def topTerms(s: SparkSession, d: String): DataFrame = TextOps.topTermsPerLang(s, d)
  def sampleStratified(s: SparkSession, d: String): DataFrame = SampleOps.stratifiedSample(s, d)
  def repetition(s: SparkSession, d: String): DataFrame = TextOps.repetitionStats(s, d)
  def lengthHist(s: SparkSession, d: String): DataFrame = TextOps.lengthHistQuantiles(s, d)
  def bloomSemiJoin(s: SparkSession, d: String): DataFrame = BloomOps.urgentOrderRevenue(s, d)
  def rangeJoinTrailing(s: SparkSession, d: String): DataFrame = TemporalOps.ordersTrailing30d(s, d)
  def packSequences(s: SparkSession, d: String): DataFrame = PackOps.packSequences(s, d)
  def decontaminate(s: SparkSession, d: String): DataFrame =
    DedupOps.decontaminationScores(s, d)
  def redactPii(s: SparkSession, d: String): DataFrame = ScrubOps.redactDocs(s, d)
  def sampleMixture(s: SparkSession, d: String): DataFrame = SampleOps.mixtureSample(s, d)
  def chunkWindows(s: SparkSession, d: String): DataFrame = ChunkOps.chunkWindows(s, d)
  def boilerplate(s: SparkSession, d: String): DataFrame = ChunkOps.boilerplateStrip(s, d)
  def sourceQuota(s: SparkSession, d: String): DataFrame = SampleOps.sourceQuota(s, d)
  def curriculumOrder(s: SparkSession, d: String): DataFrame =
    CurriculumOps.curriculumOrder(s, d)
  def cmsHeavyHitters(s: SparkSession, d: String): DataFrame = SketchOps.cmsHeavyHitters(s, d)
  def hllDistinct(s: SparkSession, d: String): DataFrame = SketchOps.hllDistinctUsers(s, d)
  def embedQuantize(s: SparkSession, d: String): DataFrame = VectorOps.quantizeSummary(s, d)
  def kmeansRefine(s: SparkSession, d: String): DataFrame = VectorOps.kmeansRefine(s, d)
  def ivfKmeansTopK(s: SparkSession, d: String): DataFrame = VectorOps.ivfKmeansTopK(s, d)
  def pqTopK(s: SparkSession, d: String): DataFrame = VectorOps.pqTopK(s, d)
  def hardNegatives(s: SparkSession, d: String): DataFrame = VectorOps.hardNegatives(s, d)
  def quantizedTopK(s: SparkSession, d: String): DataFrame = VectorOps.quantizedLshTopK(s, d)
  def semanticDedup(s: SparkSession, d: String): DataFrame = VectorOps.semanticDedup(s, d)
  def embedProject(s: SparkSession, d: String): DataFrame = VectorOps.projectedCoords(s, d)
  def userGaps(s: SparkSession, d: String): DataFrame = TypedOps.userGaps(s, d)
  def bpeMerges(s: SparkSession, d: String): DataFrame = BpeOps.bpeMerges(s, d)
  def bpeEncode(s: SparkSession, d: String): DataFrame = BpeOps.bpeEncode(s, d)
  def temperatureSample(s: SparkSession, d: String): DataFrame = SampleOps.temperatureSample(s, d)
  def projectedTopK(s: SparkSession, d: String): DataFrame = VectorOps.projectedTopK(s, d)
  def mediaMeta(s: SparkSession, d: String): DataFrame = MediaOps.mediaMeta(s, d)
  def mediaDecode(s: SparkSession, d: String): DataFrame = MediaOps.decodeQuery(s, d)
  def mediaFrames(s: SparkSession, d: String): DataFrame = MediaOps.frameSummary(s, d)
  def mediaPhash(s: SparkSession, d: String): DataFrame = MediaOps.phashPairs(s, d)
}
