package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.core.GraftConfig
import graft.operators._
import graft.sinks.AppendSink
import graft.sources.{JdbcPartitionedSource, Tables}

/** Single-import facade over the engine — the surface a user of the reference
  * connector (or of any batch ETL + data-curation stack) programs against.
  * Everything returns lazy DataFrames; nothing here adds semantics beyond the
  * named operator modules (see OPERATORS.md for the full inventory and
  * SCALE.md for the 100 TB design notes).
  *
  * {{{
  * import graft.Graft
  * val plan  = Graft.chunkPlan(df, cfg, tieBreak = Seq("id"))        // intervals
  * val rows  = Graft.readJdbcChunked(spark, cfg, intervals)          // parallel scan
  * val clean = Graft.curate(spark, dir)                              // kept doc ids
  * val dups  = Graft.nearDuplicates(docs)                            // minhash pairs
  * val nn    = Graft.similarTopK(embeddings, queries = 8, k = 5)     // ANN
  * Graft.appendPartitioned(result, path, Seq("day"))                 // sink
  * }}}
  */
object Graft {

  // ---- reference-parity surface ----
  def chunkPlan(df: DataFrame, cfg: GraftConfig, tieBreak: Seq[String]): DataFrame =
    Chunking.plan(df, cfg, tieBreak)
  def readJdbcChunked(spark: SparkSession, cfg: GraftConfig,
                      intervals: Seq[(Long, Long)]): DataFrame =
    JdbcPartitionedSource.read(spark, cfg, intervals)
  def stringify(df: DataFrame): DataFrame = RowOps.stringifyAll(df)
  def dropNullLiterals(df: DataFrame, cols: Seq[String]): DataFrame =
    RowOps.dropNullLiterals(df, cols)
  def referencePipeline(spark: SparkSession, dir: String, cfg: GraftConfig,
                        sinkPath: String): DataFrame =
    RefPipeline.run(spark, dir, cfg, sinkPath)

  // ---- curation / dedup ----
  def curate(spark: SparkSession, dir: String): DataFrame =
    CurationPipeline.keptDocuments(spark, dir)
  def dedupExact(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    Dedup.keepFirst(df, keys, order)
  def nearDuplicates(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    NearDup.minhashPairs(docs, threshold)
  def dedupClusters(pairs: DataFrame): DataFrame = Dedup.dedupClusters(pairs)
  def dedupSurvivors(docs: DataFrame, pairs: DataFrame): DataFrame =
    Dedup.clusterSurvivors(docs, pairs)
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 64,
                     stride: Int = 48): DataFrame =
    TextAnalysis.chunkDocuments(docs, chunkTokens, stride)
  def exactSimilarityJoin(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    NearDup.jaccardJoin(docs, threshold)
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    NearDup.simhashPairs(docs, maxHamming)
  def semanticNearDupPairs(emb: DataFrame, threshold: Double = 0.4,
                           nLists: Int = 8): DataFrame =
    Similarity.semanticNearDupPairs(emb, threshold, nLists)
  def containmentJoin(docs: DataFrame, threshold: Double = 0.8): DataFrame =
    NearDup.containmentJoin(docs, threshold)
  def decontaminate(docs: DataFrame, benchMod: Long = 10, n: Int = 8): DataFrame =
    TextAnalysis.decontaminate(docs, benchMod, n)
  def decontaminateFuzzy(docs: DataFrame, benchMod: Long = 10,
                         threshold: Double = 0.5): DataFrame =
    TextAnalysis.decontaminateNearDup(docs, benchMod, threshold)
  def decontaminationAttribution(docs: DataFrame, benchMod: Long = 10,
                                 n: Int = 8): DataFrame =
    TextAnalysis.decontaminateAttribution(docs, benchMod, n)
  def packSequences(docs: DataFrame, budget: Long = 256): DataFrame =
    Packing.packSequences(docs, budget)
  def dedupVsHistory(batch: DataFrame, history: DataFrame, key: String): DataFrame =
    Dedup.newAgainstHistory(batch, history, key)
  def duplicatedPassages(docs: DataFrame, window: Int = 16): DataFrame =
    Dedup.duplicatedPassages(docs, window)
  def scrubDuplicatedPassages(docs: DataFrame, window: Int = 16): DataFrame =
    Dedup.scrubDuplicatedPassages(docs, window)
  def nearDupVsHistory(batch: DataFrame, history: DataFrame,
                       threshold: Double = 0.5): DataFrame =
    NearDup.nearDupSurvivorsVsHistory(batch, history, threshold)
  def trainingManifest(spark: SparkSession, dir: String): DataFrame =
    CurationPipeline.trainingManifest(spark, dir)

  // ---- similarity search ----
  def similarTopK(emb: DataFrame, queries: Int = 8, k: Int = 5): DataFrame =
    Similarity.bruteForceTopK(emb, queries, k)
  def similarTopKLsh(emb: DataFrame, queries: Int = 8, k: Int = 5): DataFrame =
    Similarity.lshTopK(emb, queries, k)
  def similarTopKIvf(emb: DataFrame, queries: Int = 8, k: Int = 5): DataFrame =
    IvfIndex.topK(emb, queries, k)
  def similarTextTopK(docs: DataFrame, queries: Int = 8, k: Int = 5): DataFrame =
    TfIdf.topKSimilar(docs, queries, k)
  def pqCodes(emb: DataFrame, nIters: Int = 1): DataFrame =
    PqIndex.codes(emb, nIters)
  def pqResidualCodes(emb: DataFrame, nLists: Int = 8): DataFrame =
    PqIndex.residualCodes(emb, nLists)
  def similarTopKPq(emb: DataFrame, queries: Int = 8, k: Int = 5): DataFrame =
    PqIndex.adcTopK(emb, queries, k)
  def similarTopKIvfPq(emb: DataFrame, queries: Int = 8, k: Int = 5): DataFrame =
    PqIndex.ivfpqTopK(emb, queries, k)

  // ---- text / events ----
  def textQuality(docs: DataFrame): DataFrame = TextAnalysis.qualityScore(docs)
  def languageId(docs: DataFrame): DataFrame = TextAnalysis.langId(docs)
  def fingerprints(docs: DataFrame): DataFrame = TextAnalysis.fingerprints(docs)
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame =
    JsonOps.sessionize(events, gapSeconds)
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    JsonOps.sessionWindows(events, gap)
  def asofJoin(events: DataFrame, orders: DataFrame): DataFrame =
    AsofJoin.eventsToLatestOrder(events, orders)
  def rangeJoin(points: DataFrame, intervals: DataFrame, ts: String,
                lo: String, hi: String, bucket: Long,
                keys: Seq[String] = Nil): DataFrame =
    RangeJoin.binned(points, intervals, ts, lo, hi, bucket, keys)
  def resampleFfill(events: DataFrame, stepSeconds: Long = 3600L): DataFrame =
    Resample.ffill(events, stepSeconds)
  def rollingWindow(events: DataFrame, horizonSeconds: Long = 3600L): DataFrame =
    JsonOps.rollingWindow(events, horizonSeconds)
  def aggSnapshot(rows: DataFrame, keys: Seq[String], valueCol: String,
                  orderCol: String): DataFrame =
    Merge.aggSnapshot(rows, keys, valueCol, orderCol)
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
                   fingerprint: Column): DataFrame =
    Merge.snapshotDiff(oldSnap, newSnap, key, fingerprint)
  def corpusOverlap(a: DataFrame, b: DataFrame, n: Int = 8): DataFrame =
    Merge.corpusOverlap(a, b, n)
  def incrementalAgg(snapshot: DataFrame, delta: DataFrame, keys: Seq[String],
                     valueCol: String, orderCol: String): DataFrame =
    Merge.incrementalAgg(snapshot, delta, keys, valueCol, orderCol)

  // ---- sampling / vector preprocessing ----
  def sampleStratified(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Int], defaultPct: Int = 100): DataFrame =
    Sampling.stratified(df, keyCol, strataCol, rates, defaultPct)
  def quotaCap(df: DataFrame, groupCol: String, n: Int,
               orderCols: Seq[String]): DataFrame =
    Sampling.quotaCap(df, groupCol, n, orderCols)
  def mixtureSample(df: DataFrame, keyCol: String, strataCol: String,
                    weights: Map[String, Double], budget: Long): DataFrame =
    Sampling.mixture(df, keyCol, strataCol, weights, budget)
  def zScore(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    Relational.groupZScore(df, groupCol, valueCol)
  def robustZScore(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    Relational.groupRobustZ(df, groupCol, valueCol)
  def bpeMerges(docs: DataFrame, steps: Int = 4): DataFrame =
    BpeTrainer.merges(docs, steps)
  def bpeTokenized(docs: DataFrame, steps: Int = 4): DataFrame =
    BpeTrainer.tokenized(docs, steps)
  def mixtureByTokens(df: DataFrame, keyCol: String, strataCol: String,
                      tokensCol: String, weights: Map[String, Double],
                      tokenBudget: Long): DataFrame =
    Sampling.mixtureByTokens(df, keyCol, strataCol, tokensCol, weights, tokenBudget)
  def repetitionRatio(docs: DataFrame): DataFrame = TextAnalysis.repetition(docs)
  def redactPii(docs: DataFrame): DataFrame = TextAnalysis.redactPii(docs)
  def normalizeText(docs: DataFrame): DataFrame = TextAnalysis.normalizeText(docs)
  def vocabulary(docs: DataFrame, k: Int = 50): DataFrame =
    TextAnalysis.vocabulary(docs, k)
  def heavyHitters(docs: DataFrame, support: Double = 0.01): DataFrame =
    TextAnalysis.heavyHitters(docs, support)
  def lmQualitySignal(docs: DataFrame, vocabSize: Int = 2000): DataFrame =
    TextAnalysis.bigramFrequencySignal(docs, vocabSize)
  def qualityBuckets(docs: DataFrame, nBuckets: Int = 3): DataFrame =
    TextAnalysis.qualityBuckets(docs, nBuckets)
  def saltedJoin(big: DataFrame, replicated: DataFrame, keys: Seq[String],
                 saltBy: Seq[String], salts: Int = 8): DataFrame =
    SaltedJoin.salted(big, replicated, keys, saltBy, salts)
  def zorderLayout(df: DataFrame, cols: Seq[String], nBuckets: Int = 64): DataFrame =
    ZOrder.layout(df, cols, nBuckets)
  def hilbertLayout(df: DataFrame, cols: Seq[String], nBuckets: Int = 64): DataFrame =
    Hilbert.layout(df, cols, nBuckets)
  def skewReport(df: DataFrame, key: String, topK: Int = 10): DataFrame =
    Validate.skewReport(df, key, topK)
  def joinCardinality(left: DataFrame, right: DataFrame, key: String): DataFrame =
    Validate.joinCardinality(left, right, key)
  def domainReport(docs: DataFrame): DataFrame = Validate.domainReport(docs)
  def fertilityReport(docs: DataFrame): DataFrame =
    TextAnalysis.fertilityReport(docs)
  def collocations(docs: DataFrame, minCount: Long = 5, k: Int = 30): DataFrame =
    TextAnalysis.collocations(docs, minCount, k)
  def blocklistFilter(docs: DataFrame, phrases: Seq[String]): DataFrame =
    TextAnalysis.blocklistFilter(docs, phrases)
  def keywords(docs: DataFrame, k: Int = 3): DataFrame =
    TfIdf.topTermsPerDoc(docs, k)
  def dsirSelect(docs: DataFrame, targetPred: Column, k: Int = 150): DataFrame =
    Dsir.select(docs, targetPred, k)
  def centroidOutliers(emb: DataFrame, bottomK: Int = 10): DataFrame =
    Similarity.centroidOutliers(emb, bottomK)
  def compactionPlan(files: DataFrame, target: Long): DataFrame =
    Compaction.plan(files, target)
  def compactionIncremental(history: DataFrame, newFiles: DataFrame,
                            target: Long): DataFrame =
    Compaction.assignIncremental(history, newFiles, target)
  def attributionJoin(events: DataFrame, leftType: String = "click",
                      rightType: String = "view",
                      lookbackSeconds: Long = 3600L): DataFrame =
    graft.streaming.StreamingOps.attributionJoin(events, leftType, rightType,
      lookbackSeconds)
  def normalizeEmbedding(v: Column): Column = VectorOps.normalized(v)
  def quantizeEmbeddingInt8(v: Column): Column = VectorOps.quantizedInt8(v)
  def projectEmbedding(v: Column, outDims: Int = 8, dim: Int = 64): Column =
    VectorOps.randomProject(v, outDims, dim)

  // ---- splits / validation / sinks ----
  def trainValTestSplit(df: DataFrame, keyCol: String, salt: String = "graft_v1"): DataFrame =
    Splits.assign(df, keyCol, salt)
  def validationReport(spark: SparkSession, dir: String): DataFrame =
    Validate.report(spark, dir)
  def corpusReport(spark: SparkSession, dir: String): DataFrame =
    Validate.corpusReport(spark, dir)
  def append(df: DataFrame, path: String): Unit = AppendSink.appendParquet(df, path)
  def appendPartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    AppendSink.appendPartitioned(df, path, cols)

  /** Register the native expressions as SQL functions on a live session. */
  def enableSqlFunctions(spark: SparkSession): Unit =
    GraftExtensions.registerAll(spark)

  /** Fixture loader (parquet stand-in for the JDBC source). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)
}
