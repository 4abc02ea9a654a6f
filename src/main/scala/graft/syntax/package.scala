package graft

import org.apache.spark.sql.{Column, DataFrame}
import graft.ops._

/** Fluent method syntax for every graft operator — the surface a
  * reference (dask-cudf) user programs against after switching:
  *
  * {{{
  * import graft.syntax._
  * docs.dedupCorpus("doc_id", "text")            // keep/drop verdicts
  * docs.ngramJaccardPairs("doc_id", "text", "blk")
  * corpus.annTopK(queries, "id", "vec", k = 10)
  * trades.asofJoin(quotes, "t", "t", Seq("sym"), Seq("bid"))
  * events.ffill("value", Seq("user_id"), Seq("ts"), "filled")
  * }}}
  *
  * Everything delegates to the `graft.ops` objects (one import instead
  * of six); the implementations — and their oracle gates — live there.
  */
package object syntax {

  implicit class GraftFrameOps(private val df: DataFrame) extends AnyVal {

    // ---- frame ops (FrameOps) ---------------------------------------
    def ffill(valueCol: String, partitionBy: Seq[String], orderBy: Seq[String],
        as: String): DataFrame = FrameOps.ffill(df, valueCol, partitionBy, orderBy, as)
    def bfill(valueCol: String, partitionBy: Seq[String], orderBy: Seq[String],
        as: String): DataFrame = FrameOps.bfill(df, valueCol, partitionBy, orderBy, as)
    def pctChange(valueCol: String, partitionBy: Seq[String], orderBy: Seq[String],
        as: String): DataFrame = FrameOps.pctChange(df, valueCol, partitionBy, orderBy, as)
    def rankAverage(valueCol: String, partitionBy: Seq[String],
        as: String): DataFrame = FrameOps.rankAverage(df, valueCol, partitionBy, as)
    def topKPerGroup(groupCols: Seq[String], orderBy: Seq[Column], k: Int,
        rankCol: String = "rn"): DataFrame =
      FrameOps.topKPerGroup(df, groupCols, orderBy, k, rankCol)
    def valueCounts(cols: Seq[String], as: String = "n"): DataFrame =
      FrameOps.valueCounts(df, cols, as)
    def modePerGroup(groupCols: Seq[String], valueCol: String): DataFrame =
      FrameOps.modePerGroup(df, groupCols, valueCol)
    def factorize(valueCol: String, codeCol: String): DataFrame =
      FrameOps.factorize(df, valueCol, codeCol)
    def melt(idVars: Seq[String], valueVars: Seq[String],
        varName: String = "variable", valueName: String = "value"): DataFrame =
      FrameOps.melt(df, idVars, valueVars, varName, valueName)

    // ---- joins (AsofJoin, Skew) -------------------------------------
    def asofJoin(right: DataFrame, leftOn: String, rightOn: String,
        by: Seq[String], rightCols: Seq[String], direction: String = "backward",
        tolerance: Column = null): DataFrame =
      AsofJoin.asofJoin(df, right, leftOn, rightOn, by, rightCols, direction, tolerance)
    def asofJoinMerge(right: DataFrame, leftOn: String, rightOn: String,
        by: Seq[String], rightCols: Seq[String],
        toleranceSec: Option[Long] = None): DataFrame =
      graft.plans.AsofMergeJoin.asofBackward(df, right, leftOn, rightOn,
        by, rightCols, toleranceSec)
    def saltedJoin(right: DataFrame, key: String, salts: Int = 8): DataFrame =
      Skew.saltedJoin(df, right, key, salts)
    def saltedAgg(key: Seq[String], valueCol: String, salts: Int = 16): DataFrame =
      Skew.saltedAgg(df, key, valueCol, salts)

    // ---- dedup (Dedup) ----------------------------------------------
    def exactDuplicateGroups(id: String, text: String): DataFrame =
      Dedup.exactDuplicateGroups(df, id, text)
    def dedupAgainst(ingested: DataFrame, id: String, text: String): DataFrame =
      Dedup.dedupAgainst(df, ingested, id, text)
    def nearDupAgainst(ingested: DataFrame, id: String, text: String,
        k: Int = 5, n: Int = 16, bands: Int = 4,
        minEstJaccard: Double = 0.5): DataFrame =
      Dedup.nearDupAgainst(df, ingested, id, text, k, n, bands, minEstJaccard)
    def minhashSignatures(id: String, text: String, k: Int = 5, n: Int = 16): DataFrame =
      Dedup.minhashSignatures(df, id, text, k, n)
    def minhashCandidatePairs(id: String, text: String, k: Int = 5, n: Int = 16,
        bands: Int = 4): DataFrame = Dedup.minhashCandidatePairs(df, id, text, k, n, bands)
    def dedupCorpus(id: String, text: String, k: Int = 5, n: Int = 16,
        bands: Int = 4, minEstJaccard: Double = 0.9): DataFrame =
      Dedup.dedupCorpus(df, id, text, k, n, bands, minEstJaccard)
    def simhashNearPairs(id: String, text: String, block: String,
        maxHamming: Int = 3): DataFrame =
      Dedup.simhashNearPairs(df, id, text, block, maxHamming)
    def ngramJaccardPairs(id: String, text: String, block: String, ngram: Int = 3,
        minJaccard: Double = 0.2, maxDf: Int = 0,
        maxUnsafeFrac: Double = 0.5): DataFrame =
      Dedup.ngramJaccardPairs(df, id, text, block, ngram, minJaccard, maxDf,
        maxUnsafeFrac)
    def embeddingNearPairs(id: String, vec: String, minCosine: Double,
        blockBits: Int = 0): DataFrame =
      Dedup.embeddingNearPairs(df, id, vec, minCosine, blockBits)
    /** On a (id_a, id_b) pair frame: cluster ids by connectivity. */
    def connectedComponents(maxIter: Int = 10): DataFrame =
      Dedup.connectedComponents(df, maxIter)
    def connectedComponentsStar(maxIter: Int = 25): DataFrame =
      Dedup.connectedComponentsStar(df, maxIter)

    // ---- similarity search (Similarity); `df` is the corpus ---------
    def annTopK(queries: DataFrame, id: String, vec: String, k: Int): DataFrame =
      Similarity.bruteForceTopK(df, queries, id, vec, k)
    def annTopKLsh(queries: DataFrame, id: String, vec: String, k: Int,
        nBits: Int = 8): DataFrame = Similarity.lshTopK(df, queries, id, vec, k, nBits)
    def annTopKIvf(queries: DataFrame, id: String, vec: String, cluster: String,
        k: Int, nProbe: Int = 2): DataFrame =
      Similarity.ivfTopK(df, queries, id, vec, cluster, k, nProbe)
    def annTopKIvfLearned(queries: DataFrame, id: String, vec: String, k: Int,
        nClusters: Int, nProbe: Int = 2, iters: Int = 3): DataFrame =
      Similarity.ivfTopKLearned(df, queries, id, vec, k, nClusters, nProbe, iters)
    def annTopKPq(queries: DataFrame, id: String, vec: String, dim: Int,
        k: Int, nSub: Int = 4, nCodes: Int = 8, iters: Int = 2): DataFrame =
      Similarity.pqTopKLearned(df, queries, id, vec, dim, k, nSub, nCodes, iters)
    def annTopKIvfPq(queries: DataFrame, id: String, vec: String, dim: Int,
        k: Int, nClusters: Int, nProbe: Int = 2, nSub: Int = 4,
        nCodes: Int = 8): DataFrame =
      Similarity.ivfPqTopKLearned(df, queries, id, vec, dim, k, nClusters,
        nProbe, nSub, nCodes)
    /** `df` is corpus A; mutual top-1 pairs against corpus B. */
    def mutualNearestPairs(b: DataFrame, id: String, vec: String,
        excludeSelf: Boolean = false): DataFrame =
      Similarity.mutualNearestPairs(df, b, id, vec, excludeSelf)
    /** `df` is corpus A; margin-scored rank-1 pairs against corpus B. */
    def marginMinedPairs(b: DataFrame, id: String, vec: String,
        k: Int = 4, minMarginPpm: Long = 1050000L): DataFrame =
      Similarity.marginMinedPairs(df, b, id, vec, k, minMarginPpm)
    /** `df` is corpus A; the IVF-fed scale tier of [[marginMinedPairs]]. */
    def marginMinedPairsIvf(b: DataFrame, id: String, vec: String,
        k: Int = 4, minMarginPpm: Long = 1050000L, nClusters: Int = 8,
        nProbe: Int = 2, itersCoarse: Int = 3): DataFrame =
      Similarity.marginMinedPairsIvf(df, b, id, vec, k, minMarginPpm,
        nClusters, nProbe, itersCoarse)
    /** `df` is the candidate list (q_id, n_id, rel). */
    def mmrRerank(vectors: DataFrame, id: String, vec: String, k: Int,
        lambda: Double = 0.5): DataFrame =
      Similarity.mmrRerank(df, vectors, id, vec, k, lambda)
    /** `df` is the first ranking (q_id, n_id, rnk). */
    def rrfFuse(others: Seq[DataFrame], k: Int, c: Int = 60): DataFrame =
      Similarity.rrfFuse(df +: others, k, c)
    /** `df` is the approximate tier's (q_id, rnk, n_id) result. */
    def recallAtK(exact: DataFrame, k: Int): DataFrame =
      Similarity.recallAtK(df, exact, k)

    // ---- text analysis (TextAnalysis) -------------------------------
    def withTextQuality(text: String): DataFrame = TextAnalysis.qualityColumns(df, text)
    def gopherRules(id: String, text: String): DataFrame =
      TextAnalysis.gopherRules(df, id, text)
    def viterbiSegment(id: String, text: String, vocab: DataFrame,
        unkCost: Long = 10000L): DataFrame =
      TextAnalysis.viterbiSegment(df, id, text, vocab, unkCost)
    def repetitionStats(id: String, text: String, n: Int = 2): DataFrame =
      TextAnalysis.repetitionStats(df, id, text, n)

    // ---- multimodal (Multimodal) ------------------------------------
    def withMediaColumn(id: String, text: String): DataFrame =
      Multimodal.withMediaColumn(df, id, text)
    def sampleFrames(id: String, text: String, frameChars: Int = 256,
        step: Int = 3): DataFrame = Multimodal.sampleFrames(df, id, text, frameChars, step)

    // ---- corpus preparation (Corpus); `df` is the corpus ------------
    def decontaminate(benchmark: DataFrame, id: String, text: String,
        n: Int): DataFrame = Corpus.decontaminate(df, benchmark, id, text, n)
    def redactPii(text: String): DataFrame = Corpus.redactPii(df, text)
    def packSequences(id: String, nTokens: Column, budget: Long,
        chunkSize: Long = 64): DataFrame =
      Corpus.packSequences(df, id, nTokens, budget, chunkSize)
    def packBestFit(id: String, text: String, budget: Int,
        shards: Int): DataFrame =
      Corpus.packBestFit(df, id, text, budget, shards)
    /** `df` is a [[packBestFit]] layout. */
    def packBestFitStats(budget: Int): DataFrame =
      Corpus.packBestFitStats(df, budget)
    def stupidBackoffScore(train: DataFrame, id: String, text: String,
        alpha: Double = 0.4): DataFrame =
      Corpus.stupidBackoffScore(df, train, id, text, alpha)
    def stupidBackoffScoreHashed(train: DataFrame, id: String,
        text: String, alpha: Double = 0.4): DataFrame =
      Corpus.stupidBackoffScoreHashed(df, train, id, text, alpha)
    def sampleByHash(id: String, strata: String, rates: Map[String, Double],
        defaultRate: Double): DataFrame =
      Corpus.sampleByHash(df, id, strata, rates, defaultRate)
    def tfidfTopK(id: String, text: String, k: Int): DataFrame =
      Corpus.tfidf(df, id, text, k)
    def semanticDupPairs(id: String, vec: String, nClusters: Int,
        threshold: Double, iters: Int = 3): DataFrame =
      Corpus.semanticDupPairs(df, id, vec, nClusters, threshold, iters)
    def heavyHitters(id: String, text: String, k: Int,
        capacity: Int): DataFrame = Corpus.heavyHitters(df, id, text, k, capacity)
    def boilerplateStrip(id: String, text: String, w: Int,
        minDocs: Long): DataFrame = Corpus.boilerplateStrip(df, id, text, w, minDocs)
    def dedupLinesKeepFirst(id: String, text: String, w: Int): DataFrame =
      Corpus.dedupLinesKeepFirst(df, id, text, w)
    def thresholdKeepByHistogram(scoreCol: String, lo: Double, hi: Double,
        nBuckets: Int, dropBp: Int): DataFrame =
      Corpus.thresholdKeepByHistogram(df, scoreCol, lo, hi, nBuckets, dropBp)
    def tierByHistogram(scoreCol: String, lo: Double, hi: Double,
        nBuckets: Int, cutsBp: Seq[Int]): DataFrame =
      Corpus.tierByHistogram(df, scoreCol, lo, hi, nBuckets, cutsBp)
    def dedupCorpusKeepBest(id: String, text: String, quality: String,
        k: Int = 5, n: Int = 16, bands: Int = 4,
        minEstJaccard: Double = 0.9): DataFrame =
      Dedup.dedupCorpusKeepBest(df, id, text, quality, k, n, bands, minEstJaccard)
    def bottomKPerStratum(strata: String, id: String, n: Int): DataFrame =
      Corpus.bottomKPerStratum(df, strata, id, n)
    def sourceReport(id: String, text: String, source: String): DataFrame =
      Corpus.sourceReport(df, id, text, source)
    def bigramLmScore(id: String, text: String): DataFrame =
      Corpus.bigramLmScore(df, id, text)
    def invertedIndex(id: String, text: String, maxPostings: Int): DataFrame =
      Corpus.invertedIndex(df, id, text, maxPostings)
    def pmiPairs(id: String, text: String, topN: Int,
        minPairDf: Long = 2): DataFrame = Corpus.pmiPairs(df, id, text, topN, minPairDf)
    def dupSpans(id: String, text: String, l: Int): DataFrame =
      Corpus.dupSpans(df, id, text, l)
    def qualityClassifierScore(id: String, text: String, scale: Double = 4.0,
        bias: Double = 0.0): DataFrame =
      Corpus.qualityClassifierScore(df, id, text, scale, bias)
    def mixtureResample(id: String, strata: String, targets: Map[String, Double],
        budget: Long, defaultTarget: Double = 0.0): DataFrame =
      Corpus.mixtureResample(df, id, strata, targets, budget, defaultTarget)
    def weightedSampleDet(id: String, weight: String, k: Int): DataFrame =
      Corpus.weightedSampleDet(df, id, weight, k)
    def weightedSampleDetBy(id: String, weight: String, strata: String,
        kPerStratum: Int): DataFrame =
      Corpus.weightedSampleDetBy(df, id, weight, strata, kPerStratum)
    def tokenEntropyBy(group: String, valueCol: String): DataFrame =
      Corpus.tokenEntropyBy(df, group, valueCol)
    def heavyHitters(valueCol: String, k: Int): DataFrame =
      Sketches.heavyHitters(df, valueCol, k)
    def heavyHittersBy(group: String, valueCol: String, k: Int,
        maxGroups: Int = 100000): DataFrame =
      Sketches.heavyHittersBy(df, group, valueCol, k, maxGroups)
    def skewProfile(keyCols: Seq[String]): DataFrame =
      Validate.skewProfile(df, keyCols)
    def mixtureResampleTokens(id: String, strata: String, nTokens: Column,
        targets: Map[String, Double], budgetTokens: Long,
        defaultTarget: Double = 0.0): DataFrame =
      Corpus.mixtureResampleTokens(df, id, strata, nTokens, targets,
        budgetTokens, defaultTarget)
    def mixtureUpsample(id: String, strata: String,
        targets: Map[String, Double], budget: Long,
        defaultTarget: Double = 0.0): DataFrame =
      Corpus.mixtureUpsample(df, id, strata, targets, budget, defaultTarget)
    def wordpieceTokenize(id: String, text: String): DataFrame =
      graft.ops.TextAnalysis.wordpieceTokenize(df, id, text)
    def corrMatrix(cols: Seq[String]): DataFrame =
      graft.ops.FrameOps.corrMatrix(df, cols)
    def interpolate(partitionBy: Seq[String], orderBy: Seq[String],
        valueCol: String, as: String, method: String = "position",
        limit: Int = 0, limitDirection: String = "forward"): DataFrame =
      graft.ops.FrameOps.interpolate(df, partitionBy, orderBy, valueCol, as,
        method, limit, limitDirection)
    def ewmMean(partitionBy: Seq[String], orderCol: String,
        valueCol: String, alpha: Double, as: String,
        ignoreNa: Boolean = false): DataFrame =
      graft.ops.FrameOps.ewmMean(df, partitionBy, orderCol, valueCol, alpha,
        as, ignoreNa)
    def ewmVar(partitionBy: Seq[String], orderCol: String,
        valueCol: String, alpha: Double, varAs: String, stdAs: String,
        ignoreNa: Boolean = false): DataFrame =
      graft.ops.FrameOps.ewmVar(df, partitionBy, orderCol, valueCol, alpha,
        varAs, stdAs, ignoreNa)
    def ewmMeanSegmented(partitionBy: Seq[String], orderCol: String,
        valueCol: String, alpha: Double, as: String, segLen: Int = 4096,
        ignoreNa: Boolean = false): DataFrame =
      graft.ops.FrameOps.ewmMeanSegmented(df, partitionBy, orderCol,
        valueCol, alpha, as, segLen, ignoreNa)
    def ewmVarSegmented(partitionBy: Seq[String], orderCol: String,
        valueCol: String, alpha: Double, varAs: String, stdAs: String,
        segLen: Int = 4096, ignoreNa: Boolean = false): DataFrame =
      graft.ops.FrameOps.ewmVarSegmented(df, partitionBy, orderCol,
        valueCol, alpha, varAs, stdAs, segLen, ignoreNa)
    def ewmMeanHalflife(partitionBy: Seq[String], timeCol: String,
        tieBreak: String, valueCol: String, halflife: Double,
        as: String): DataFrame =
      graft.ops.FrameOps.ewmMeanHalflife(df, partitionBy, timeCol, tieBreak,
        valueCol, halflife, as)
    def concatAxis1(others: Seq[DataFrame], key: String): DataFrame =
      graft.ops.FrameOps.concatAxis1(df +: others, key)
    def vocabStats(text: String, maxFreq: Int): DataFrame =
      Corpus.vocabStats(df, text, maxFreq)
    def weightedSample(id: String, strata: String, weight: Column,
        n: Int): DataFrame = Corpus.weightedSample(df, id, strata, weight, n)
    def chunkDocuments(id: String, text: String, size: Int,
        overlap: Int): DataFrame = Corpus.chunkDocuments(df, id, text, size, overlap)
    def prepareCorpus(id: String, text: String, strata: String,
        targets: Map[String, Double], budget: Long, benchmark: DataFrame,
        n: Int = 3, minTokens: Int = 20): DataFrame =
      Corpus.prepareCorpus(df, id, text, strata, targets, budget,
        benchmark, n, minTokens)
    def shardManifest(id: String, text: String, nShards: Int): DataFrame =
      Corpus.shardManifest(df, id, text, nShards)

    def expect(expectations: Seq[Validate.Expectation],
        maxViolationPpm: Long = 0L): DataFrame =
      Validate.expect(df, expectations, maxViolationPpm)
    def expectUnique(cols: Seq[String]): DataFrame =
      Validate.expectUnique(df, cols)
    def profile(cols: Seq[String], exact: Boolean = true): DataFrame =
      Validate.profile(df, cols, exact)
    def outlierFlags(keys: Seq[String], valueCol: String,
        zMax: Double = 3.0, iqrK: Double = 1.5): DataFrame =
      FrameOps.outlierFlags(df, keys, valueCol, zMax, iqrK)
    def outlierFlagsMad(keys: Seq[String], valueCol: String,
        kMad: Double = 3.5): DataFrame =
      FrameOps.outlierFlagsMad(df, keys, valueCol, kMad)
    def hashedBowVectors(id: String, text: String, dim: Int = 64): DataFrame =
      Corpus.hashedBowVectors(df, id, text, dim)
    /** `df` is the predict set; `seeds` the labeled training slice. */
    def naiveBayesPredict(seeds: DataFrame, id: String, text: String,
        label: String, buckets: Int = 256): DataFrame =
      Corpus.naiveBayesPredict(df, seeds, id, text, label, buckets)

    // ---- link-graph analytics (Graph); `df` is an edge list ---------
    def pageRankPpb(src: String, dst: String, iterations: Int = 3,
        dampingPct: Int = 85): DataFrame =
      Graph.pageRankPpb(df, src, dst, iterations, dampingPct)
    def degreeStats(src: String, dst: String): DataFrame =
      Graph.degreeStats(df, src, dst)
    def labelPropagate(src: String, dst: String, seeds: DataFrame,
        node: String, label: String, iterations: Int = 2): DataFrame =
      Graph.labelPropagate(df, src, dst, seeds, node, label, iterations)
    def kCorePeel(src: String, dst: String, k: Int, rounds: Int = 3): DataFrame =
      Graph.kCorePeel(df, src, dst, k, rounds)
    def triangleCount(src: String, dst: String): DataFrame =
      Graph.triangleCount(df, src, dst)
    def linkPredict(src: String, dst: String, maxPivotDeg: Int = 1000,
        minCommon: Int = 2): DataFrame =
      Graph.linkPredict(df, src, dst, maxPivotDeg, minCommon)

    // ---- round-8 session additions ----------------------------------
    /** `df` is the corpus. */
    def domainDrift(text: String, source: String): DataFrame =
      Corpus.domainDrift(df, text, source)
    def lengthBuckets(text: String,
        boundaries: Seq[Int] = Seq(16, 32, 64, 128, 256, 512, 1024, 2048)): DataFrame =
      Corpus.lengthBuckets(df, text, boundaries)
    def splitAssignSafe(text: String,
        fracs: Seq[(String, Double)]): DataFrame =
      Corpus.splitAssignSafe(df, text, fracs)
    /** `df` is the prediction frame (id, predCol). */
    def classifierReport(truth: DataFrame, id: String, predCol: String,
        labelCol: String): DataFrame =
      Corpus.classifierReport(df, truth, id, predCol, labelCol)
    /** `df` is the change log. */
    def scd2Intervals(key: String, orderCols: Seq[String],
        attrs: Seq[String]): DataFrame =
      FrameOps.scd2Intervals(df, key, orderCols, attrs)
    /** `df` is the approximate tier's (q_id, n_id, rnk) ranking. */
    def rankingMetrics(exact: DataFrame, k: Int): DataFrame =
      Similarity.rankingMetrics(df, exact, k)
    /** `df` is the child table. */
    def fkCheck(parent: DataFrame, childKey: String,
        parentKey: String): DataFrame =
      Validate.fkCheck(df, parent, childKey, parentKey)
    def kAnonymity(quasiCols: Seq[String], k: Long,
        sensitive: Option[String] = None): DataFrame =
      Validate.kAnonymity(df, quasiCols, k, sensitive)
    def generalizeToK(quasiCats: Seq[String], numCol: String,
        ladder: Seq[Long], k: Long): DataFrame =
      Validate.generalizeToK(df, quasiCats, numCol, ladder, k)
    def curriculumInterleave(id: String, source: String,
        weights: DataFrame, chunkBits: Int = 8): DataFrame =
      Corpus.curriculumInterleave(df, id, source, weights, chunkBits)
    def categorify(c: String, minCount: Long = 1L): DataFrame =
      graft.ops.Features.categorify(df, c, minCount)
    def targetEncode(id: String, cat: String, target: String,
        k: Int = 4, alpha: Long = 10L): DataFrame =
      graft.ops.Features.targetEncode(df, id, cat, target, k, alpha)
    def standardScale(id: String, value: String, k: Int = 4): DataFrame =
      graft.ops.Features.standardScale(df, id, value, k)
    def robustScale(id: String, value: String, k: Int = 4): DataFrame =
      graft.ops.Features.robustScale(df, id, value, k)
    def cdfTransform(id: String, value: String, k: Int = 4): DataFrame =
      graft.ops.Features.cdfTransform(df, id, value, k)
    def cdfTransformBy(group: String, id: String, value: String,
        k: Int = 4): DataFrame =
      graft.ops.Features.cdfTransformBy(df, group, id, value, k)
    def hashBucketize(c: String, nBuckets: Int): DataFrame =
      graft.ops.Features.hashBucketize(df, c, nBuckets)
    def hashBucketCensus(c: String, nBuckets: Int): DataFrame =
      graft.ops.Features.hashBucketCensus(df, c, nBuckets)
    def cooccurrencePmi(text: String, window: Int, minCount: Long,
        minPair: Long): DataFrame =
      Corpus.cooccurrencePmi(df, text, window, minCount, minPair)
    def thresholdReport(scoreCol: String, labelCol: String,
        thrPpm: Seq[Long]): DataFrame =
      Validate.thresholdReport(df, scoreCol, labelCol, thrPpm)
    def thresholdReportBy(group: String, scoreCol: String,
        labelCol: String, thrPpm: Seq[Long]): DataFrame =
      Validate.thresholdReportBy(df, group, scoreCol, labelCol, thrPpm)
    def robustZscoreBy(group: String, id: String,
        valueCol: String): DataFrame =
      FrameOps.robustZscoreBy(df, group, id, valueCol)
    def robustZscoreByHist(group: String, id: String, valueCol: String,
        loCents: Long, hiCents: Long, nBins: Int): DataFrame =
      FrameOps.robustZscoreByHist(df, group, id, valueCol,
        loCents, hiCents, nBins)
    def aggSnapshot(keys: Seq[String], valueCol: String): DataFrame =
      FrameOps.aggSnapshot(df, keys, valueCol)
    /** `df` is the existing snapshot state. */
    def mergeAggSnapshot(delta: DataFrame, keys: Seq[String]): DataFrame =
      FrameOps.mergeAggSnapshot(df, delta, keys)
    def piiScanExtended(id: String, text: String): DataFrame =
      TextAnalysis.piiScanExtended(df, id, text)
    def tCloseness(quasiCols: Seq[String], sensitive: String): DataFrame =
      Validate.tCloseness(df, quasiCols, sensitive)
    /** `df` holds the tombstoned root keys. */
    def cascadePurgePlan(rootKey: String,
        chain: Seq[(String, DataFrame, String, String)]): DataFrame =
      Validate.cascadePurgePlan(df, rootKey, chain)
    /** `df` is the reference slice. */
    def psiDrift(current: DataFrame, valueCol: String,
        boundaries: Seq[Double]): DataFrame =
      Validate.psiDrift(df, current, valueCol, boundaries)
    def canonicalUrlGroups(id: String, url: String): DataFrame =
      graft.ops.TextAnalysis.canonicalUrlGroups(df, id, url)

    // ---- embedding linalg (Linalg) ----------------------------------
    def gramianMicro(vec: String, dim: Int): DataFrame =
      Linalg.gramianMicro(df, vec, dim)
    def columnSumsMicro(vec: String, dim: Int): DataFrame =
      Linalg.columnSumsMicro(df, vec, dim)
    def projectTo(vec: String, basis: Seq[Array[Double]],
        outCol: String = "proj"): DataFrame =
      Linalg.projectTo(df, vec, basis, outCol)

    // ---- multi-keyword tagging (Keywords) ---------------------------
    def tagKeywords(id: String, text: String, keywords: Seq[String]): DataFrame =
      Keywords.tagKeywords(df, id, text, keywords)
    def keywordSummary(id: String, text: String, keywords: Seq[String]): DataFrame =
      Keywords.keywordSummary(df, id, text, keywords)

    // ---- datetime long tail (DatetimeOps) ---------------------------
    def withIsocalendar(dateCol: String, prefix: String = "iso_"): DataFrame =
      df.withColumn(prefix + "year", DatetimeOps.isoYear(df(dateCol)))
        .withColumn(prefix + "week", DatetimeOps.isoWeek(df(dateCol)))
        .withColumn(prefix + "day", DatetimeOps.isoDow(df(dateCol)))
    def withBusdayCount(startCol: String, endCol: String,
        as: String = "busdays"): DataFrame =
      df.withColumn(as, DatetimeOps.busdayCount(df(startCol), df(endCol)))

    // ---- scale joins / layout (ScaleJoins, Layout) ------------------
    def bloomSemiJoin(dim: DataFrame, factKey: String, dimKey: String,
        expectedItems: Long, fpp: Double = 0.01): DataFrame =
      ScaleJoins.bloomSemiJoin(df, dim, factKey, dimKey, expectedItems, fpp)
    def rangeJoinBinned(intervals: DataFrame, pointCol: String, loCol: String,
        hiCol: String, binWidth: Double): DataFrame =
      ScaleJoins.rangeJoinBinned(df, intervals, pointCol, loCol, hiCol, binWidth)
    def sessionize(userCol: String, tsCol: String, gapSec: Long): DataFrame =
      ScaleJoins.sessionize(df, userCol, tsCol, gapSec)
    def sessionStats(userCol: String, tsCol: String, gapSec: Long,
        valueCol: String): DataFrame =
      ScaleJoins.sessionStats(df, userCol, tsCol, gapSec, valueCol)
    def funnelSteps(userCol: String, tsCol: String, typeCol: String,
        steps: Seq[String]): DataFrame =
      ScaleJoins.funnelSteps(df, userCol, tsCol, typeCol, steps)
    // --- round-9 additions ---------------------------------------
    def kCoreFixpoint(src: String, dst: String, k: Int): DataFrame =
      ops.Graph.kCorePeel(df, src, dst, k, rounds = -1)
    def harmonicCentralityMicro(src: String, dst: String,
        maxDepth: Int = 3, directed: Boolean = false): DataFrame =
      ops.Graph.harmonicCentralityMicro(df, src, dst, maxDepth, directed)
    def betweennessSampled(src: String, dst: String, k: Int = 16,
        maxDepth: Int = 4, directed: Boolean = false): DataFrame =
      ops.Graph.betweennessSampled(df, src, dst, k, maxDepth, directed)
    def pointInTimeJoin(dim: DataFrame, key: String, ts: String,
        validFrom: String = "valid_from",
        validTo: String = "valid_to"): DataFrame =
      ops.FrameOps.pointInTimeJoin(df, dim, key, ts, validFrom, validTo)
    def applyChangeSet(changes: DataFrame, key: String,
        op: String = "op", version: String = "version"): DataFrame =
      ops.FrameOps.applyChangeSet(df, changes, key, op, version)
    def cmsJoinSizeEstimate(other: DataFrame, key: String,
        depth: Int, width: Int): DataFrame =
      ops.Sketches.cmsJoinSizeEstimate(df, other, key, depth, width)
    def sqTopKLearned(queries: DataFrame, id: String, vec: String,
        k: Int): DataFrame =
      ops.Similarity.sqTopKLearned(df, queries, id, vec, k)
    // --- round-10 additions --------------------------------------
    def harmonicCentralityHyperBall(src: String, dst: String,
        maxDepth: Int = 3, directed: Boolean = false, p: Int = 10): DataFrame =
      ops.Graph.harmonicCentralityHyperBall(df, src, dst, maxDepth, directed, p)
    def quantileMapHist(ref: DataFrame, valueCol: String,
        lo: Double, hi: Double, nBuckets: Int = 32): DataFrame =
      ops.Validate.quantileMapHist(df, ref, valueCol, lo, hi, nBuckets)
    def kmvSketch(value: Column, k: Int): DataFrame =
      ops.Sketches.kmvSketch(df, value, k)
    def neighborhoodFunction(src: String, dst: String, maxDepth: Int = 3,
        directed: Boolean = false): DataFrame =
      ops.Graph.neighborhoodFunctionExact(df, src, dst, maxDepth, directed)
    def kmvOverlap(other: DataFrame, k: Int): DataFrame =
      ops.Sketches.kmvOverlap(df, other, k)
    def kmvSetAlgebra(other: DataFrame, k: Int): DataFrame =
      ops.Sketches.kmvSetAlgebra(df, other, k)
    def embeddingDriftMicro(fresh: DataFrame, vecCol: String,
        dim: Int): DataFrame =
      ops.Validate.embeddingDriftMicro(df, fresh, vecCol, dim)
    def hitsCounts(src: String, dst: String, iterations: Int = 2): DataFrame =
      ops.Graph.hitsCounts(df, src, dst, iterations)
    def hitsMilli(src: String, dst: String, iterations: Int = 6): DataFrame =
      ops.Graph.hitsMilli(df, src, dst, iterations)
    def hitsMilliWeighted(src: String, dst: String, weight: String,
        iterations: Int = 6): DataFrame =
      ops.Graph.hitsMilliWeighted(df, src, dst, weight, iterations)
    def modularityMicro(src: String, dst: String, labels: DataFrame,
        node: String, label: String): DataFrame =
      ops.Graph.modularityMicro(df, src, dst, labels, node, label)
    def modularityWeightedMicro(src: String, dst: String, weight: String,
        labels: DataFrame, node: String, label: String): DataFrame =
      ops.Graph.modularityWeightedMicro(df, src, dst, weight, labels,
        node, label)
    def assortativityMicro(src: String, dst: String): DataFrame =
      ops.Graph.assortativityMicro(df, src, dst)
    def pageRankWeightedPpb(src: String, dst: String, weight: String,
        iterations: Int = 3): DataFrame =
      ops.Graph.pageRankWeightedPpb(df, src, dst, weight, iterations)
    def psiReferenceCounts(valueCol: String, bounds: Seq[Double]): Seq[Long] =
      ops.Validate.psiReferenceCounts(df, valueCol, bounds)
    // --- round-11 additions --------------------------------------
    def duplicationProfile(text: String): DataFrame =
      ops.Dedup.duplicationProfile(df, text)
    def trailingDistinct(ts: String, key: String, windowDays: Int,
        as: String = "n_distinct"): DataFrame =
      ops.FrameOps.trailingDistinct(df, ts, key, windowDays, as)
    def snapshotAt(changes: DataFrame, key: String, asOfVersion: Long,
        op: String = "op", version: String = "version"): DataFrame =
      ops.FrameOps.snapshotAt(df, changes, key, asOfVersion, op, version)
    def bipartiteProject(basket: String, item: String,
        maxPerBasket: Int): DataFrame =
      ops.Graph.bipartiteProject(df, basket, item, maxPerBasket)
    /** `df` is the edge list; two-layer GNN feature prep. */
    def neighborAgg(src: String, dst: String, feats: DataFrame,
        nodeCol: String, featCol: String): DataFrame =
      ops.Graph.neighborAgg(df, src, dst, feats, nodeCol, featCol)
    /** `df` is the edge list; k-truss (rounds = -1 peels to fixpoint). */
    def kTruss(src: String, dst: String, k: Int,
        rounds: Int = 2, maxFixpointRounds: Int = 1000): DataFrame =
      ops.Graph.kTruss(df, src, dst, k, rounds, maxFixpointRounds)
    def sequenceMotifs(userCol: String, tsCol: String, tiebreak: String,
        typeCol: String, n: Int = 3): DataFrame =
      ops.ScaleJoins.sequenceMotifs(df, userCol, tsCol, tiebreak, typeCol, n)
    def codeSwitchProfile(id: String, text: String): DataFrame =
      ops.TextAnalysis.codeSwitchProfile(df, id, text)
    def trimmedMeanBy(keys: Seq[String], valueCol: String,
        pLo: Double = 0.05, pHi: Double = 0.95): DataFrame =
      ops.FrameOps.trimmedMeanBy(df, keys, valueCol, pLo, pHi)
    def cohortRetention(userCol: String, tsCol: String): DataFrame =
      ops.FrameOps.cohortRetention(df, userCol, tsCol)
    /** `df` is corpus A of the linkage. */
    def linkageScores(b: DataFrame, id: String, block: String,
        fields: Seq[(String, Long, Long)],
        minScoreMilli: Long): DataFrame =
      ops.Dedup.linkageScores(df, b, id, block, fields, minScoreMilli)
    /** `df` is corpus A; learn Fellegi-Sunter weights from labeled pairs. */
    def linkageWeights(b: DataFrame, id: String, labeled: DataFrame,
        fields: Seq[String]): Seq[(String, Long, Long)] =
      ops.Dedup.linkageWeights(df, b, id, labeled, fields)
    def mutualInfoNano(xCol: String, yCol: String): DataFrame =
      ops.Validate.mutualInfoNano(df, xCol, yCol)
    def piiScan(id: String, text: String): DataFrame =
      ops.TextAnalysis.piiScan(df, id, text)
    def auditFingerprint(group: String, cols: Seq[String]): DataFrame =
      ops.Validate.auditFingerprint(df, group, cols)
    /** `df` carries one row per unit: covariate x, metric y, arm. */
    def cupedAdjust(armCol: String, xCol: String, yCol: String): DataFrame =
      ops.Validate.cupedAdjust(df, armCol, xCol, yCol)
    def conversionWilson(groupCol: String, convCol: String,
        z: Double = 1.96): DataFrame =
      ops.Validate.conversionWilson(df, groupCol, convCol, z)
    def isotonicCalibrate(scoreCol: String, labelCol: String,
        nBins: Int = 10): DataFrame =
      ops.Validate.isotonicCalibrate(df, scoreCol, labelCol, nBins)
    def seasonalNaiveBacktest(keyCol: String, tsCol: String,
        valueCol: String, season: Int = 7): DataFrame =
      ops.FrameOps.seasonalNaiveBacktest(df, keyCol, tsCol, valueCol, season)
    def srmCheck(armCol: String, arms: Seq[(String, Long)]): DataFrame =
      ops.Validate.srmCheck(df, armCol, arms)
    def negativeSampleRing(poolId: String, anchors: DataFrame,
        anchorId: String, k: Int, bucketBits: Int = 6): DataFrame =
      ops.Similarity.negativeSampleRing(df, poolId, anchors, anchorId,
        k, bucketBits)

    def zOrderBy(a: Column, b: Column, nFiles: Int): DataFrame =
      Layout.zOrderBy(df, a, b, nFiles)
    def hilbertOrderBy(a: Column, b: Column, nFiles: Int): DataFrame =
      Layout.hilbertOrderBy(df, a, b, nFiles)
  }
}
