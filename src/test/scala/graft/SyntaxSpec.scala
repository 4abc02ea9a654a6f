package graft

import org.apache.spark.sql.functions._
import graft.syntax._

/** The fluent surface (graft.syntax) — every method delegates to a
  * graft.ops object, so these are wiring tests: the method resolves
  * implicitly, returns the delegate's frame, and the handful of
  * semantics spot-checks below catch argument-order mistakes in the
  * delegation (the op bodies themselves are oracle-gated via the
  * q-numbered queries).
  */
class SyntaxSpec extends SparkSpec {
  import spark.implicits._

  private lazy val series = Seq(
    (1, 1, Some(10.0)), (1, 2, None: Option[Double]), (1, 3, Some(30.0)),
    (1, 4, Some(45.0)),
    (2, 1, None: Option[Double]), (2, 2, Some(5.0))
  ).toDF("g", "i", "v")

  test("ffill/bfill/pctChange delegate with the right column roles") {
    val out = series
      .ffill("v", Seq("g"), Seq("i"), "ff")
      .bfill("v", Seq("g"), Seq("i"), "bf")
      .pctChange("v", Seq("g"), Seq("i"), "pc")
      .orderBy($"g", $"i")
      .select($"ff", $"bf", $"pc")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2))))
    assert(out(1) == ((Some(10.0), Some(30.0), None)))     // (1,2): ff carries, bf looks ahead
    assert(out(2) == ((Some(30.0), Some(30.0), None)))     // (1,3): null gap -> null pct (q78 rule)
    assert(out(3) == ((Some(45.0), Some(45.0), Some(0.5))))// (1,4): 45/30 - 1
    assert(out(4) == ((None, Some(5.0), None)))            // (2,1): leading null stays
  }

  test("rankAverage averages tie positions like pandas rank(method='average')") {
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0)).toDF("g", "x")
    val got = df.rankAverage("x", Seq("g"), "r").orderBy($"x").select($"r")
      .as[Double].collect()
    assert(got.toSeq == Seq(1.5, 1.5, 3.0))
  }

  test("topKPerGroup keeps k rows per group in order") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "x")
    val got = df.topKPerGroup(Seq("g"), Seq($"x".desc), 2)
      .orderBy($"g", $"rn").select($"g", $"x").as[(String, Int)].collect()
    assert(got.toSeq == Seq(("a", 3), ("a", 2), ("b", 9)))
  }

  test("valueCounts / modePerGroup / factorize / melt wire through") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z")).toDF("g", "v")
    assert(df.valueCounts(Seq("g")).head.getLong(1) == 3)
    val m = df.modePerGroup(Seq("g"), "v").orderBy($"g").collect()
    assert(m.map(_.getString(1)).toSeq == Seq("x", "z"))
    val f = df.factorize("v", "code").select($"v", $"code").distinct()
      .orderBy($"code").as[(String, Int)].collect()
    assert(f.toSeq == Seq(("x", 0), ("y", 1), ("z", 2)))
    val melted = Seq((1, 2.0, 3.0)).toDF("id", "p", "q").melt(Seq("id"), Seq("p", "q"))
    assert(melted.columns.toSeq == Seq("id", "variable", "value") && melted.count() == 2)
  }

  test("asofJoin and salted helpers delegate") {
    val trades = Seq(("s", 10L, 1.0), ("s", 20L, 2.0)).toDF("sym", "t", "px")
    val quotes = Seq(("s", 9L, 0.9), ("s", 19L, 1.9)).toDF("sym", "t", "bid")
    val a = trades.asofJoin(quotes, "t", "t", Seq("sym"), Seq("bid"))
      .orderBy($"t").select($"bid").as[Double].collect()
    assert(a.toSeq == Seq(0.9, 1.9))
    val l = Seq((1, "a"), (1, "b")).toDF("k", "x")
    val r = Seq((1, "R")).toDF("k", "y")
    assert(l.saltedJoin(r, "k").count() == 2)
    assert(l.saltedAgg(Seq("k"), "x" /* count/min/max only for strings */).count() == 1)
  }

  test("dedup + similarity + text + multimodal methods resolve and run") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "the quick brown fox jumps over the lazy dog again and again"),
        (3L, "an entirely different sentence about spark execution plans"))
      .toDF("doc_id", "text").withColumn("blk", lit(0))
    assert(docs.exactDuplicateGroups("doc_id", "text").count() == 2)
    assert(docs.dedupCorpus("doc_id", "text").filter($"keep" === 1).count() == 2)
    assert(docs.minhashCandidatePairs("doc_id", "text")
      .filter($"id_a" === 1 && $"id_b" === 2).head.getDouble(2) == 1.0)
    assert(docs.simhashNearPairs("doc_id", "text", "blk", maxHamming = 0).count() >= 1)
    assert(docs.ngramJaccardPairs("doc_id", "text", "blk", minJaccard = 0.9).count() == 1)
    assert(docs.ngramJaccardPairs("doc_id", "text", "blk", minJaccard = 0.9,
      maxDf = 1, maxUnsafeFrac = 1.0).count() == 1)
    assert(Seq((1L, 2L)).toDF("id_a", "id_b").connectedComponents().count() == 2)
    assert(Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b").connectedComponentsStar()
      .agg(countDistinct($"cluster")).head.getLong(0) == 1)

    val emb = Seq((1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0f, 1f)))
      .toDF("id", "vec")
    assert(emb.annTopK(emb.filter($"id" === 1), "id", "vec", 1).head.getLong(2) == 2L)
    assert(emb.embeddingNearPairs("id", "vec", minCosine = 0.8).count() == 1)
    assert(emb.annTopKIvfLearned(emb.filter($"id" === 1), "id", "vec",
      k = 1, nClusters = 2).count() >= 1)
    assert(emb.annTopKPq(emb.filter($"id" === 1), "id", "vec", dim = 2,
      k = 1, nSub = 2, nCodes = 2).count() == 1)
    assert(emb.annTopKIvfPq(emb.filter($"id" === 1), "id", "vec", dim = 2,
      k = 1, nClusters = 2, nProbe = 2, nSub = 2, nCodes = 2).count() == 1)

    assert(docs.withTextQuality("text").columns.contains("n_tokens"))
    assert(docs.gopherRules("doc_id", "text").columns.contains("gopher_pass"))
    // "a b a b a": bigrams = [a b, b a, a b, b a] -> top 2/4, dup 1 - 2/4
    val rep = Seq((1L, "a b a b a")).toDF("doc_id", "text")
      .repetitionStats("doc_id", "text")
      .select($"n_grams", $"top_gram_frac", $"dup_gram_frac").head
    assert(rep.getInt(0) == 4 && rep.getDouble(1) == 0.5 && rep.getDouble(2) == 0.5)
    assert(docs.withMediaColumn("doc_id", "text").schema("media").dataType.typeName == "binary")
    assert(docs.sampleFrames("doc_id", "text", frameChars = 10, step = 2).count() > 0)
  }

  test("corpus, scale-join, and layout methods resolve and run") {
    val docs = Seq(
        (1L, "alpha beta gamma delta epsilon", "en"),
        (2L, "alpha beta gamma delta epsilon", "en"),
        (3L, "zeta eta theta iota kappa", "es"))
      .toDF("doc_id", "text", "lang")
    assert(docs.decontaminate(docs.filter($"doc_id" === 3), "doc_id", "text", 2)
      .count() == 1)
    assert(docs.redactPii("text").columns.contains("redacted"))
    assert(docs.packSequences("doc_id", lit(5L), budget = 8).count() == 3)
    assert(docs.packBestFit("doc_id", "text", budget = 8, shards = 2)
      .count() == 3)
    assert(docs.packBestFit("doc_id", "text", budget = 8, shards = 2)
      .packBestFitStats(budget = 8).count() == 2)
    assert(docs.stupidBackoffScore(docs.filter($"doc_id" < 3), "doc_id", "text")
      .count() == 3)
    assert(docs.stupidBackoffScoreHashed(docs.filter($"doc_id" < 3),
      "doc_id", "text").count() == 3)
    assert(docs.sampleByHash("doc_id", "lang", Map("en" -> 1.0), 1.0).count() == 3)
    assert(docs.tfidfTopK("doc_id", "text", 1).count() == 3)
    assert(docs.heavyHitters("doc_id", "text", k = 2, capacity = 64).count() == 2)
    assert(docs.boilerplateStrip("doc_id", "text", w = 5, minDocs = 2)
      .filter($"doc_id" === 1).head.getAs[Int]("n_boiler") == 1)
    assert(docs.bottomKPerStratum("lang", "doc_id", 1).count() == 2)
    assert(docs.sourceReport("doc_id", "text", "lang")
      .filter($"source" === "en").head.getAs[Long]("dup_bp") == 5000L)
    assert(docs.bigramLmScore("doc_id", "text").count() == 3)
    assert(docs.invertedIndex("doc_id", "text", 5)
      .filter($"term" === "alpha").head.getAs[Int]("df") == 2)
    assert(docs.pmiPairs("doc_id", "text", topN = 10, minPairDf = 2).count() > 0)
    assert(docs.dupSpans("doc_id", "text", 5)
      .filter($"doc_id" === 1).head.getAs[Int]("n_dup") == 1)
    assert(docs.qualityClassifierScore("doc_id", "text").count() == 3)
    assert(docs.mixtureResample("doc_id", "lang", Map("en" -> 1.0), budget = 10)
      .count() == 2)
    assert(docs.vocabStats("text", maxFreq = 3).count() == 2)
    assert(docs.weightedSample("doc_id", "lang", lit(1.0), n = 1).count() == 2)
    // 5 tokens, size 3, step 2 -> chunks at 0,2: [t1 t2 t3], [t3 t4 t5]
    assert(docs.chunkDocuments("doc_id", "text", size = 3, overlap = 1)
      .filter($"doc_id" === 1).count() == 2)
    // doc 2 duplicates doc 1 -> exactly one 'duplicate' verdict; doc 3
    // shares no 2-grams with the doc-1 benchmark -> never contaminated
    val prep = docs.prepareCorpus("doc_id", "text", "lang",
        Map("en" -> 1.0, "es" -> 1.0), budget = 10,
        benchmark = docs.filter($"doc_id" === 1), n = 2, minTokens = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("reason")).toMap
    assert(prep(1L) == "contaminated" && prep(2L) == "contaminated" &&
      prep(3L) == "kept", prep.toString)
    assert(docs.shardManifest("doc_id", "text", nShards = 2)
      .agg(sum($"n_docs")).head.getLong(0) == 3)

    val emb = Seq((1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    assert(emb.semanticDupPairs("vec_id", "embedding", nClusters = 1,
      threshold = 0.5, iters = 1).count() == 1)

    val fact = Seq((1L, 10.0), (2L, 25.0)).toDF("k", "p")
    val dim = Seq((1L, "x")).toDF("dk", "v")
    assert(fact.bloomSemiJoin(dim, "k", "dk", expectedItems = 10).count() == 1)
    val ivs = Seq(("a", 0.0, 15.0)).toDF("band", "lo", "hi")
    assert(fact.rangeJoinBinned(ivs, "p", "lo", "hi", 10.0).count() == 1)
    val ev = Seq((1L, "u", 0L, 1.0), (2L, "u", 10000L, 2.0))
      .toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds($"sec"))
    assert(ev.sessionize("user_id", "ts", 1800).agg(max($"session_idx"))
      .head.getLong(0) == 2L)
    assert(ev.sessionStats("user_id", "ts", 1800, "value").count() == 2)
    assert(fact.zOrderBy($"k", $"p", nFiles = 1).count() == 2)

    val trades = Seq((1L, "A", 10L)).toDF("tid", "sym", "sec")
      .withColumn("ts", timestamp_seconds($"sec")).drop("sec")
    val quotes = Seq(("A", 8L, 99.0)).toDF("sym", "sec", "px")
      .withColumn("ts", timestamp_seconds($"sec")).drop("sec")
    assert(trades.asofJoinMerge(quotes, "ts", "ts", Seq("sym"), Seq("px"))
      .head.getAs[Double]("px") == 99.0)

    val corpus = Seq((1L, "en", "the fast window"), (2L, "en", "slow scan"))
      .toDF("doc_id", "lang", "text")
    val wp = corpus.wordpieceTokenize("doc_id", "text")
    assert(wp.columns.toSeq ==
      Seq("doc_id", "n_words", "n_tokens", "n_unk", "token_ids"))
    assert(wp.agg(sum($"n_unk")).head.getLong(0) == 0L)
    assert(corpus.join(wp.select("doc_id", "n_tokens"), "doc_id")
      .mixtureResampleTokens("doc_id", "lang", $"n_tokens",
        Map("en" -> 1.0), budgetTokens = 1000).count() == 2)
    val nums = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 7.0)).toDF("x", "y")
    assert(nums.corrMatrix(Seq("x", "y")).count() == 3)

    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(edges.pageRankPpb("src", "dst").count() == 2)
    assert(edges.degreeStats("src", "dst").count() == 2)
    assert(emb.gramianMicro("embedding", 2).count() == 3)
    assert(emb.columnSumsMicro("embedding", 2).count() == 2)
    assert(emb.projectTo("embedding", Seq(Array(1.0, 0.0))).columns.contains("proj"))
    assert(corpus.tagKeywords("doc_id", "text", Seq("fast", "scan")).count() == 2)
    assert(corpus.keywordSummary("doc_id", "text", Seq("fast", "scan")).count() == 2)
    val dts = Seq(("2024-01-01", "2024-01-08")).toDF("s", "e")
      .select($"s".cast("date").as("s"), $"e".cast("date").as("e"))
    assert(dts.withIsocalendar("s").select("iso_week").head.getInt(0) == 1)
    assert(dts.withBusdayCount("s", "e").select("busdays").head.getInt(0) == 5)
  }

  test("round-8 session wrappers resolve and delegate") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    assert(edges.triangleCount("src", "dst").count() == 4)
    assert(edges.linkPredict("src", "dst", minCommon = 1).count() >= 1)
    val corpus = Seq((1L, "alpha beta", "s1"), (2L, "alpha beta", "s2"))
      .toDF("doc_id", "text", "source")
    assert(corpus.domainDrift("text", "source").count() == 2)
    assert(corpus.lengthBuckets("text").count() == 1)
    assert(corpus.splitAssignSafe("text",
      Seq("a" -> 0.5, "b" -> 0.5)).columns.contains("split"))
    val pred = Seq((1L, "x"), (2L, "y")).toDF("id", "p")
    val truth = Seq((1L, "x"), (2L, "x")).toDF("id", "t")
    assert(pred.classifierReport(truth, "id", "p", "t").count() == 2)
    val log = Seq((1L, 1L, "A"), (1L, 2L, "B")).toDF("k", "i", "s")
    assert(log.scd2Intervals("k", Seq("i"), Seq("s")).count() == 2)
    val rk = Seq((0L, 1L, 1)).toDF("q_id", "n_id", "rnk")
    assert(rk.rankingMetrics(rk, k = 3).head.getLong(2) == 1000000L)
    val parent = Seq(1L).toDF("pk")
    val child = Seq(1L, 9L).toDF("fk")
    assert(child.fkCheck(parent, "fk", "pk").head.getLong(2) == 1L)
    val vals = Seq(1.0, 2.0, 9.0).toDF("v")
    assert(vals.kAnonymity(Seq("v"), k = 2).count() == 1)
    assert(vals.psiDrift(vals, "v", Seq(5.0)).count() == 2)
    // r14 additions resolve and run through the fluent surface
    val fe = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("id", "cat", "y")
    assert(fe.generalizeToK(Seq("cat"), "y", Seq(1L, 10L), k = 2)
      .count() == 2)
    assert(fe.categorify("cat").filter($"cat_id" > 0).count() == 3)
    assert(fe.targetEncode("id", "cat", "y", k = 2, alpha = 1L)
      .columns.contains("cat_te_micro"))
    val cw = Seq(("a", 1L), ("b", 2L)).toDF("source", "weight")
    assert(fe.withColumnRenamed("cat", "source")
      .curriculumInterleave("id", "source", cw).count() == 3)
    assert(Seq((1L, "ssn 219-09-9999")).toDF("doc_id", "text")
      .piiScanExtended("doc_id", "text").head.getLong(3) == 1L)
    val urls = Seq((1L, "https://www.x.com/a?utm_source=1"),
      (2L, "https://x.com/a")).toDF("uid", "url")
    assert(urls.canonicalUrlGroups("uid", "url").count() == 1)
  }

  test("round-9 session wrappers resolve and delegate") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    assert(tri.kCoreFixpoint("src", "dst", k = 2).count() == 3)
    assert(tri.harmonicCentralityMicro("src", "dst").count() == 4)
    val snap = Seq((1L, "a")).toDF("k", "attr")
    val ch = Seq((2L, 1L, "U", "b")).toDF("k", "version", "op", "attr")
    assert(snap.applyChangeSet(ch, "k").count() == 2)
    val dim = Seq((1L, 10L, Option.empty[Long], "X"))
      .toDF("k", "valid_from", "valid_to", "state")
    val facts = Seq((1L, 15L)).toDF("k", "t")
    assert(facts.pointInTimeJoin(dim, "k", "t")
      .head.getAs[String]("state") == "X")
    val a = Seq(1L, 2L).toDF("k")
    assert(a.cmsJoinSizeEstimate(a, "k", depth = 2, width = 8)
      .head.getLong(0) >= 2L)
    val emb = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(-1.0f, 0.5f))).toDF("vec_id", "embedding")
    assert(emb.sqTopKLearned(emb.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 1).head.getLong(2) != 1L)
  }

  test("round-10 session wrappers resolve and delegate") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    // tiny ball sizes → sketch is exact → same rows as the exact op
    assert(tri.harmonicCentralityHyperBall("src", "dst", p = 10).count() == 4)
    val cur = Seq.tabulate(20)(i => (i + 10).toDouble).toDF("v")
    val ref = Seq.tabulate(20)(_.toDouble).toDF("v")
    assert(cur.quantileMapHist(ref, "v", 0.0, 40.0, nBuckets = 8)
      .count() == 20)
    val docs = Seq("a", "b", "c").toDF("s")
    assert(docs.kmvSketch(col("s"), k = 8).count() == 3)
    val wstar = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    assert(wstar.pageRankWeightedPpb("src", "dst", "w", iterations = 1)
      .count() == 3)
    assert(docs.kmvSketch(col("s"), 8)
      .kmvOverlap(docs.kmvSketch(col("s"), 8), 8)
      .head.getLong(1) == 10000L)
    val lined = Seq((1L, "a b c d e f g h"), (2L, "a b c d z y x w"))
      .toDF("doc_id", "text")
    assert(lined.dedupLinesKeepFirst("doc_id", "text", w = 4)
      .agg(sum($"n_removed")).head.getLong(0) == 1L)
    val scored = Seq.tabulate(10)(i => (i.toLong, i.toDouble))
      .toDF("id", "sc")
    // threshold bucket kept conservatively: cume(b)=b+1, tb=2 → drop {0,1}
    assert(scored.thresholdKeepByHistogram("sc", 0.0, 10.0, 10, 3000)
      .filter(!$"keep").count() == 2)
    // tb = 4 (first bucket with cume ≥ 5) → tier 1 = values 4..9
    assert(scored.tierByHistogram("sc", 0.0, 10.0, 10, Seq(5000))
      .filter($"tier" === 1).count() == 6)
    val qd = Seq((1L, "p q r s t u v w", 1), (2L, "p q r s t u v w", 9))
      .toDF("doc_id", "text", "q")
    assert(qd.dedupCorpusKeepBest("doc_id", "text", "q")
      .filter($"keep" === 1).head.getLong(0) == 2L)
  }

  test("round-11 wave-2 wrappers resolve and delegate") {
    val docs = Seq((1L, "same text"), (2L, "same  TEXT"), (3L, "other"))
      .toDF("doc_id", "text")
    // one pair cluster (bucket 1) + one singleton (bucket 0)
    assert(docs.duplicationProfile("text").count() == 2)
    val ev = Seq(("2024-01-01 10:00:00", 1L))
      .toDF("ts", "k").select(col("ts").cast("timestamp").as("ts"), col("k"))
    assert(ev.trailingDistinct("ts", "k", 7).head.getLong(1) == 1L)
    val snap = Seq((1L, "a")).toDF("k", "attr")
    val log = Seq((1L, 1L, "D", "x")).toDF("k", "version", "op", "attr")
    assert(snap.snapshotAt(log, "k", asOfVersion = 0L).count() == 1L)
    assert(snap.snapshotAt(log, "k", asOfVersion = 1L).count() == 0L)
    val inc = Seq(("b", 1L), ("b", 2L)).toDF("bk", "it")
    assert(inc.bipartiteProject("bk", "it", 8).head.getLong(2) == 1L)
  }

  test("r12 fluent surface: margin mining, neighborAgg, tCloseness, cascade purge") {
    def v(x: Double): Array[Float] =
      (Array(x, 1 - x) ++ Array.fill(62)(0.0)).map(_.toFloat)
    val a = Seq((0L, v(1.0))).toDF("vec_id", "embedding")
    val b = Seq((1L, v(0.9))).toDF("vec_id", "embedding")
    assert(a.marginMinedPairs(b, "vec_id", "embedding", k = 1,
      minMarginPpm = 0L).count() == 1L)
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val f = Seq((1L, 5L), (2L, 7L)).toDF("n", "x")
    assert(e.neighborAgg("src", "dst", f, "n", "x")
      .filter(col("node") === 2L).head.getLong(3) == 5L)
    val priv = Seq(("c1", "a"), ("c1", "a"), ("c2", "b"), ("c2", "b"))
      .toDF("qc", "s")
    assert(priv.tCloseness(Seq("qc"), "s").count() == 2L)
    val roots = Seq(1L).toDF("cid")
    val child = Seq((10L, 1L), (11L, 2L)).toDF("okey", "cfk")
    assert(roots.cascadePurgePlan("cid",
      Seq(("child", child, "cfk", "okey"))).head.getLong(3) == 1L)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(tri.kTruss("src", "dst", k = 3).count() == 3L)
    def t0(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$i%02d")
    val seq3 = Seq((1L, t0(1), 1L, "A"), (1L, t0(2), 2L, "B"))
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(seq3.sequenceMotifs("user_id", "ts", "event_id",
      "event_type", n = 2).head.getString(0) == "A>B")
    assert(Seq((1L, "the a fast")).toDF("doc_id", "text")
      .codeSwitchProfile("doc_id", "text").head.getString(3) == "en")
    assert(Seq(("g", 1.0), ("g", 3.0)).toDF("k", "v")
      .trimmedMeanBy(Seq("k"), "v", 0.0, 1.0).head.getDouble(6) == 2.0)
    assert(seq3.cohortRetention("user_id", "ts").count() == 1L)
    assert(Seq(("x", "x")).toDF("x", "y").mutualInfoNano("x", "y")
      .head.getLong(3) == 0L)
    assert(Seq("A", "B").toDF("arm")
      .srmCheck("arm", Seq(("A", 1L), ("B", 1L))).count() == 3L)
    val la = Seq((1L, "z", "m")).toDF("id", "blk", "f")
    val lb = Seq((2L, "z", "m")).toDF("id", "blk", "f")
    assert(la.linkageScores(lb, "id", "blk", Seq(("f", 1000L, -500L)),
      0L).head.getLong(3) == 1000L)
  }

  test("r13 fluent surface: IVF margin mining, linkage weight learning, k-truss fixpoint") {
    def v(x: Double): Array[Float] =
      (Array(x, 1 - x) ++ Array.fill(62)(0.0)).map(_.toFloat)
    val a = Seq((0L, v(1.0)), (2L, v(0.8))).toDF("vec_id", "embedding")
    val b = Seq((1L, v(0.9)), (3L, v(0.7))).toDF("vec_id", "embedding")
    assert(a.marginMinedPairsIvf(b, "vec_id", "embedding", k = 1,
      minMarginPpm = 0L, nClusters = 2, nProbe = 2).count() >= 1L)
    val wa = Seq((1L, "m"), (3L, "x")).toDF("id", "f")
    val wb = Seq((2L, "m"), (4L, "y")).toDF("id", "f")
    val lab = Seq((1L, 2L, true), (3L, 4L, false))
      .toDF("a_id", "b_id", "is_match")
    val w = wa.linkageWeights(wb, "id", lab, Seq("f"))
    assert(w.size == 1 && w.head._1 == "f" && w.head._2 > 0, w)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val fix = tri.kTruss("src", "dst", k = 3, rounds = -1)
    assert(fix.count() == 3L && fix.filter(col("src") === 3L).count() == 0L)
    val pii = Seq((1L, "x a@b.co y")).toDF("doc_id", "text")
    assert(pii.piiScan("doc_id", "text").head.getLong(1) == 1L)
    assert(Seq((1L, "s", "a")).toDF("id", "src", "v")
      .auditFingerprint("src", Seq("id", "v")).head.getLong(1) == 1L)
    val cu = Seq(("A", 1.0, 2.0), ("A", 2.0, 4.0), ("B", 3.0, 7.0),
      ("B", 4.0, 9.0)).toDF("arm", "x", "y")
    assert(cu.cupedAdjust("arm", "x", "y").head.getDouble(3) == 2.4)
    assert(Seq(("A", 1L), ("A", 0L)).toDF("g", "c")
      .conversionWilson("g", "c").head.getLong(3) == 500000L)
    def t13(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    val sb = Seq(("k", t13(1), 10.0), ("k", t13(8), 13.0))
      .toDF("key", "ts", "v")
    assert(sb.seasonalNaiveBacktest("key", "ts", "v").head.getLong(2) == 300L)
    val iso = Seq((0.05, 0L), (0.05, 1L), (0.15, 1L), (0.15, 1L))
      .toDF("score", "label")
    assert(iso.isotonicCalibrate("score", "label")
      .orderBy("bin").collect().map(_.getLong(4)).toSeq ==
      Seq(500000L, 1000000L))
  }
}
