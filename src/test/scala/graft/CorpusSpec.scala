package graft

import org.apache.spark.sql.functions._
import graft.ops.Corpus

/** Unit-level invariants for the corpus-preparation operators; the
  * end-to-end values are hash-gated by q140–q145's DuckDB oracles.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfTiny).cache()

  test("decontaminate flags every benchmark member at 100% overlap") {
    val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val res = Corpus.decontaminate(docs, bench, "doc_id", "text", n = 3)
    val self = res.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select("doc_id", "n_grams", "n_overlap").collect()
    assert(self.nonEmpty)
    // a benchmark doc shares all of its own grams
    assert(self.forall(r => r.getInt(1) == r.getInt(2)))
  }

  test("redactPii leaves no raw email/ip/phone behind and counts match") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a@b.co and 10.1.2.3 call 555-1234"),
      (2L, "clean text, no pii here"),
      (3L, "two mails x@y.org z@w.net one ip 192.168.0.1")
    ).toDF("doc_id", "text")
    val r = Corpus.redactPii(df, "text").orderBy("doc_id").collect()
    assert(r(0).getAs[String]("redacted") == "mail <EMAIL> and <IP> call <PHONE>")
    assert(r(0).getAs[Int]("n_emails") == 1 && r(0).getAs[Int]("n_ips") == 1
      && r(0).getAs[Int]("n_phones") == 1)
    assert(r(1).getAs[String]("redacted") == "clean text, no pii here")
    assert(r(2).getAs[Int]("n_emails") == 2 && r(2).getAs[Int]("n_ips") == 1)
    assert(!r.exists(_.getAs[String]("redacted").contains("@")))
  }

  test("packSequences offsets are a prefix sum regardless of chunk size") {
    val n = size(split(graft.ops.Dedup.normText(col("text")), " "))
    val a = Corpus.packSequences(docs, "doc_id", n, budget = 512, chunkSize = 7)
      .orderBy("doc_id").collect()
    val b = Corpus.packSequences(docs, "doc_id", n, budget = 512, chunkSize = 64)
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq) // chunking is an implementation detail
    // start_off is the running sum of preceding n_tokens
    var run = 0L
    a.foreach { r =>
      assert(r.getAs[Long]("start_off") == run, s"doc ${r.get(0)}")
      run += r.getAs[Int]("n_tokens")
    }
    // window ids are non-decreasing and match the offset arithmetic
    assert(a.forall(r => r.getAs[Long]("window_id") == r.getAs[Long]("start_off") / 512))
  }

  test("curriculumInterleave: weighted density, chunking-invariant ranks, unknown source dropped") {
    import spark.implicits._
    val rows = (0L until 60L).map(i =>
      (i, if (i % 3 == 0) "a" else "b")) // 20 a-docs, 40 b-docs
    val df = rows.toDF("doc_id", "source")
    val weights = Seq(("a", 1L), ("b", 2L), ("ghost", 3L))
      .toDF("source", "weight")
    val out = Corpus.curriculumInterleave(df, "doc_id", "source", weights)
      .orderBy(col("vt_micro"), col("source"), col("rn")).collect()
    assert(out.length == 60)
    // weight 2 means b's k-th doc has vt = k*5e5 while a's has k*1e6 —
    // in any prefix ending at a's k-th doc, b contributes ~2k docs
    val firstA10 = out.indexWhere(r =>
      r.getString(1) == "a" && r.getLong(2) == 10L)
    val bBefore = out.take(firstA10).count(_.getString(1) == "b")
    assert(bBefore >= 19 && bBefore <= 21, s"b density off: $bBefore")
    // two-phase rank == the naive per-source (hash, id) window rank
    val naive = df
      .withColumn("hb", pmod(col("doc_id") * 2654435761L, lit(4294967296L)))
      .withColumn("rn0", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("hb"), col("doc_id"))))
      .select(col("doc_id"), col("rn0").cast("long").as("rn0"))
    val joined = Corpus.curriculumInterleave(df, "doc_id", "source", weights)
      .join(naive, "doc_id")
    assert(joined.filter(col("rn") =!= col("rn0")).count() == 0)
    // chunkBits is an implementation detail
    val alt = Corpus.curriculumInterleave(df, "doc_id", "source", weights,
      chunkBits = 3).orderBy("doc_id").collect()
    assert(alt.toSeq ==
      Corpus.curriculumInterleave(df, "doc_id", "source", weights)
        .orderBy("doc_id").collect().toSeq)
    // a source missing from the weights frame is dropped, not defaulted
    val partial = Seq(("a", 1L)).toDF("source", "weight")
    assert(Corpus.curriculumInterleave(df, "doc_id", "source", partial)
      .select("source").distinct().collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("sampleByHash is deterministic and rate-ordered by stratum") {
    val rates = Map("es" -> 0.5, "zh" -> 0.05)
    val s1 = Corpus.sampleByHash(docs, "doc_id", "lang", rates, 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Corpus.sampleByHash(docs, "doc_id", "lang", rates, 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // no RNG: identical across runs
    val kept = Corpus.sampleByHash(docs, "doc_id", "lang", rates, 0.2)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def frac(l: String) = kept.getOrElse(l, 0L).toDouble / total(l)
    // loose bounds: multiplicative hashing is uniform enough at sf0.001
    assert(frac("es") > 0.3 && frac("es") < 0.7)
    assert(frac("zh") < 0.2)
  }

  test("tfidf emits exactly k ranked terms per doc with positive scores") {
    val r = Corpus.tfidf(docs, "doc_id", "text", k = 3)
    val byDoc = r.groupBy("doc_id").agg(count(lit(1)).as("n"),
        min("rnk").as("lo"), max("rnk").as("hi")).collect()
    assert(byDoc.forall(x => x.getAs[Long]("n") <= 3 && x.getAs[Int]("lo") == 1))
    assert(r.filter(col("score") < 0).count() == 0) // ln(N/df) >= 0
  }

  test("semanticDupPairs returns ordered pairs above the threshold") {
    val emb = Tables.embeddings(spark, sfTiny)
    val pairs = Corpus.semanticDupPairs(emb, "vec_id", "embedding",
      nClusters = 4, threshold = 0.4, iters = 2).collect()
    assert(pairs.forall(p => p.getLong(0) < p.getLong(1)))
    assert(pairs.forall(p => p.getDouble(2) > 0.4))
  }

  test("heavyHitters equals the exact full-count top-k and proves it") {
    import graft.ops.Dedup
    val hh = Corpus.heavyHitters(docs, "doc_id", "text", k = 10, capacity = 512)
      .orderBy("rnk").collect()
    val exact = docs
      .select(explode(split(Dedup.normText(col("text")), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").count()
      .orderBy(col("count").desc, col("term").asc)
      .limit(10).collect()
    assert(hh.length == 10)
    assert(hh.map(r => (r.getAs[String]("term"), r.getAs[Long]("cnt"))).toSeq ==
      exact.map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(hh.forall(_.getAs[Int]("ok") == 1)) // displacement bound held
  }

  test("heavyHitters survives a capacity squeeze only when provable") {
    // tiny capacity: results may still be right, but if the bound fails
    // the op must SAY so via ok=0 rather than silently claim exactness
    import graft.ops.Dedup
    val hh = Corpus.heavyHitters(docs, "doc_id", "text", k = 10, capacity = 8)
      .collect()
    val total = docs
      .select(explode(split(Dedup.normText(col("text")), " ")).as("t"))
      .filter(length(col("t")) > 0).count()
    assert(hh.forall(r =>
      (r.getAs[Int]("ok") == 1) == (r.getAs[Long]("cnt") * 8 > total)))
  }

  test("boilerplateStrip removes exactly the chunks shared by >=minDocs") {
    import spark.implicits._
    val df = Seq(
      (1L, "common header block here unique tail one two three"),
      (2L, "common header block here different body words go here"),
      (3L, "common header block here third doc tail tokens end"),
      (4L, "totally unrelated content with no shared chunk at all")
    ).toDF("doc_id", "text")
    val r = Corpus.boilerplateStrip(df, "doc_id", "text", w = 4, minDocs = 3)
      .orderBy("doc_id").collect()
    // the first 4-token chunk "common header block here" appears in 3 docs
    assert(r(0).getAs[Int]("n_boiler") == 1)
    assert(!r(0).getAs[String]("clean_text").contains("common header"))
    assert(r(0).getAs[String]("clean_text").startsWith("unique tail"))
    assert(r(3).getAs[Int]("n_boiler") == 0)
    assert(r(3).getAs[String]("clean_text") ==
      "totally unrelated content with no shared chunk at all")
  }

  test("dedupLinesKeepFirst keeps exactly the first occurrence of each chunk") {
    import spark.implicits._
    val df = Seq(
      (1L, "common header block here unique tail one two"),
      (2L, "common header block here different body words go"),
      (3L, "unique tail one two common header block here")
    ).toDF("doc_id", "text")
    val r = Corpus.dedupLinesKeepFirst(df, "doc_id", "text", w = 4)
      .orderBy("doc_id").collect()
    // doc 1 owns both chunks' first occurrences; C4 keeps ONE copy
    assert(r(0).getAs[Int]("n_removed") == 0)
    assert(r(0).getAs[String]("text_dedup") ==
      "common header block here unique tail one two")
    // doc 2's leading chunk is a later copy; its unique chunk survives
    assert(r(1).getAs[Int]("n_removed") == 1)
    assert(r(1).getAs[String]("text_dedup") == "different body words go")
    // every chunk of doc 3 already occurred in doc 1 — all removed
    assert(r(2).getAs[Int]("n_chunks") == 2)
    assert(r(2).getAs[Int]("n_removed") == 2)
    assert(r(2).getAs[String]("text_dedup") == "")
  }

  test("dedupLinesKeepFirst removes within-doc repeats, keeping the earlier") {
    import spark.implicits._
    val df = Seq((1L, "a b c d a b c d x y z w")).toDF("doc_id", "text")
    val r = Corpus.dedupLinesKeepFirst(df, "doc_id", "text", w = 4).collect()
    assert(r(0).getAs[Int]("n_chunks") == 3)
    assert(r(0).getAs[Int]("n_removed") == 1)
    assert(r(0).getAs[String]("text_dedup") == "a b c d x y z w")
  }

  test("tierByHistogram splits a uniform ladder into exact terciles") {
    import spark.implicits._
    val df = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val r = Corpus.tierByHistogram(df, "x", lo = 0.0, hi = 10.0,
        nBuckets = 10, cutsBp = Seq(3334, 6667))
      .orderBy("id").collect()
    // buckets 1..9; cume(b)=b, n=9: tb1 = 4 (first cume*1e4 >= 9*3334),
    // tb2 = 7 — tiers 0/0/0 1/1/1 2/2/2
    assert(r.map(_.getAs[Int]("tier")).toSeq ==
      Seq(0, 0, 0, 1, 1, 1, 2, 2, 2))
    intercept[IllegalArgumentException] {
      Corpus.tierByHistogram(df, "x", 0.0, 10.0, 10, Seq(6667, 3334))
    }
    intercept[IllegalArgumentException] {
      Corpus.tierByHistogram(df, "x", 0.0, 10.0, 10, Seq(0, 5000))
    }
  }

  test("dedupCorpusKeepBest picks the max-quality survivor, ties to min id") {
    import spark.implicits._
    import graft.ops.Dedup
    val df = Seq(
      (1L, "x y z w v u t s", 5), // exact-dup cluster {1,2}: 2 wins on q
      (2L, "x y z w v u t s", 9),
      (3L, "completely different words here now", 1), // singleton
      (4L, "m n o p q r s t", 7), // tie cluster {4,5}: min id 4 wins
      (5L, "m n o p q r s t", 7)
    ).toDF("doc_id", "text", "q")
    val r = Dedup.dedupCorpusKeepBest(df, "doc_id", "text", "q")
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("best_id"),
      x.getAs[Int]("keep"))).toSeq == Seq(
      (1L, 2L, 0), (2L, 2L, 1), (3L, 3L, 1), (4L, 4L, 1), (5L, 4L, 0)))
  }

  test("bigramLmScore computes add-one-smoothed mean bigram logprob") {
    import spark.implicits._
    val df = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val r = Corpus.bigramLmScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // corpus: c1(a)=3 c1(b)=3 c1(c)=1, V=3; c2(a,b)=3 (b,a)=1 (b,c)=1
    // doc1 bigrams (a,b)(b,a)(a,b): avg(ln(4/6), ln(2/6), ln(4/6))
    val exp1 = (2 * math.log(4.0 / 6) + math.log(2.0 / 6)) / 3
    assert(r(0).getAs[Int]("n_bigrams") == 3)
    assert(math.abs(r(0).getAs[Double]("avg_logprob") -
      math.rint(exp1 * 10000) / 10000) < 1e-9)
    assert(r(1).getAs[Int]("n_bigrams") == 2)
  }

  test("invertedIndex truncates postings but keeps full df/tf") {
    import spark.implicits._
    val df = (1L to 15L).map(i => (i, "common word" + (i % 3)))
      .toDF("doc_id", "text")
    val r = Corpus.invertedIndex(df, "doc_id", "text", maxPostings = 4)
      .orderBy("term").collect()
    val common = r.find(_.getString(0) == "common").get
    assert(common.getAs[Int]("df") == 15)
    assert(common.getAs[Long]("tf_total") == 15L)
    assert(common.getAs[String]("postings") == "1,2,3,4") // truncated, sorted
  }

  test("pmiPairs: co-occurring pair positive, exclusive pair filtered") {
    import spark.implicits._
    // x and y always together; y and z never together
    val df = Seq((1L, "x y"), (2L, "x y"), (3L, "x y"), (4L, "z w"),
      (5L, "z w"), (6L, "z w")).toDF("doc_id", "text")
    val r = Corpus.pmiPairs(df, "doc_id", "text", topN = 4, minPairDf = 2)
      .collect()
    val xy = r.find(p => p.getString(0) == "x" && p.getString(1) == "y").get
    assert(xy.getAs[Long]("n_ab") == 3)
    // pmi = ln(3*6/(3*3)) = ln 2
    assert(math.abs(xy.getAs[Double]("pmi") - 0.6931) < 1e-9)
    assert(!r.exists(p => p.getString(0) == "w" && p.getString(1) == "x"))
  }

  test("dupSpans finds shared windows and the longest run; short docs are zero") {
    import spark.implicits._
    val df = Seq(
      (1L, "x1 x2 x3 x4 x5 x6 u1 u2"),
      (2L, "z0 x1 x2 x3 x4 x5 x6 w9"),
      (3L, "totally different words only here"),
      (4L, "tiny doc")
    ).toDF("doc_id", "text")
    val r = Corpus.dupSpans(df, "doc_id", "text", l = 5)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_windows") == 4)
    assert(r(0).getAs[Int]("n_dup") == 2)   // x1..x5, x2..x6
    assert(r(0).getAs[Int]("max_run") == 2) // consecutive positions
    assert(r(1).getAs[Int]("n_dup") == 2)
    assert(r(2).getAs[Int]("n_dup") == 0)
    assert(r(3).getAs[Int]("n_windows") == 0) // shorter than l: guarded
    assert(r(3).getAs[Int]("n_dup") == 0)
  }

  test("suffixRankSpans: planted duplicates, exact boundaries, brute-force agreement") {
    import spark.implicits._
    val planted = "the quick brown fox jumps over the lazy dog today"  // 49 chars
    val df = Seq(
      (1L, s"alpha one $planted beta two"),
      (2L, s"gamma three four $planted delta"),
      (3L, s"unique text with no repeats at all whatsoever here"),
      // within-doc repeat: dupSpans' cross-doc countDistinct misses
      // this class; the suffix tier's corpus-wide count >= 2 catches it
      (4L, "zzqjxkvw0123456789abcdefghij!!! and zzqjxkvw0123456789abcdefghij??")
    ).toDF("doc_id", "text")
    val L = 20
    val got = Corpus.suffixRankSpans(df, "doc_id", "text", minLen = L)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // brute force on the normalized texts: every L-window with global
    // count >= 2, islands merged
    val norm = df.select($"doc_id",
        graft.ops.Dedup.normText($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val wins = norm.flatMap { case (d, s) =>
      (1 to s.length - L + 1).map(i => (d, i, s.substring(i - 1, i - 1 + L))) }
    val dupW = wins.groupBy(_._3).filter(_._2.size >= 2).keySet
    val want = norm.flatMap { case (d, s) =>
      val ps = (1 to math.max(s.length - L + 1, 0))
        .filter(i => dupW.contains(s.substring(i - 1, i - 1 + L)))
      // islands
      val runs = ps.foldLeft(List.empty[List[Int]]) {
        case (acc, p) if acc.nonEmpty && acc.head.head == p - 1 =>
          (p :: acc.head) :: acc.tail
        case (acc, p) => List(p) :: acc
      }.map(_.reverse).reverse
      runs.map(r => (d, r.head.toLong, (r.last + L - 1).toLong,
        (r.last + L - 1 - r.head + 1).toLong, r.size.toLong))
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq,
      s"got ${got.mkString(";")} want ${want.mkString(";")}")
    // the planted 49-char string shares its flanking spaces in both
    // docs, so the maximal duplicated span is exactly 51 chars — the
    // suffix tier finds the true maximal extent, not just the plant
    assert(got.exists(t => t._1 == 1L && t._4 == 51L))
    assert(got.exists(t => t._1 == 4L))
    assert(!got.exists(_._1 == 3L))
  }

  test("suffixRankRewrite: first occurrence kept, covered chars excised") {
    import spark.implicits._
    val plant = "abcdefghijklmnopqrstuvwxyz0123456789"  // 36 chars
    val df = Seq(
      (1L, s"first $plant tail one"),
      (2L, s"second copy here $plant tail two"),
      (3L, "no duplicates in this row at all")
    ).toDF("doc_id", "text")
    val out = Corpus.suffixRankRewrite(df, "doc_id", "text", minLen = 20)
      .orderBy("doc_id").collect()
    // doc 1 holds the globally-first occurrence (min (id, p)) -> intact
    assert(out(0).getAs[Long]("n_removed") == 0L, out(0).toString)
    assert(out(0).getAs[String]("text_dedup") == s"first $plant tail one")
    // doc 2 loses the duplicated span; the plant may NOT survive there.
    // Exact extent: duplicated windows cover " plant tail" chars shared
    // with doc 1 (flanking space + " tail" shared too) — assert the
    // plant is gone and the prefix survives
    val d2 = out(1).getAs[String]("text_dedup")
    assert(out(1).getAs[Long]("n_removed") > 0L)
    assert(!d2.contains(plant) && d2.startsWith("second copy here"))
    // untouched doc passes through verbatim
    assert(out(2).getAs[Long]("n_removed") == 0L)
    assert(out(2).getAs[String]("text_dedup") ==
      "no duplicates in this row at all")
    // mass conservation: n_chars - n_removed = length of rebuilt text
    out.foreach { r =>
      assert(r.getAs[Long]("n_chars") - r.getAs[Long]("n_removed") ==
        r.getAs[String]("text_dedup").length, r.toString)
    }
  }

  test("dupAttribution: edges point at the globally-first occurrence") {
    import spark.implicits._
    val plant = "abcdefghijklmnopqrstuvwxyz0123456789"
    val df = Seq(
      (5L, s"late copy $plant end"),       // lowest id but NOT first by (id,p)? id 5 < 7 < 9 -> IS first
      (7L, s"another copy $plant here"),
      (9L, s"x $plant y $plant z"),        // two copies within one doc
      (11L, "nothing shared in this one")
    ).toDF("doc_id", "text")
    val edges = Corpus.dupAttribution(df, "doc_id", "text",
        minLen = 20, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // min (id, p) = doc 5 -> every edge sources at 5; dsts are 7 and 9
    // (twice the mass for 9's two copies), never 11, and 5 itself only
    // if it repeated the window internally (it doesn't)
    assert(edges.nonEmpty && edges.forall(_._1 == 5L), edges.mkString(";"))
    assert(edges.map(_._2).toSet == Set(7L, 9L), edges.mkString(";"))
    val m = edges.map(e => e._2 -> e._3).toMap
    assert(m(9L) > m(7L), s"doc 9 carries two copies: $m")
  }

  test("SuffixRankMemo: one kernel for all three consumers; misses on any key change; purge works") {
    import graft.ops.SuffixRankMemo
    // hold the memo's monitor for the whole test: suites run in
    // PARALLEL threads in the forked test JVM, and other suites
    // (PropertySpec, PlanSpec, QueriesSmokeSpec) also drive the memo —
    // without the lock the computeCount deltas below are racy. The
    // object's own methods synchronize on this same monitor, so
    // concurrent suffix calls just wait (~seconds), never deadlock.
    SuffixRankMemo.synchronized {
    SuffixRankMemo.clear()
    // fresh read PER CALL — the bench/verify pattern the memo exists
    // for: sameResult must hit across separate reads of the same path
    def slice = Tables.documents(spark, sfTiny)
      .filter(col("doc_id") % 16 === 0)
    val c0 = SuffixRankMemo.computeCount
    val base = Corpus.suffixRankSpans(slice, "doc_id", "text", minLen = 20)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(SuffixRankMemo.computeCount == c0 + 1)
    // both remaining consumers HIT the same kernel
    Corpus.suffixRankRewrite(slice, "doc_id", "text", minLen = 20).count()
    Corpus.dupAttribution(slice, "doc_id", "text", minLen = 20,
      topK = 10).count()
    assert(SuffixRankMemo.computeCount == c0 + 1,
      "rewrite/attribution must reuse the spans kernel")
    // a different minLen MISSES…
    Corpus.suffixRankSpans(slice, "doc_id", "text", minLen = 21).count()
    assert(SuffixRankMemo.computeCount == c0 + 2)
    // …and EVICTED the minLen=20 entry (capacity one, purge-on-miss):
    // the hit result must still be bit-identical to the fresh compute
    val re = Corpus.suffixRankSpans(slice, "doc_id", "text", minLen = 20)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(SuffixRankMemo.computeCount == c0 + 3)
    assert(re == base, "recompute after eviction must match the memo era")
    // a different input plan (tighter filter) MISSES
    Corpus.suffixRankSpans(
      Tables.documents(spark, sfTiny).filter(col("doc_id") % 32 === 0),
      "doc_id", "text", minLen = 20).count()
    assert(SuffixRankMemo.computeCount == c0 + 4)
    // explicit purge: next identical call recomputes
    SuffixRankMemo.clear()
    Corpus.suffixRankSpans(slice, "doc_id", "text", minLen = 20).count()
    assert(SuffixRankMemo.computeCount == c0 + 5)
    // SELF-HEAL: an external unpersist (a harness cache purge) drops
    // the checkpoint blocks out from under the live entry — a
    // localCheckpointed frame is not fault-tolerant, so a stale hit
    // would throw CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. The memo must
    // read the dead entry as a MISS and recompute. Unpersist is
    // TARGETED at the memo's own pinned ids: a global
    // unpersist-everything here would poison OTHER parallel suites'
    // live localCheckpoint frames (it did — two suites failed in the
    // first full run with the global version).
    val pinned = SuffixRankMemo.pinnedRddIds
    assert(pinned.nonEmpty,
      "live entry must expose its pinned checkpoint RDD")
    spark.sparkContext.getPersistentRDDs
      .foreach { case (rid, rdd) =>
        if (pinned.contains(rid)) rdd.unpersist(blocking = true) }
    val healed = Corpus.suffixRankSpans(slice, "doc_id", "text", minLen = 20)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(SuffixRankMemo.computeCount == c0 + 6,
      "a purged entry must recompute, not serve a poisoned frame")
    assert(healed == base)
    SuffixRankMemo.clear()
    }
  }

  test("bottomKPerStratum: exact n per stratum, membership is stable") {
    val s1 = Corpus.bottomKPerStratum(docs, "lang", "doc_id", n = 4)
    val counts = s1.groupBy("lang").count().collect()
    val langSizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { r =>
      assert(r.getLong(1) == math.min(4L, langSizes(r.getString(0))))
    }
    // consistency: sampling a SUBSET never invents new members for the
    // strata the subset covers (bottom-k union-merge property)
    val sub = Corpus.bottomKPerStratum(
      docs.filter(col("doc_id") < 250), "lang", "doc_id", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val full = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    // members of the full sample that are < 250 must appear in the
    // subset sample (smaller pool can only keep or promote them)
    assert(full.filter(_ < 250).subsetOf(sub))
  }

  test("decontaminateLarge equals decontaminate even at fpp=0.5") {
    // a coarse bloom floods the shuffle with false positives — the
    // trailing exact gram semi-join must kill every one of them
    val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val small = key(Corpus.decontaminate(docs, bench, "doc_id", "text", n = 3))
    val large = key(Corpus.decontaminateLarge(docs, bench, "doc_id", "text",
      n = 3, fpp = 0.5))
    assert(small == large)
    assert(small.nonEmpty)
  }

  test("qualityClassifierScore rejects empty docs deterministically") {
    import spark.implicits._
    val df = Seq((1L, "real text with several honest tokens here"),
      (2L, ""), (3L, "   \t ")).toDF("doc_id", "text")
    val r = Corpus.qualityClassifierScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    for (i <- Seq(1, 2)) { // empty and whitespace-only: no null leaks
      assert(r(i).getAs[Int]("n_tokens") == 0)
      assert(r(i).getAs[Double]("score") == 0.0)
      assert(!r(i).getAs[Boolean]("keep"))
    }
    assert(r(0).getAs[Int]("n_tokens") == 7 && !r(0).isNullAt(2))
  }

  test("weightedSample excludes null and non-positive weights") {
    import spark.implicits._
    val df = Seq((1L, "en", Some(5.0)), (2L, "en", Some(0.0)),
        (3L, "en", Some(-2.0)), (4L, "en", Some(3.0)), (5L, "en", None))
      .toDF("doc_id", "lang", "w")
    val kept = Corpus.weightedSample(df, "doc_id", "lang", col("w"), n = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L)) // w<=0 / null rows never corrupt ranks
  }

  test("splitAssign: splits are exhaustive, disjoint, and growth-stable") {
    val s1 = Corpus.splitAssign(docs, "doc_id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    assert(s1.count() == docs.count()) // every row gets exactly one split
    assert(s1.select("split").distinct().count() <= 3)
    // membership is a pure id function: a shrunken corpus assigns the
    // SAME split to every surviving doc (eval-set hygiene under growth)
    val s2 = Corpus.splitAssign(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val joined = s1.select(col("doc_id"), col("split").as("a"))
      .join(s2.select(col("doc_id"), col("split").as("b")), "doc_id")
    assert(joined.filter(col("a") =!= col("b")).count() == 0)
  }

  test("mixtureTemperature: tau=1 keeps natural shares; high tau flattens") {
    val t1 = Corpus.mixtureTemperature(docs, "doc_id", "lang",
        tau = 1.0, budget = 100)
      .select("lang", "target", "n_stratum").distinct().collect()
    val total = t1.map(_.getLong(2)).sum.toDouble
    t1.foreach { r => // tau=1: target == observed share
      assert(math.abs(r.getDouble(1) - r.getLong(2) / total) < 1e-12)
    }
    val tBig = Corpus.mixtureTemperature(docs, "doc_id", "lang",
        tau = 100.0, budget = 100)
      .select("lang", "target").distinct().collect().map(_.getDouble(1))
    val nLangs = tBig.length
    tBig.foreach(t => assert(math.abs(t - 1.0 / nLangs) < 0.02)) // ~uniform
  }

  test("mixtureUpsample replicates by floor(r) + hash-gated fractional copy") {
    import spark.implicits._
    val tiny = (0L until 10L).map(i => (i, "a")).toDF("doc_id", "lang")
    // rate = 25 * 1.0 / 10 = 2.5: copies 0,1 always; copy 2 iff the
    // Knuth hash of the id lands under 0.5 * 2^32 (brute-forced here)
    val got = Corpus.mixtureUpsample(tiny, "doc_id", "lang",
        targets = Map("a" -> 1.0), budget = 25)
      .select("doc_id", "copy").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def bucket(i: Long): Long = {
      val m = (i * 2654435761L) % 4294967296L
      if (m < 0) m + 4294967296L else m
    }
    val expected = (0L until 10L).flatMap { i =>
      Seq((i, 0L), (i, 1L)) ++
        (if (bucket(i) < (0.5 * 4294967296L).toLong) Seq((i, 2L)) else Nil)
    }.toSet
    assert(got == expected)
    // a stratum with r <= 1 degenerates to exactly mixtureResample's set
    val docs10 = docs.limit(0).unionByName(docs) // fresh plan, same rows
    val up = Corpus.mixtureUpsample(docs, "doc_id", "lang",
        targets = Map("en" -> 1.0), budget = 50)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val down = Corpus.mixtureResample(docs10, "doc_id", "lang",
        targets = Map("en" -> 1.0), budget = 50)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(up == down)
    // rate 0 strata emit nothing
    assert(Corpus.mixtureUpsample(tiny, "doc_id", "lang",
      targets = Map("zz" -> 1.0), budget = 25).count() == 0)
  }

  test("containmentPairs: full containment scores 10000 bp") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e f g h"), (2L, "zz yy xx ww"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "b c d e")).toDF("doc_id", "text")
    val got = Corpus.containmentPairs(corpus, bench, "doc_id", "text",
      n = 3, minContainment = 0.5).collect()
    assert(got.length == 1) // doc 1 contains ALL of bench's 2 grams
    assert(got(0).getLong(0) == 1L && got(0).getLong(4) == 10000L)
  }

  test("bm25TopK matches a driver-side reference on a tiny corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark merge spark window"), (2L, "merge table row"),
      (3L, "spark spark spark spark"), (4L, "key value hash"))
      .toDF("doc_id", "text")
    val terms = Seq("spark", "merge")
    val got = Corpus.bm25TopK(corpus, "doc_id", "text", terms, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // independent reference
    val toks = Map(1L -> Seq("spark", "merge", "spark", "window"),
      2L -> Seq("merge", "table", "row"), 3L -> Seq.fill(4)("spark"),
      4L -> Seq("key", "value", "hash"))
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    val dfq = terms.map(t => t -> toks.values.count(_.contains(t))).toMap
    val want = toks.flatMap { case (id, ws) =>
      val s = terms.map { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0) 0L else {
          val idf = math.log((n - dfq(t) + 0.5) / (dfq(t) + 0.5) + 1.0)
          math.floor(idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + 0.75 * ws.size / avgdl)) * 10000.0).toLong
        }
      }.sum
      if (s != 0L) Some(id -> s) else None
    }
    assert(got == want)
  }

  test("knBigramLmScore matches the hand-computed KN probability") {
    import spark.implicits._
    // corpus bigrams: (a,b)x2 in doc1, (b,a) in doc1 and doc2.
    // c1(a)=2 n1f(a)=1; c1(b)=2 n1f(b)=1; n1b=1 both; |types|=2.
    // P = (2-0.75)/2 + (0.75*1/2)*(1/2) = 0.8125 for both bigrams.
    val df = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val r = Corpus.knBigramLmScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getDouble(2)))
    val lp = BigDecimal(math.log(0.8125))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.toSeq == Seq((1L, 3, lp), (2L, 1, lp)))
  }

  test("dedupSpansRewrite keeps only the globally-first duplicated span") {
    import spark.implicits._
    // doc 1 and doc 2 share the window "a b c"; doc 1 owns it (min id).
    // doc 3 repeats "x y z" WITHIN itself; first occurrence survives.
    // doc 4 is untouched.
    val df = Seq(
      (1L, "a b c tail1"),
      (2L, "head a b c"),
      (3L, "x y z x y z"),
      (4L, "no dups here")).toDF("doc_id", "text")
    val r = Corpus.dedupSpansRewrite(df, "doc_id", "text", l = 3)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getString(3)))
    assert(r(0) == ((1L, 4, 0, "a b c tail1")))
    assert(r(1) == ((2L, 4, 3, "head")))
    // doc 3 windows: (x y z)@1&4 dup; (y z x)@2, (z x y)@3 unique;
    // marked start 4 covers tokens 4..6
    assert(r(2) == ((3L, 6, 3, "x y z")))
    assert(r(3) == ((4L, 3, 0, "no dups here")))
  }

  test("sourceReport: hand-computed counts, dup rate, and token mass") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "web"),
      (2L, "alpha  beta gamma ", "web"), // normalizes to doc 1's text
      (3L, "delta", "web"),
      (4L, "one two", "books"),
      (5L, "three four five six", "books")
    ).toDF("doc_id", "text", "source")
    val r = Corpus.sourceReport(docs, "doc_id", "text", "source")
      .collect().map(x => x.getAs[String]("source") -> x).toMap
    val web = r("web")
    assert(web.getAs[Long]("n_docs") == 3 && web.getAs[Long]("n_distinct") == 2)
    assert(web.getAs[Long]("token_mass") == 7) // 3 + 3 + 1
    assert(web.getAs[Long]("dup_bp") == 3333) // floor(1*10000/3)
    assert(web.getAs[Long]("mean_toks_c") == 233) // floor(700/3)
    val books = r("books")
    assert(books.getAs[Long]("n_docs") == 2 && books.getAs[Long]("n_distinct") == 2)
    assert(books.getAs[Long]("dup_bp") == 0 && books.getAs[Long]("token_mass") == 6)
  }

  test("dsirLogWeights ranks target-like docs above the rest") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfTiny)
    val w = Corpus.dsirLogWeights(docs, docs.filter($"lang" === "en"),
        "doc_id", "text", buckets = 256)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
    val byLang = w.groupBy($"lang" === "en")
      .agg(org.apache.spark.sql.functions.avg($"logw" / $"n_tokens").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"en target must score en docs higher: $byLang")
    // every doc with tokens gets a finite weight; empty docs are absent
    assert(w.count() == docs.filter(org.apache.spark.sql.functions
      .length(org.apache.spark.sql.functions.trim($"text")) > 0).count())
    assert(w.filter($"logw".isNull || $"logw".isNaN).count() == 0)
  }

  test("naiveBayesPredict: disjoint vocab separates perfectly; tie breaks to smaller label") {
    import spark.implicits._
    val seeds = Seq(
      (1L, "apple banana apple", "fruit"), (2L, "banana cherry", "fruit"),
      (3L, "bolt nut bolt", "tool"), (4L, "nut wrench", "tool")
    ).toDF("id", "text", "cls")
    val unseen = Seq(
      (10L, "apple cherry banana"), (11L, "wrench bolt nut"),
      (12L, "apple bolt") // symmetric evidence: one token each side
    ).toDF("id", "text")
    val p = Corpus.naiveBayesPredict(unseen, seeds, "id", "text", "cls")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(p(10L) == "fruit" && p(11L) == "tool")
    // 12: "apple" (2 fruit hits) vs "bolt" (2 tool hits), same class
    // totals and priors → exact integer score tie → smaller label wins
    assert(p(12L) == "fruit")
    // holds at any partitioning (integer scores, no association drift)
    val p7 = Corpus.naiveBayesPredict(unseen.repartition(7),
        seeds.repartition(5), "id", "text", "cls")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(p7 == p)
  }

  test("hashedBowVectors: dense, deterministic, parity-bounded, ANN-composable") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha"), (2L, "alpha beta alpha"), // identical docs
      (3L, "gamma delta epsilon zeta")
    ).toDF("id", "text")
    val v = Corpus.hashedBowVectors(docs, "id", "text", dim = 16)
      .collect().map(r => (r.getLong(0), (r.getSeq[Float](1), r.getLong(2)))).toMap
    // identical text -> identical vector (the dup-detection bridge)
    assert(v(1L)._1 == v(2L)._1 && v(1L)._2 == 3L)
    assert(v.values.forall(_._1.length == 16))
    // each token adds +-1 to one cell: L1 <= n_tokens, same parity
    v.values.foreach { case (vec, n) =>
      val l1 = vec.map(x => math.abs(x).toLong).sum
      assert(l1 <= n && (n - l1) % 2 == 0, s"L1=$l1 n=$n")
    }
    // partition invariance (integer cells, order-free)
    val v7 = Corpus.hashedBowVectors(docs.repartition(7), "id", "text", dim = 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(v.view.mapValues(_._1).toMap == v7)
    // composable with the ANN tier: nearest neighbor of doc 1 is its twin
    val emb = Corpus.hashedBowVectors(docs, "id", "text", dim = 16)
      .select($"id".as("vec_id"), $"vec".as("embedding"))
    val nn = graft.ops.Similarity.bruteForceTopK(emb,
        emb.filter($"vec_id" === 1), "vec_id", "embedding", k = 2)
      .orderBy($"rnk").collect()
    // self excluded: rank-1 neighbor is the identical twin (cos = 1)
    assert(nn(0).getAs[Long]("n_id") == 2L)
  }

  test("naiveBayesPredict on the fixture beats the majority-class baseline") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfSmall)
    val pred = Corpus.naiveBayesPredict(
        docs.filter($"doc_id" % 3 === 0), docs.filter($"doc_id" % 3 =!= 0),
        "doc_id", "text", "lang")
      .select($"doc_id", $"lang".as("pred"))
      .join(docs.select($"doc_id", $"lang"), "doc_id")
    val n = pred.count().toDouble
    val acc = pred.filter($"pred" === $"lang").count() / n
    val major = docs.filter($"doc_id" % 3 === 0).groupBy($"lang").count()
      .agg(org.apache.spark.sql.functions.max($"count")).head.getLong(0) / n
    // fixture text is topic-agnostic so separation is weak; the gate is
    // that training MOVES the needle vs predicting the majority class
    assert(acc >= major, s"nb acc=$acc must be >= majority=$major")
  }

  test("domainDrift: identical sources have zero KL; a skewed one doesn't") {
    // two sources with the SAME distribution → every term ratio is 1,
    // ln 1 = 0, floor(0) = 0; a third all-on-one-term source drifts
    val df = Seq(
      (1L, "a b", "s1"), (2L, "a b", "s2"),
      (3L, "c c c c", "s3")
    ).toDF("doc_id", "text", "source")
    val r = Corpus.domainDrift(df, "text", "source")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // s1/s2: p(a)=p(b)=1/2 within source; corpus-wide p(a)=p(b)=2/8 —
    // ratio 2 → kl = 2·floor(1e9·0.5·ln 2) = 2·346573590
    assert(r("s1") == ((2L, 2L, 693147180L, 693147180L)))
    assert(r("s2") == r("s1"))
    // s3: single term → entropy 0; ratio (4/4)/(4/8) = 2 → ln 2
    assert(r("s3")._1 == 4L && r("s3")._2 == 1L)
    assert(r("s3")._3 == 693147180L && r("s3")._4 == 0L)
  }

  test("domainDrift is partition-count invariant (floor-nano contract)") {
    val docs = Tables.documents(spark, sfSmall)
    val a = Corpus.domainDrift(docs.repartition(1), "text", "source")
      .collect().map(_.toSeq).toSet
    val b = Corpus.domainDrift(docs.repartition(13), "text", "source")
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("lengthBuckets: hand-checked buckets, clamped tail, pad math") {
    val df = Seq(
      (1L, "a b c"),                               // 3 toks → bucket 16
      (2L, Seq.fill(17)("w").mkString(" ")),       // 17 → bucket 32
      (3L, Seq.fill(5000)("w").mkString(" "))      // clamps to 2048
    ).toDF("doc_id", "text")
    val r = Corpus.lengthBuckets(df, "text")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(16L) == ((1L, 3L, 13L, 10000L * 13 / 16)))
    assert(r(32L) == ((1L, 17L, 15L, 10000L * 15 / 32)))
    assert(r(2048L) == ((1L, 2048L, 0L, 0L)))
    assert(r.keySet == Set(16L, 32L, 2048L))
  }

  test("lengthBuckets rejects unsorted boundaries fast") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] {
      Corpus.lengthBuckets(df, "text", boundaries = Seq(32, 16))
    }
  }

  test("vocabDiff: hand-counted gained/lost/shared and mass shares") {
    val old = Seq((1L, "a a b")).toDF("doc_id", "text")
    val fresh = Seq((2L, "b c c c")).toDF("doc_id", "text")
    val r = Corpus.vocabDiff(old, fresh, "text").head
    // old vocab {a, b}, new {b, c}: shared 1, gained 1 (c), lost 1 (a)
    assert(r.getAs[Long]("n_terms_old") == 2 && r.getAs[Long]("n_terms_new") == 2)
    assert(r.getAs[Long]("n_shared") == 1 && r.getAs[Long]("n_gained") == 1 &&
      r.getAs[Long]("n_lost") == 1)
    assert(r.getAs[Long]("mass_old") == 3 && r.getAs[Long]("mass_new") == 4)
    assert(r.getAs[Long]("gained_mass") == 3) // the three c's
    assert(r.getAs[Long]("vocab_jaccard_bp") == 10000L / 3)
    assert(r.getAs[Long]("gained_mass_bp") == 7500L)
  }

  test("classifierReport: hand-counted P/R/F1, one-sided classes get null") {
    val pred = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c"))
      .toDF("id", "pred")
    val truth = Seq((1L, "a"), (2L, "b"), (3L, "b"), (4L, "d"), (5L, "c"))
      .toDF("id", "label")
    val r = Corpus.classifierReport(pred, truth, "id", "pred", "label")
      .collect().map(x => x.getString(0) -> x.toSeq.drop(1)).toMap
    // a: tp=1 pred=2 truth=1 → P 5000, R 10000, F1 = 20000/3 = 6666
    assert(r("a") == Seq(1L, 2L, 1L, 5000L, 10000L, 6666L))
    // b: tp=1 pred=2 truth=2 → P 5000, R 5000, F1 5000
    assert(r("b") == Seq(1L, 2L, 2L, 5000L, 5000L, 5000L))
    // c: perfect singleton
    assert(r("c") == Seq(1L, 1L, 1L, 10000L, 10000L, 10000L))
    // d: truth-only → precision undefined (null), recall 0
    assert(r("d") == Seq(0L, 0L, 1L, null, 0L, 0L))
  }

  test("splitAssignSafe: exact duplicates always share a split") {
    // 60 distinct texts, each duplicated 3x with different ids and
    // whitespace/case noise (normText-equal) — id-hashed splitting
    // would scatter them; content-hashed must not
    val rows = (0 until 60).flatMap { i =>
      Seq((i * 3L, s"document number $i about topic ${i % 7}"),
        (i * 3L + 1, s"Document  Number $i about topic ${i % 7}"),
        (i * 3L + 2, s"  document number $i ABOUT topic ${i % 7} "))
    }
    val df = rows.toDF("doc_id", "text").repartition(5)
    val fracs = Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2)
    val out = Corpus.splitAssignSafe(df, "text", fracs)
      .withColumn("fp", md5(graft.ops.Dedup.normText(col("text"))))
    val leaked = out.groupBy(col("fp"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(leaked == 0L)
    // the same texts under ID-hashed splitAssign DO leak (negative
    // control: proves the test can detect scattering)
    val idLeak = Corpus.splitAssign(df, "doc_id", fracs)
      .withColumn("fp", md5(graft.ops.Dedup.normText(col("text"))))
      .groupBy(col("fp")).agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(idLeak > 0L)
    // all three labels actually used
    assert(out.select(col("split")).distinct().count() == 3L)
  }
  test("weightedSampleDet: deterministic E-S sample, weight monotonicity, top-k plan") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, 10L + (i % 7) * 5)).toDF("id", "w")
    val a = Corpus.weightedSampleDet(docs.repartition(3), "id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    val b = Corpus.weightedSampleDet(docs.repartition(11), "id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    assert(a.size == 50 && a == b) // partitioning-invariant
    // equal weights degenerate to pure hash order
    val eq = Corpus.weightedSampleDet(
        docs.withColumn("w", lit(5L)), "id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    val hashOrder = Corpus.weightedSampleDet(
        docs.withColumn("w", lit(1L)), "id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    assert(eq == hashOrder) // priority scales by 1/w uniformly
    // boosting one excluded id's weight 1000x pulls it into the sample
    val out = (1L to 500L).filterNot(a).head
    val boosted = docs.withColumn("w",
      when(col("id") === out, lit(1000000L)).otherwise(col("w")))
    val c = Corpus.weightedSampleDet(boosted, "id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    assert(c(out))
    // zero/negative weights and null ids are dropped, never sampled
    val dirty = docs.union(Seq((9999L, 0L), (9998L, -5L)).toDF("id", "w"))
    val d = Corpus.weightedSampleDet(dirty, "id", "w", 500)
      .collect().map(_.getLong(0)).toSet
    assert(!d(9999L) && !d(9998L) && d.size == 500)
    // plan: distributed top-k, not a global sort
    val plan = Corpus.weightedSampleDet(docs, "id", "w", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("weightedSampleDetBy: exact k per stratum, consistent with ungrouped priorities") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, 10L + (i % 5) * 3, s"g${i % 3}"))
      .toDF("id", "w", "grp")
    val by = Corpus.weightedSampleDetBy(docs, "id", "w", "grp", 20)
    val counts = by.groupBy($"grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("g0" -> 20L, "g1" -> 20L, "g2" -> 20L))
    // per-group selection = the group's k smallest ungrouped priorities
    val all = Corpus.weightedSampleDet(docs, "id", "w", 300)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = by.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expected = docs.collect()
      .map(r => (r.getString(2), r.getLong(0)))
      .groupBy(_._1).toSeq.flatMap { case (g, ids) =>
        ids.map(_._2).sortBy(i => (all(i), i)).take(20).map(g -> _).toSeq
      }.toSet
    assert(got == expected)
    // short strata keep everything
    val tiny = Seq((1L, 5L, "a"), (2L, 5L, "a")).toDF("id", "w", "grp")
    assert(Corpus.weightedSampleDetBy(tiny, "id", "w", "grp", 10).count() == 2L)
  }

  test("tokenEntropyBy: uniform = ln(D) nano, constant = 0, hand-checked mix") {
    import spark.implicits._
    // g1: 4 distinct values, once each -> H = ln(4); g2: one value -> 0;
    // g3: {a:3, b:1} -> 0.75*ln(4/3) + 0.25*ln(4)
    val rows = Seq(("g1", "a"), ("g1", "b"), ("g1", "c"), ("g1", "d"),
      ("g2", "x"), ("g2", "x"), ("g2", "x"),
      ("g3", "a"), ("g3", "a"), ("g3", "a"), ("g3", "b"))
    val got = Corpus.tokenEntropyBy(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def t(c: Long, n: Long) =
      math.floor(1e9 * (c.toDouble / n) * math.log(n.toDouble / c)).toLong
    assert(got("g1") == ((4L, 4L, 4 * t(1, 4))))
    assert(got("g2") == ((3L, 1L, 0L)))
    assert(got("g3") == ((4L, 2L, t(3, 4) + t(1, 4))))
    // partitioning-invariant (integer sum of exact terms)
    val a = Corpus.tokenEntropyBy(rows.toDF("g", "v").repartition(7), "g", "v")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(a == got.view.mapValues(_._3).toMap)
  }

  test("cooccurrencePmi: hand-counted windows, self-pairs dropped, cut-invariant normalizers") {
    // doc1 [a b a c] w=2: (a,b) (b,a->a,b) (b,c) (a,c); (a,a) dropped
    // doc2 [b a b]  w=2: (b,a->a,b) (a,b); (b,b) dropped
    // pairs: (a,b)x4 (a,c)x1 (b,c)x1 -> n_pair 6; unigrams a3 b3 c1 -> 7
    val df = Seq((1L, "a b a c"), (2L, "b a b")).toDF("doc_id", "text")
    val out = Corpus.cooccurrencePmi(df, "text", window = 2,
        minCount = 1L, minPair = 1L)
      .orderBy("term_a", "term_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // ROUND half-up at 4dp, the Spark round() contract
    def pmi(cab: Long, ca: Long, cb: Long): Double =
      BigDecimal(math.log(cab.toDouble * 7 / (ca.toDouble * cb) * (7.0 / 6)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      ("a", "b", 4L, 3L, 3L, pmi(4, 3, 3)),
      ("a", "c", 1L, 3L, 1L, pmi(1, 3, 1)),
      ("b", "c", 1L, 3L, 1L, pmi(1, 3, 1))), out.mkString(","))
    // frequency cuts drop rows but never move surviving values: the
    // normalizers are computed before the cut
    val cut = Corpus.cooccurrencePmi(df, "text", window = 2,
        minCount = 2L, minPair = 2L).collect()
    assert(cut.length == 1 && cut.head.getString(0) == "a"
      && cut.head.getString(1) == "b"
      && cut.head.getDouble(5) == pmi(4, 3, 3))
    // window=1 sees only adjacent tokens: (a,b)x4 (a,c)x1
    val w1 = Corpus.cooccurrencePmi(df, "text", window = 1,
        minCount = 1L, minPair = 1L)
      .orderBy("term_a", "term_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(w1.toSeq == Seq(("a", "b", 4L), ("a", "c", 1L)))
  }

  test("stupidBackoffScore matches brute force on all four ladder branches;" +
      " hashed tier agrees; partition-invariant") {
    import spark.implicits._
    // doc 1 hits branch 1 (seen trigram), doc 3 hits branch 2 (unseen
    // trigram, seen backoff bigram via train's "c a"), branch 3 with a
    // seen unigram ("d") and the 0.5 OOV floor (doc 5) all occur
    val rows = Seq(
      (0L, "a b c a b c d"),
      (1L, "a b c x y z a b"),
      (2L, "p q r s a b"),
      (3L, "a b d c a b"),
      (4L, "q r s p q r"),
      (5L, "zz yy xx"),
      (6L, "only two"))
    val df = rows.toDF("doc_id", "text")
    val train = df.filter(col("doc_id") % 2 === 0)
    def fetch(res: org.apache.spark.sql.DataFrame) = res.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = fetch(Corpus.stupidBackoffScore(df, train, "doc_id", "text"))

    def toks(s: String) = s.toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ").filter(_.nonEmpty).toSeq
    def grams(ts: Seq[String], n: Int) =
      if (ts.size < n) Seq.empty else ts.sliding(n).map(_.toList).toSeq
    val tr = rows.filter(_._1 % 2 == 0).map(t => toks(t._2))
    val c3 = tr.flatMap(grams(_, 3)).groupBy(identity).view.mapValues(_.size).toMap
    val c2 = tr.flatMap(grams(_, 2)).groupBy(identity).view.mapValues(_.size).toMap
    val c1 = tr.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val nTrain = tr.map(_.size).sum
    val exp = rows.flatMap { case (id, s) =>
      val tris = grams(toks(s), 3)
      if (tris.isEmpty) None
      else {
        val terms = tris.map { case List(w1, w2, w3) =>
          val v =
            if (c3.contains(List(w1, w2, w3)))
              math.log(c3(List(w1, w2, w3)).toDouble / c2(List(w1, w2)))
            else if (c2.contains(List(w2, w3)))
              math.log(0.4 * (c2(List(w2, w3)).toDouble / c1(w2)))
            else
              math.log(0.4 * 0.4 *
                (c1.get(w3).map(_.toDouble).getOrElse(0.5) / nTrain))
          math.floor(1e9 * v).toLong
        }
        Some((id, tris.size.toLong, terms.sum))
      }
    }.sortBy(_._1)
    assert(got == exp)
    // docs 0-5 score; doc 6 (< 3 tokens) carries no trigram evidence
    assert(got.size == 6 && !got.exists(_._1 == 6L))
    // hashed tier: bit-identical at a collision-free toy vocabulary
    val hashed = fetch(Corpus.stupidBackoffScoreHashed(df, train, "doc_id", "text"))
    assert(hashed == got)
    // floor-nano terms sum as integers: partitioning cannot move them
    val p7 = fetch(Corpus.stupidBackoffScore(df.repartition(7),
      train.repartition(3), "doc_id", "text"))
    assert(p7 == got)
  }

  test("packBestFit matches an in-memory BFD reference, respects capacity," +
      " and is partition-invariant") {
    import spark.implicits._
    val B = 10
    val S = 3
    val rows = (0L until 80L).map { i =>
      val n = ((i * 37 + 11) % 23 + 1).toInt // 1..23 tokens, splits occur
      (i, Seq.fill(n)("w").mkString(" "))
    }
    val df = rows.toDF("doc_id", "text")
    def fetch(res: org.apache.spark.sql.DataFrame) = res.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(t => (t._1, t._2)).toSeq
    val got = fetch(Corpus.packBestFit(df, "doc_id", "text", B, S))

    final case class P(shard: Long, did: Long, piece: Long, len: Long)
    val pieces = rows.flatMap { case (id, s) =>
      val n = s.split(" ").count(_.nonEmpty)
      val shard = id * 2654435761L % 4294967296L % S
      (0 until (n + B - 1) / B).map(p =>
        P(shard, id, p.toLong, math.min(B.toLong, n - p.toLong * B)))
    }
    val exp = pieces.groupBy(_.shard).toSeq.flatMap { case (shard, ps0) =>
      val ps = ps0.sortBy(p => (-p.len, p.did, p.piece))
      val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
      ps.map { p =>
        val feas = rem.zipWithIndex.filter(_._1 >= p.len)
        if (feas.isEmpty) {
          rem += (B - p.len)
          (p.did, p.piece, p.len, shard, rem.length.toLong)
        } else {
          val i = rem.indexOf(feas.map(_._1).min) // first = lowest bin id
          rem(i) -= p.len
          (p.did, p.piece, p.len, shard, (i + 1).toLong)
        }
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == exp)
    // no bin overfills and every doc's pieces sum to its token count
    val fills = got.groupBy(t => (t._4, t._5)).values.map(_.map(_._3).sum)
    assert(fills.forall(_ <= B))
    val perDoc = got.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    rows.foreach { case (id, s) =>
      assert(perDoc(id) == s.split(" ").count(_.nonEmpty).toLong)
    }
    // shard fold is independent of the input partitioning
    val p7 = fetch(Corpus.packBestFit(df.repartition(7), "doc_id", "text", B, S))
    assert(p7 == got)
    // the fill report aggregates the same layout
    val st = Corpus.packBestFitStats(
      Corpus.packBestFit(df, "doc_id", "text", B, S), B).orderBy("shard").collect()
    st.foreach { r =>
      val mine = got.filter(_._4 == r.getLong(0))
      assert(r.getLong(1) == mine.length.toLong)
      assert(r.getLong(2) == mine.map(_._5).distinct.length.toLong)
      assert(r.getLong(3) == mine.map(_._3).sum)
      assert(r.getLong(4) == (mine.map(_._3).sum + B - 1) / B)
    }
  }
}
