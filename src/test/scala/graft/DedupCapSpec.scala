package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.Dedup

/** Exactness of the maxDf stop-gram cap in ngramJaccardPairs: dropping
  * hot posting lists from candidate generation (the 100 TB skew guard)
  * must change the plan, never the result. The bound: a qualifying pair
  * (J ≥ t) shares I ≥ t/(1+t)·(szA+szB) grams, so a doc with hot-gram
  * count h ≤ t/(1+t)·sz always contributes a cold shared gram to any
  * qualifying pair; hot-heavy docs are quarantined and keep their hot
  * postings. Verified here capped ≡ uncapped on adversarial fixtures
  * (boilerplate grams everywhere, docs made ENTIRELY of boilerplate)
  * and on random corpora; q95b hash-gates the same claim vs DuckDB.
  */
class DedupCapSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], minJ: Double, maxDf: Int,
      maxUnsafe: Double = 1.0) =
    Dedup.ngramJaccardPairs(
        docs.toDF("doc_id", "text").withColumn("blk", lit(0)),
        "doc_id", "text", "blk", ngram = 3, minJaccard = minJ, maxDf = maxDf,
        maxUnsafeFrac = maxUnsafe)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet

  test("duplicationProfile: bucket boundaries, redundancy, corpus share") {
    // clusters: 3 singletons (bucket 0), one pair (bucket 1), one
    // 4-cluster (bucket 2) — whitespace variants must collapse (norm)
    val docs = (
      Seq("solo one", "solo two", "solo three") ++
      Seq("dup pair", "dup  PAIR") ++
      Seq.fill(4)("big cluster")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Dedup.duplicationProfile(docs, "text")
      .orderBy(col("bucket"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      // (bucket, lo_sz, n_clusters, n_docs, n_redundant, max_sz, docs_bp)
      (0, 1L, 3L, 3L, 0L, 1L, 3333L),
      (1, 2L, 1L, 2L, 1L, 2L, 2222L),
      (2, 4L, 1L, 4L, 3L, 4L, 4444L)))
    // shares sum to ≤ 10000 (floor) and redundancy = docs − clusters
    assert(out.map(_._7).sum <= 10000L)
    assert(out.map(t => t._4 - t._3).toSeq == out.map(_._5).toSeq)
  }

  test("capped equals uncapped when a boilerplate gram is in every doc") {
    // every doc ends with the same boilerplate sentence → its trigrams
    // have df = N and the uncapped posting explode would be quadratic
    val boiler = "all rights reserved contact us today"
    val docs = (0L until 10L).map { i =>
      val body = if (i % 2 == 0) s"alpha beta gamma delta epsilon zeta doc$i"
                 else s"alpha beta gamma delta omega psi doc$i"
      i -> s"$body $boiler"
    }
    val un = pairs(docs, 0.3, 0)
    val cp = pairs(docs, 0.3, 3)
    assert(cp == un, s"capped=$cp uncapped=$un")
    assert(un.nonEmpty) // the fixture actually produces near-dup pairs
  }

  test("hot-heavy docs sharing ONLY hot grams are still found (quarantine)") {
    // docs 100/101 are pure boilerplate: every gram is hot once the
    // 8 copies push df over maxDf, so they are "unsafe" and keep hot
    // postings — dropping them naively would lose a jaccard=1.0 pair
    val boiler = "one two three four five six seven eight"
    val docs = (0L until 8L).map(i => i -> s"filler$i pad$i more$i stuff$i $boiler") ++
      Seq(100L -> boiler, 101L -> boiler)
    val un = pairs(docs, 0.5, 0)
    val cp = pairs(docs, 0.5, 4)
    assert(cp == un, s"capped=$cp uncapped=$un")
    assert(cp.contains((100L, 101L, 1.0)), s"quarantined pair lost: $cp")
  }

  test("capped equals uncapped on random corpora (property)") {
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val genDocs: Gen[List[(Long, String)]] =
      Gen.listOfN(9, Gen.listOfN(8, Gen.oneOf(vocab)).map(_.mkString(" ")))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val prop = Prop.forAll(genDocs, Gen.oneOf(1, 2, 3)) { (docs, cap) =>
      pairs(docs, 0.3, cap) == pairs(docs, 0.3, 0)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, s"cap-exactness: ${res.status}")
  }

  test("wholesale-duplicated corpus fails fast with routing guidance") {
    // 12 verbatim copies of one doc: every trigram's df is 12, so with
    // maxDf=8 every gram is hot and every doc is unsafe — the shape the
    // round-6 100× stress DNF'd on. The default guard must refuse it
    // and point at exact-dedup-first, not silently run the quadratic
    // pair scan.
    val docs = (0L until 12L).map(i => i -> "alpha beta gamma delta epsilon zeta eta")
    val e = intercept[IllegalArgumentException] {
      pairs(docs, 0.3, 8, maxUnsafe = 0.5)
    }
    assert(e.getMessage.contains("exact-deduplicated first"), e.getMessage)
    // explicit opt-out still computes the exact answer
    val forced = pairs(docs, 0.3, 8, maxUnsafe = 1.0)
    assert(forced == pairs(docs, 0.3, 0), "opt-out path must stay exact")
    assert(forced.size == 12 * 11 / 2)
  }

  test("non-integral id is rejected with a clear message") {
    val df = Seq(("x", "a b c d")).toDF("doc_id", "text").withColumn("blk", lit(0))
    val e = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(df, "doc_id", "text", "blk")
    }
    assert(e.getMessage.contains("integral id"))
  }

  test("tfidfCosinePairs: verbatim duplicates score 1, disjoint docs never pair") {
    val docs = Seq(
      (1L, "red fox jumps over lazy dog"),
      (2L, "red fox jumps over lazy dog"), // verbatim dup of 1
      (3L, "entirely different words here"),
      (4L, "red fox naps")).toDF("doc_id", "text")
    val got = Dedup.tfidfCosinePairs(docs, "doc_id", "text", minCosine = 0.05)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(got((1L, 2L)) - 1.0) < 1e-9,
      "identical docs must have cosine 1")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)) &&
      !got.contains((3L, 4L)), "docs sharing no term must not pair")
    // (1,4)/(2,4) share 'red'+'fox'; both appear and are symmetric
    assert(got.contains((1L, 4L)) && got((1L, 4L)) == got((2L, 4L)))
  }

  test("tfidfCosinePairs: maxDf cap is a no-op below the cap; plan has no cartesian") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "beta gamma delta"),
      (3L, "gamma delta epsilon"), (4L, "zeta eta theta")).toDF("doc_id", "text")
    def run(cap: Int) =
      Dedup.tfidfCosinePairs(docs, "doc_id", "text", minCosine = 0.01, maxDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(0) == run(100), "cap above every df must not change results")
    val plan = Dedup.tfidfCosinePairs(docs, "doc_id", "text", 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"all-pairs similarity must stay posting-list-joined:\n$plan")
  }
}
