package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE training vs an independent driver-side greedy reference.
  *
  * The reference implements textbook greedy BPE (one left-to-right
  * scan per word, skip after each merge); the distributed operator
  * uses two delimiter-guarded replace passes. They must agree on any
  * corpus free of 4+ self-pair runs (all natural words) — that
  * equivalence is the correctness claim; the run-of-4 divergence is
  * pinned separately as the documented variant.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook greedy merge: single scan, leftmost-first, skip. */
  private def greedyMerge(toks: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** Reference trainer over a word->count dict. */
  private def referenceTrain(words: Map[String, Long], nMerges: Int)
      : Seq[(String, String, Long)] = {
    var dict = words.map { case (w, c) => (w.toVector.map(_.toString), c) }.toVector
    val rules = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      dict.foreach { case (toks, c) =>
        toks.zip(toks.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        rules += ((l, r, c))
        dict = dict.map { case (toks, cnt) => (greedyMerge(toks, l, r), cnt) }
      }
    }
    rules.result()
  }

  test("learnMerges matches the greedy reference on a natural corpus") {
    val docs = Seq(
      "the merger hurt the larger charter",
      "spark sparks sparse parse part partner",
      "lower slower tower power flower",
      "internal winter winner inner dinner",
      "the the the merger part part")
    val df = docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    val got = Bpe.learnMerges(df, "text", nMerges = 8)
      .orderBy("iter")
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

    val words = docs.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, o) => (w, o.size.toLong) }
    assert(got === referenceTrain(words, 8))
  }

  test("mergeOnce: two-pass replace equals greedy on alternating chains, documented variant on self-runs") {
    val df = Seq("a b a b a b", "a a a a", "a a a", "h e l l o").toDF("toks")
    val ab = df.select(Bpe.mergeOnce(col("toks"), "a", "b")).as[String].collect()
    assert(ab.toSeq === Seq("ab ab ab", "a a a a", "a a a", "h e l l o"))
    val aa = df.select(Bpe.mergeOnce(col("toks"), "a", "a")).as[String].collect()
    // "a a a a" -> "aa aa" matches greedy; runs of 5+ may differ (documented)
    assert(aa.toSeq === Seq("a b a b a b", "aa aa", "aa a", "h e l l o"))
  }

  test("encode: n_subwords shrinks toward n_words as merges increase") {
    val df = Seq((0L, "spark spark merge merge merge window"),
      (1L, "the window the window")).toDF("doc_id", "text")
    val few = Bpe.encode(df, "doc_id", "text", 1)
      .agg(sum("n_subwords")).as[Long].head()
    val many = Bpe.encode(df, "doc_id", "text", 12)
      .agg(sum("n_subwords")).as[Long].head()
    val nWords = Bpe.encode(df, "doc_id", "text", 1)
      .agg(sum("n_words")).as[Long].head()
    assert(many < few)
    assert(many >= nWords)
  }
}
