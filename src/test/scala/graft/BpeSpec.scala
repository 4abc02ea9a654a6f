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

  // --- unigramTrainEm (r15) -------------------------------------------

  test("viterbiWordPath: optimal path, unique tie-break, unk fallback") {
    import graft.ops.TextAnalysis.viterbiWordPath
    // "abab": vocab ab=100, a=300, b=300 -> [ab, ab] (cost 200) beats
    // any char path (>= 4*300)
    val vm = Map("ab" -> 100L, "a" -> 300L, "b" -> 300L)
    assert(viterbiWordPath("abab", vm, 2, 9999L) === Seq("ab", "ab"))
    // tie on (cost, np): "aa" with a=100, aa=200 -> [aa] (1 piece,
    // cost 200) beats [a,a] (2 pieces, cost 200) on np
    val vm2 = Map("a" -> 100L, "aa" -> 200L)
    assert(viterbiWordPath("aa", vm2, 2, 9999L) === Seq("aa"))
    // full tie (cost AND np): "ab|c" vs "a|bc" both 2 pieces cost 300
    // -> path-string tie-break picks the lexicographically smaller
    val vm3 = Map("ab" -> 100L, "c" -> 200L, "a" -> 100L, "bc" -> 200L)
    assert(viterbiWordPath("abc", vm3, 2, 9999L) === Seq("a", "bc"))
    // unknown single char pays unkCost; multi-char unknowns never match
    val vm4 = Map("a" -> 100L)
    assert(viterbiWordPath("ax", vm4, 2, 7777L) === Seq("a", "x"))
  }

  test("viterbiWordPath agrees with brute-force enumeration") {
    import graft.ops.TextAnalysis.viterbiWordPath
    val vocab = Map("a" -> 300L, "b" -> 250L, "c" -> 350L, "ab" -> 400L,
      "bc" -> 380L, "ca" -> 420L, "abc" -> 500L, "cab" -> 510L)
    def enumerate(w: String): Seq[(Long, Long, String)] =
      if (w.isEmpty) Seq((0L, 0L, ""))
      else (1 to math.min(3, w.length)).flatMap { len =>
        val piece = w.take(len)
        val c = vocab.getOrElse(piece, if (len == 1) 10000L else -1L)
        if (c < 0) Seq.empty
        else enumerate(w.drop(len)).map { case (rc, rp, rs) =>
          (c + rc, 1 + rp,
            if (rs.isEmpty) piece else piece + "\u001f" + rs)
        }
      }
    // pseudo-random-ish but fixed word set over {a,b,c,x}
    val words = Seq("abcabc", "cabcab", "aabbcc", "abxca", "ccc",
      "bacab", "xxabc", "abcabcab")
    words.foreach { w =>
      val best = enumerate(w).min
      val got = viterbiWordPath(w, vocab, 3, 10000L)
      assert(got.mkString("\u001f") === best._3, s"word $w")
    }
  }

  test("unigramTrainEm: chars always survive, costs ordered by count, deterministic") {
    val df = Seq.tabulate(40)(i => (i.toLong,
      "the quick brown fox jumps over the lazy dog the end"))
      .toDF("doc_id", "text")
    val v = Bpe.unigramTrainEm(df, "text", nBigrams = 8, nTrigrams = 4,
      nWords = 4, keepTop = 6, iterations = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val pieces = v.map(_._1).toSet
    // every char of the corpus is present
    "thequickbrownfoxjumpsoverlazydgen".foreach { ch =>
      assert(pieces.contains(ch.toString), s"char $ch missing")
    }
    // at most keepTop non-char pieces survive the prune
    assert(v.count(_._1.length >= 2) <= 6)
    // higher count -> lower (or equal) cost: -log is monotone
    val byCnt = v.sortBy(-_._2)
    assert(byCnt.zip(byCnt.tail).forall { case (hi, lo) => hi._3 <= lo._3 })
    // partition invariance
    val v7 = Bpe.unigramTrainEm(df.repartition(7), "text", nBigrams = 8,
      nTrigrams = 4, nWords = 4, keepTop = 6, iterations = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v.sortBy(_._1).toSeq === v7.sortBy(_._1).toSeq)
  }

  test("unigramTrainEm: loss-prune drops a high-count piece count-rank keeps") {
    // the r15 verdict-5 discriminating corpus: 'abc' (f=100) is the
    // SECOND-most-counted non-char piece in the best paths, but its
    // words re-segment cheaply as [ab, c] because 'ab' (f=1000) is
    // cheap — loss(abc) = 100·cost(ab) ≈ 146k. 'qz' (f=50) has only
    // the expensive all-chars fallback — loss(qz) = 50·cost(qz) ≈
    // 228k. With keepTop = 2 count-rank keeps {ab, abc}; the
    // likelihood-drop prune must keep {ab, qz}.
    val text = (Seq.fill(1000)("ab") ++ Seq.fill(100)("abc") ++
      Seq.fill(50)("qz")).mkString(" ")
    val df = Seq((0L, text)).toDF("doc_id", "text")
    val v = Bpe.unigramTrainEm(df, "text", keepTop = 2, iterations = 1)
      .collect().map(r => r.getString(0)).toSet
    val nonChar = v.filter(_.length >= 2)
    assert(nonChar == Set("ab", "qz"),
      s"loss-prune should keep {ab, qz}, got $nonChar")
  }
}
