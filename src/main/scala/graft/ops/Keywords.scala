package graft.ops

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-keyword tagging: count occurrences of K literal patterns in
  * one pass over each document (Aho–Corasick automaton), instead of K
  * separate scans/regex passes. The workhorse behind blocklist
  * filtering, PII term flagging and topic tagging in corpus pipelines —
  * at 100 TB the difference between 1 and K text scans is the whole
  * cost model.
  *
  * Counting semantics: per keyword, NON-OVERLAPPING leftmost-first
  * occurrences — exactly `(len(s) - len(replace(s, kw, ''))) / len(kw)`,
  * which is what makes the op replayable in any SQL engine with
  * `REPLACE` (the oracle's form). Keywords are matched independently:
  * overlaps BETWEEN different keywords both count.
  *
  * Scale shape: the automaton is driver-built from the (bounded,
  * `require`-guarded) keyword list and broadcast; the scan is a pure
  * map stage — no shuffle, no driver data. Beyond-reference capability
  * (the reference's nvtext has no multi-pattern matcher).
  */
object Keywords {

  /** Compact serializable Aho–Corasick automaton over literal strings. */
  private[ops] final class Automaton(patterns: Array[String]) extends Serializable {
    val patLen: Array[Int] = patterns.map(_.length)
    // trie as per-node char→child maps (built once on the driver; K and
    // total pattern chars are require-bounded by the public entry)
    private val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    private val ends = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var n = 0
      p.foreach { c =>
        n = children(n).getOrElseUpdate(c, {
          children += mutable.Map.empty[Char, Int]
          ends += Nil
          children.size - 1
        })
      }
      ends(n) = pi :: ends(n)
    }
    // BFS fail links; out(n) = pattern ids ending at n or any fail ancestor
    val fail: Array[Int] = new Array[Int](children.size)
    val out: Array[List[Int]] = new Array[List[Int]](children.size)
    locally {
      val queue = mutable.Queue.empty[Int]
      out(0) = ends(0)
      children(0).valuesIterator.foreach { c => fail(c) = 0; out(c) = ends(c); queue += c }
      while (queue.nonEmpty) {
        val n = queue.dequeue()
        children(n).foreach { case (ch, c) =>
          var f = fail(n)
          while (f != 0 && !children(f).contains(ch)) f = fail(f)
          fail(c) = children(f).get(ch).filter(_ != c).getOrElse(0)
          out(c) = ends(c) ++ out(fail(c))
          queue += c
        }
      }
    }
    private val childArr: Array[Map[Char, Int]] = children.map(_.toMap).toArray

    /** Non-overlapping (per pattern, leftmost-first) occurrence counts. */
    def countHits(text: String): Array[Long] = {
      val counts = new Array[Long](patLen.length)
      val nextFree = new Array[Int](patLen.length) // first start pos allowed
      var node = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (node != 0 && !childArr(node).contains(ch)) node = fail(node)
        node = childArr(node).getOrElse(ch, 0)
        var os = out(node)
        while (os.nonEmpty) {
          val p = os.head
          val start = i - patLen(p) + 1
          if (start >= nextFree(p)) {
            counts(p) += 1
            nextFree(p) = i + 1
          }
          os = os.tail
        }
        i += 1
      }
      counts
    }
  }

  /** Tag each document with the keywords it contains: one automaton
    * pass per document, sparse output (id, keyword, n_hits > 0).
    */
  def tagKeywords(df: DataFrame, id: String, text: String,
      keywords: Seq[String]): DataFrame = {
    require(keywords.nonEmpty && keywords.forall(_.nonEmpty),
      "keywords must be a non-empty list of non-empty literals")
    require(keywords.distinct.size == keywords.size,
      "duplicate keywords would double-count — dedup the list")
    require(keywords.size <= 100000 && keywords.map(_.length).sum <= 10000000,
      s"keyword list too large for a broadcast automaton " +
        s"(${keywords.size} patterns); shard the list or use a join-based matcher")
    val spark = df.sparkSession
    val kws = keywords.toArray
    val bc = spark.sparkContext.broadcast(new Automaton(kws))
    val kwNames = spark.sparkContext.broadcast(kws)
    val hitsUdf = udf { (s: String) =>
      if (s == null) Array.empty[(String, Long)]
      else {
        val c = bc.value.countHits(s)
        val names = kwNames.value
        val b = Array.newBuilder[(String, Long)]
        var i = 0
        while (i < c.length) {
          if (c(i) > 0) b += ((names(i), c(i)))
          i += 1
        }
        b.result()
      }
    }
    df.select(col(id), explode(hitsUdf(col(text))).as("kv"))
      .select(col(id), col("kv._1").as("keyword"), col("kv._2").as("n_hits"))
  }

  /** Per-document rollup over [[tagKeywords]]: how many distinct
    * keywords hit and the total hit count — the blocklist-score shape
    * (filter docs where `total_hits` clears a threshold).
    */
  def keywordSummary(df: DataFrame, id: String, text: String,
      keywords: Seq[String]): DataFrame =
    tagKeywords(df, id, text, keywords)
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_keywords"), sum(col("n_hits")).as("total_hits"))
}
