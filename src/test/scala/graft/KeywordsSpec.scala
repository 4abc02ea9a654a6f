package graft

import org.apache.spark.sql.functions._
import graft.ops.Keywords

/** Specs for the Aho–Corasick multi-keyword tagger. The pinned
  * semantics are replace-count: per keyword, non-overlapping
  * leftmost-first occurrences — checked hand-computed, then as a
  * property against a driver-side replace-fold on random strings over
  * a tiny alphabet (the worst case for overlap handling).
  */
class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: DuckDB/ANSI REPLACE-count. */
  private def replaceCount(s: String, kw: String): Long =
    (s.length - s.replace(kw, "").length).toLong / kw.length

  test("tagKeywords: hand-checked counts incl. phrase and mid-word hit") {
    val df = Seq(
      (1L, "spark merge spark"),
      (2L, "the part of art"),
      (3L, "a a a a"), // "a a" non-overlapping -> 2, not 3
      (4L, "nothing here")
    ).toDF("id", "text")
    val r = Keywords.tagKeywords(df, "id", "text",
        Seq("spark", "merge", "a a", "art"))
      .collect().map(x => ((x.getLong(0), x.getString(1)), x.getLong(2))).toMap
    assert(r == Map(
      (1L, "spark") -> 2L, (1L, "merge") -> 1L,
      (2L, "art") -> 2L, // "part" and "art"
      (3L, "a a") -> 2L))
  }

  test("tagKeywords matches replace-count on random tiny-alphabet strings") {
    val rnd = new scala.util.Random(42)
    val kws = Seq("ab", "aba", "ba", "aa", "b a")
    val docs = (0L until 60L).map { i =>
      (i, Seq.fill(rnd.nextInt(40) + 5)("ab a".charAt(rnd.nextInt(4))).mkString)
    }
    val got = Keywords.tagKeywords(docs.toDF("id", "text"), "id", "text", kws)
      .collect().map(x => ((x.getLong(0), x.getString(1)), x.getLong(2))).toMap
    val want = (for {
      (i, s) <- docs
      kw <- kws
      c = replaceCount(s, kw)
      if c > 0
    } yield ((i, kw), c)).toMap
    assert(got == want)
  }

  test("keywordSummary rolls up distinct keywords and total hits") {
    val df = Seq((1L, "x y x y z"), (2L, "z")).toDF("id", "text")
    val r = Keywords.keywordSummary(df, "id", "text", Seq("x", "y", "q"))
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(1L -> ((2L, 4L))))
  }

  test("misuse fails fast: empty, duplicate, oversized lists") {
    val df = Seq((1L, "x")).toDF("id", "text")
    assertThrows[IllegalArgumentException] {
      Keywords.tagKeywords(df, "id", "text", Seq.empty)
    }
    assertThrows[IllegalArgumentException] {
      Keywords.tagKeywords(df, "id", "text", Seq("a", "a"))
    }
    assertThrows[IllegalArgumentException] {
      Keywords.tagKeywords(df, "id", "text", Seq(""))
    }
  }

  test("tagKeywords plan is scan-only: no joins, no aggregate exchanges") {
    val df = Seq((1L, "spark")).toDF("id", "text")
    val plan = Keywords.tagKeywords(df, "id", "text", Seq("spark", "merge"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
