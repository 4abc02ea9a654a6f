package graft

import org.apache.spark.sql.functions._
import graft.ops.ScaleJoins

/** ScaleJoins rewrites must be result-invariant vs the naive plan they
  * replace, and the range rewrite must actually eliminate the
  * nested-loop join it exists to avoid.
  */
class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin equals plain left-semi join") {
    val fact = Tables.lineitem(spark, sfTiny)
    val dim = Tables.orders(spark, sfTiny).filter($"o_totalprice" > 300000)
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum($"l_quantity"), sum($"l_orderkey"))
        .collect()(0).toSeq
    val got = sig(ScaleJoins.bloomSemiJoin(fact, dim,
      "l_orderkey", "o_orderkey", expectedItems = 10000))
    val want = sig(fact.join(dim, $"l_orderkey" === $"o_orderkey", "leftsemi"))
    assert(got == want)
  }

  test("rangeJoinBinned equals naive cross-filter, each pair exactly once") {
    // spans chosen to hit bin boundaries, multi-bin intervals, and a
    // point landing exactly on lo/hi
    val points = Seq((1, 5.0), (2, 10.0), (3, 25.0), (4, 41.0), (5, 100.0))
      .toDF("id", "p")
    val ivs = Seq(("a", 0.0, 10.0), ("b", 8.0, 30.0), ("c", 40.0, 42.0),
      ("d", 25.0, 25.0)).toDF("band", "lo", "hi")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"id", $"band").collect()
        .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    val got = pairs(ScaleJoins.rangeJoinBinned(points, ivs, "p", "lo", "hi", 10.0))
    val want = pairs(points.crossJoin(ivs).filter($"p" >= $"lo" && $"p" <= $"hi"))
    assert(got == want && got.nonEmpty)
    // multiset equality above already proves no duplicate pair emission
    val plan = ScaleJoins.rangeJoinBinned(points, ivs, "p", "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin"), plan)
  }

  test("intervalOverlapJoin equals naive overlap filter, each pair exactly once") {
    val a = Seq(("a1", 0.0, 10.0), ("a2", 5.0, 35.0), ("a3", 40.0, 41.0),
      ("bad", 9.0, 2.0)).toDF("an", "alo", "ahi")
    val b = Seq(("b1", 8.0, 12.0), ("b2", 30.0, 50.0), ("b3", 100.0, 101.0))
      .toDF("bn", "blo", "bhi")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"an", $"bn").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val got = pairs(ScaleJoins.intervalOverlapJoin(a, b,
      "alo", "ahi", "blo", "bhi", binWidth = 10.0))
    // naive excludes the inverted interval explicitly (lo <= hi guard)
    val want = pairs(a.filter($"alo" <= $"ahi").crossJoin(b)
      .filter($"alo" <= $"bhi" && $"blo" <= $"ahi"))
    assert(got == want && got.nonEmpty)
  }

  test("RangeBinJoinRule rewrites the theta join to a binned equi-join") {
    import graft.plans.RangeBinJoin
    val points = Seq((1, 5.0), (2, 10.0), (3, 25.0), (4, 41.0), (5, 100.0))
      .toDF("id", "p")
    val ivs = Seq(("a", 0.0, 10.0), ("b", 8.0, 30.0), ("c", 40.0, 42.0))
      .toDF("band", "lo", "hi")
    val joined = points.join(ivs,
      RangeBinJoin.rangeCond($"p", $"lo", $"hi", binWidth = 10.0))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin"), plan)
    assert(plan.contains("Generate explode"), plan)
    val got = joined.select($"id", $"band").collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    val want = points.crossJoin(ivs).filter($"p" >= $"lo" && $"p" <= $"hi")
      .select($"id", $"band").collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("install() registers the rewrite on a session without the extension") {
    import graft.plans.RangeBinJoin
    val s2 = spark.newSession() // fresh sessionState: no injected rule
    RangeBinJoin.install(s2)
    RangeBinJoin.install(s2) // idempotent
    assert(s2.experimental.extraOptimizations
      .count(_ == graft.plans.RangeBinJoinRule) == 1)
    import s2.implicits._
    val points = Seq((1, 5.0), (2, 25.0)).toDF("id", "p")
    val ivs = Seq(("a", 0.0, 10.0), ("b", 20.0, 30.0)).toDF("band", "lo", "hi")
    val joined = points.join(ivs,
      RangeBinJoin.rangeCond($"p", $"lo", $"hi", binWidth = 10.0))
    assert(!joined.queryExecution.executedPlan.toString.contains("NestedLoopJoin"))
    assert(joined.select($"id", $"band").collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq ==
      Seq((1, "a"), (2, "b")))
  }

  test("RangeBinHint evaluates as the plain range predicate when the rule cannot fire") {
    import graft.plans.RangeBinJoin
    // in a Filter (not a join condition) the rule never matches, so the
    // hint expression itself is executed: nulls → false, bounds inclusive
    val df = Seq((1, 5.0, 0.0, 10.0), (2, 10.0, 0.0, 10.0),
        (3, 11.0, 0.0, 10.0))
      .toDF("id", "p", "lo", "hi")
      .union(Seq((4, 5.0)).toDF("id", "p")
        .withColumn("lo", lit(null).cast("double"))
        .withColumn("hi", lit(10.0)))
    val kept = df.filter(RangeBinJoin.rangeCond($"p", $"lo", $"hi", 10.0))
      .select($"id").collect().map(_.getInt(0)).sorted.toSeq
    assert(kept == Seq(1, 2))
  }

  test("inverted intervals yield zero matches instead of a runtime error") {
    import graft.plans.RangeBinJoin
    val points = Seq((1, 5.0)).toDF("id", "p")
    val ivs = Seq(("ok", 0.0, 10.0), ("bad", 9.0, 2.0)).toDF("band", "lo", "hi")
    val viaHelper = ScaleJoins.rangeJoinBinned(points, ivs, "p", "lo", "hi", 10.0)
      .select($"band").collect().map(_.getString(0)).toSeq
    assert(viaHelper == Seq("ok"))
    val viaRule = points.join(ivs,
        RangeBinJoin.rangeCond($"p", $"lo", $"hi", 10.0))
      .select($"band").collect().map(_.getString(0)).toSeq
    assert(viaRule == Seq("ok"))
  }

  test("sessionize splits on gap and indexes per user") {
    val rows = Seq(
      (1L, "u1", 0L), (2L, "u1", 100L), (3L, "u1", 4000L), (4L, "u1", 4100L),
      (5L, "u2", 50L))
    val df = rows.toDF("event_id", "user_id", "sec")
      .withColumn("ts", timestamp_seconds($"sec"))
    val got = ScaleJoins.sessionize(df, "user_id", "ts", gapSec = 1800)
      .select($"event_id", $"session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionStats aggregates count, span, and value per session") {
    val rows = Seq(
      (1L, "u1", 0L, 1.5), (2L, "u1", 100L, 2.5),
      (3L, "u1", 4000L, 4.0), (5L, "u2", 50L, 9.0))
    val df = rows.toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds($"sec"))
    val got = ScaleJoins.sessionStats(df, "user_id", "ts", 1800, "value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == Map(
      ("u1", 1L) -> ((2L, 100L, 4.0)),
      ("u1", 2L) -> ((1L, 0L, 4.0)),
      ("u2", 1L) -> ((1L, 0L, 9.0))))
  }
  test("funnelSteps: greedy ordering, stalls never advance, full completion") {
    // u1 completes A->B->C in order (greedy picks the EARLIEST valid
    // chain); u2 has A then C but no B -- must stall at depth 1 even
    // though a C exists (the stall regression); u3 has B,C but never A
    // -- absent; u4 has C before A then nothing after -- depth 1
    val rows = Seq(
      ("u1", "A", 10L), ("u1", "B", 20L), ("u1", "C", 15L), ("u1", "C", 30L),
      ("u2", "A", 10L), ("u2", "C", 50L),
      ("u3", "B", 10L), ("u3", "C", 20L),
      ("u4", "C", 5L), ("u4", "A", 10L))
    val df = rows.toDF("user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds($"sec"))
    val got = ScaleJoins.funnelSteps(df, "user_id", "ts", "event_type",
        Seq("A", "B", "C"))
      .select($"user_id", $"depth", $"span_sec").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got == Map(
      "u1" -> ((3, 20L)),  // 10 -> 20 -> 30 (the C at 15 is before B)
      "u2" -> ((1, 0L)),   // stalled: no B, the C at 50 must not count
      "u4" -> ((1, 0L))))  // the C at 5 precedes A
    assert(!got.contains("u3"))
    intercept[IllegalArgumentException] {
      ScaleJoins.funnelSteps(df, "user_id", "ts", "event_type",
        Seq("A", "A", "B"))
    }
  }

  test("sequenceMotifs: hand-checked trigrams, truncated runs dropped, bigram n=2") {
    import spark.implicits._
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:00:$i%02d")
    val ev = Seq(
      (1L, ts(1), 1L, "A"), (1L, ts(2), 2L, "B"), (1L, ts(3), 3L, "C"),
      (1L, ts(4), 4L, "B"), (1L, ts(5), 5L, "C"),
      (2L, ts(1), 6L, "A"), (2L, ts(2), 7L, "B"), (2L, ts(3), 8L, "C"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = graft.ops.ScaleJoins.sequenceMotifs(ev, "user_id", "ts",
        "event_id", "event_type", n = 3)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(r == Set(("A>B>C", 2L, 2L), ("B>C>B", 1L, 1L),
      ("C>B>C", 1L, 1L)), r)
    val r2 = graft.ops.ScaleJoins.sequenceMotifs(ev, "user_id", "ts",
        "event_id", "event_type", n = 2)
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(r2 == Map("A>B" -> 2L, "B>C" -> 3L, "C>B" -> 1L), r2)
    intercept[IllegalArgumentException] {
      graft.ops.ScaleJoins.sequenceMotifs(ev, "user_id", "ts",
        "event_id", "event_type", n = 1)
    }
  }
}
