package graft

import org.apache.spark.sql.functions._
import graft.plans.AsofMergeJoin

/** The physical as-of merge operator: plans as AsofMergeJoinExec, and
  * its one-pass merge matches both the Dataset-level asofJoin and a
  * brute-force reference — including tolerance, unmatched rows, and
  * keys spread across many partitions.
  */
class AsofMergeSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    (1L, "A", 10L), (2L, "A", 25L), (3L, "A", 30L),
    (4L, "B", 5L), (5L, "B", 50L), (6L, "C", 7L))
    .toDF("trade_id", "sym", "sec")
    .withColumn("ts", timestamp_seconds($"sec")).drop("sec")

  private def quotes = Seq(
    ("A", 8L, 100.0), ("A", 25L, 105.0), ("A", 29L, 110.0),
    ("B", 49L, 50.0), ("D", 1L, 1.0))
    .toDF("sym", "qsec", "px")
    .withColumn("ts", timestamp_seconds($"qsec")).drop("qsec")

  test("plans as AsofMergeJoinExec and matches the Dataset-level asofJoin") {
    val exec = AsofMergeJoin.asofBackward(trades, quotes, "ts", "ts",
      by = Seq("sym"), rightCols = Seq("px"))
    assert(exec.queryExecution.executedPlan.toString.contains("AsofMergeJoin"))
    val got = exec.select($"trade_id", $"px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(
      1L -> Some(100.0), 2L -> Some(105.0), 3L -> Some(110.0),
      4L -> None, 5L -> Some(50.0), 6L -> None))
    val dsl = graft.ops.AsofJoin.asofJoin(trades, quotes, "ts", "ts",
        by = Seq("sym"), rightCols = Seq("px"))
      .select($"trade_id", $"px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == dsl)
  }

  test("tolerance bounds the backward match") {
    val got = AsofMergeJoin.asofBackward(trades, quotes, "ts", "ts",
        by = Seq("sym"), rightCols = Seq("px"), toleranceSec = Some(2))
      .select($"trade_id", $"px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // trade 1 (t=10) last quote at 8 -> within 2s; trade 3 (t=30) quote
    // at 29 within; trade 2 (t=25) quote at 25 (distance 0) within;
    // trade 5 (t=50) quote at 49 within
    assert(got == Map(
      1L -> Some(100.0), 2L -> Some(105.0), 3L -> Some(110.0),
      4L -> None, 5L -> Some(50.0), 6L -> None))
    val tight = AsofMergeJoin.asofBackward(trades, quotes, "ts", "ts",
        by = Seq("sym"), rightCols = Seq("px"), toleranceSec = Some(0))
      .select($"trade_id", $"px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(tight(2L) == Some(105.0) && tight(1L) == None && tight(3L) == None)
  }

  test("forward and nearest directions match the Dataset-level asofJoin") {
    for (d <- Seq("forward", "nearest")) {
      val exec = AsofMergeJoin.asofMerge(trades, quotes, "ts", "ts",
          by = Seq("sym"), rightCols = Seq("px"), direction = d)
        .select($"trade_id", $"px").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      val dsl = graft.ops.AsofJoin.asofJoin(trades, quotes, "ts", "ts",
          by = Seq("sym"), rightCols = Seq("px"), direction = d)
        .select($"trade_id", $"px").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(exec == dsl, s"direction=$d exec=$exec dsl=$dsl")
    }
    // forward is inclusive at distance 0: trade 2 (t=25) has a quote at
    // exactly 25
    val fwd = AsofMergeJoin.asofMerge(trades, quotes, "ts", "ts",
        by = Seq("sym"), rightCols = Seq("px"), direction = "forward")
      .select($"trade_id", $"px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fwd(2L) == Some(105.0) && fwd(1L) == Some(105.0) && fwd(5L) == None)
  }

  test("declared requirements plan one exchange+sort per side, never stacked") {
    // a malformed requiredChildDistribution/Ordering would make
    // EnsureRequirements stack a SECOND exchange/sort on top of inputs
    // that already satisfy it (4 apiece below) — exactly the SMJ prep,
    // once per side, is the contract that lets bucketed layouts elide it
    def counts(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val p = df.queryExecution.executedPlan.toString
      ("Exchange hashpartitioning".r.findAllIn(p).length,
        "\\bSort \\[".r.findAllIn(p).length)
    }
    val plain = AsofMergeJoin.asofBackward(trades, quotes, "ts", "ts",
      by = Seq("sym"), rightCols = Seq("px"))
    assert(counts(plain) == ((2, 2)), plain.queryExecution.executedPlan.toString)
    val prepared = AsofMergeJoin.asofBackward(
      trades.repartition(4, $"sym").sortWithinPartitions($"sym", $"ts"),
      // the right side's required ordering includes the payload
      // tiebreak (sym, ts, px) — a bucketed layout must sort by it too
      // for the sort to elide
      quotes.repartition(4, $"sym").sortWithinPartitions($"sym", $"ts", $"px"),
      "ts", "ts", by = Seq("sym"), rightCols = Seq("px"))
    assert(counts(prepared) == ((2, 2)), prepared.queryExecution.executedPlan.toString)
    assert(prepared.count() == 6)
  }

  test("matches brute force on many keys across partitions") {
    val n = 500
    val lhs = spark.range(n).select(($"id").as("trade_id"),
        pmod($"id", lit(37)).cast("string").as("sym"),
        timestamp_seconds(pmod($"id" * 97, lit(10000))).as("ts"))
      .repartition(7)
    val rhs = spark.range(n * 2).select(
        pmod($"id", lit(41)).cast("string").as("sym"),
        timestamp_seconds(pmod($"id" * 31, lit(10000))).as("ts"),
        ($"id" * 2).cast("double").as("px"))
      .repartition(5)
    val got = AsofMergeJoin.asofBackward(lhs, rhs, "ts", "ts",
        by = Seq("sym"), rightCols = Seq("px"))
      .select($"trade_id", $"px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val l = lhs.select($"trade_id", $"sym", unix_micros($"ts").as("t"))
      .as[(Long, String, Long)].collect()
    val r = rhs.select($"sym", unix_micros($"ts").as("t"), $"px")
      .as[(String, Long, Double)].collect()
    val want = l.map { case (id, sym, t) =>
      val cands = r.filter(q => q._1 == sym && q._2 <= t)
      // brute-force tie rule mirrors the exec's payload tiebreak:
      // backward keeps the max (ts, px) tuple among candidates
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(q => (q._2, q._3))._3))
    }.toMap
    assert(got == want)
  }

  test("duplicate (by, on) right rows resolve deterministically") {
    // three quotes at the SAME (sym, ts): without the payload tiebreak
    // in requiredChildOrdering the winner would be whatever tie order
    // the shuffle sort produced; with it, backward always folds to the
    // max payload and forward peeks the min among strictly-later ties
    val dupQuotes = Seq(
      ("A", 10L, 101.0), ("A", 10L, 99.0), ("A", 10L, 105.0),
      ("A", 20L, 50.0), ("A", 20L, 60.0),
      ("B", 5L, 1.0), ("B", 5L, 2.0))
      .toDF("sym", "qsec", "px")
      .withColumn("ts", timestamp_seconds($"qsec")).drop("qsec")
    val lhs = Seq((1L, "A", 15L), (2L, "A", 25L), (3L, "B", 5L))
      .toDF("trade_id", "sym", "sec")
      .withColumn("ts", timestamp_seconds($"sec")).drop("sec")
    for (i <- 1 to 3) { // vary input partitioning: answer must not
      val got = AsofMergeJoin.asofBackward(
          lhs.repartition(i * 2), dupQuotes.repartition(8 - i),
          "ts", "ts", by = Seq("sym"), rightCols = Seq("px"))
        .select($"trade_id", $"px").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == Map(1L -> 105.0, 2L -> 60.0, 3L -> 2.0), s"round $i")
    }
    val fwd = AsofMergeJoin.asofMerge(
        Seq((1L, "A", 5L)).toDF("trade_id", "sym", "sec")
          .withColumn("ts", timestamp_seconds($"sec")).drop("sec"),
        dupQuotes, "ts", "ts", by = Seq("sym"), rightCols = Seq("px"),
        direction = "forward")
      .select($"px").collect().head.getDouble(0)
    assert(fwd == 99.0)
  }
}
