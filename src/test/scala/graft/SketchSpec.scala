package graft

import org.apache.spark.sql.functions._

/** Count-Min Sketch properties (ops/Sketches.scala): the one-sided
  * error guarantee, shard mergeability, and the plan shape (broadcast
  * estimate join, bounded sketch cardinality).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = Tables.events(spark, sfTiny)

  test("cms never undercounts and is exact when width >> keys") {
    val sketch = graft.ops.Sketches.cmsBuild(ev, "user_id", 4, 64)
    val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("exact"))
    val probes = ev.select($"user_id").distinct
    val both = graft.ops.Sketches
      .cmsEstimate(sketch, probes, "user_id", 4, 64)
      .join(exact, "user_id").collect()
    assert(both.nonEmpty)
    assert(both.forall(r => r.getLong(1) >= r.getLong(2)),
      "CMS undercounted a key")
    // wide sketch: collisions vanish, estimates collapse to exact
    val wide = graft.ops.Sketches.cmsBuild(ev, "user_id", 4, 1 << 16)
    val w = graft.ops.Sketches
      .cmsEstimate(wide, probes, "user_id", 4, 1 << 16)
      .join(exact, "user_id").collect()
    assert(w.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("sketch cardinality is bounded by depth*width and merge = whole") {
    val whole = graft.ops.Sketches.cmsBuild(ev, "user_id", 3, 32)
    assert(whole.count() <= 3 * 32)
    val shards = Seq(
      ev.filter($"event_id" % 2 === 0), ev.filter($"event_id" % 2 === 1))
      .map(s => graft.ops.Sketches.cmsBuild(s, "user_id", 3, 32))
    val merged = graft.ops.Sketches.cmsMerge(shards)
    assert(merged.unionByName(whole).groupBy($"j", $"bucket", $"cnt")
      .count().filter($"count" =!= 2).count() == 0,
      "merged shard sketch differs from whole-corpus sketch")
  }

  test("histQuantile: shard-merge ≡ whole build; bucket-width error bound") {
    import graft.ops.Sketches
    val rnd = new scala.util.Random(5)
    val vals = Seq.fill(4000)(rnd.nextDouble() * 1000.0)
    val df = vals.toDF("x").repartition(8)
    val (lo, hi, nb) = (0.0, 1000.0, 50)
    val whole = Sketches.histBuild(df, "x", lo, hi, nb)
    // merge of 4 disjoint shard histograms equals the whole build
    val shards = (0 until 4).map(i =>
      Sketches.histBuild(
        vals.zipWithIndex.filter(_._2 % 4 == i).map(_._1).toDF("x"),
        "x", lo, hi, nb))
    val merged = Sketches.histMerge(shards)
    assert(whole.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      merged.collect().map(r => (r.getLong(0), r.getLong(1))).toMap)
    // every estimate within one bucket width of the true quantile
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val est = Sketches.histQuantile(whole, lo, hi, nb, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    val sorted = vals.sorted
    val width = (hi - lo) / nb
    qs.foreach { q =>
      val truth = sorted(math.ceil(q * vals.size).toInt - 1)
      assert(math.abs(est(q) - truth) <= width,
        s"q=$q est=${est(q)} truth=$truth width=$width")
    }
    // q = 1 lands in the last occupied bucket and never exceeds hi
    val top = Sketches.histQuantile(whole, lo, hi, nb, Seq(1.0)).head
    assert(top.getDouble(2) <= hi)
  }

  test("histQuantileBy: per-group estimates match per-group scalar runs") {
    import graft.ops.Sketches
    val rnd = new scala.util.Random(9)
    val rows = Seq.tabulate(2000)(i =>
      (if (i % 3 == 0) "a" else "b", rnd.nextDouble() * 100.0))
    val df = rows.toDF("g", "x").repartition(6)
    val (lo, hi, nb) = (0.0, 100.0, 20)
    val grouped = Sketches.histQuantileBy(
        Sketches.histBuildBy(df, "g", "x", lo, hi, nb), lo, hi, nb,
        Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3))
      .toMap
    for (g <- Seq("a", "b")) {
      val solo = Sketches.histQuantile(
          Sketches.histBuild(df.filter($"g" === g), "x", lo, hi, nb),
          lo, hi, nb, Seq(0.5, 0.9))
        .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
      for (q <- Seq(0.5, 0.9))
        assert(grouped((g, q)) == solo(q), s"g=$g q=$q")
    }
  }

  test("histBuild clamps out-of-range values into the edge buckets") {
    import graft.ops.Sketches
    val df = Seq(-5.0, 0.5, 9.5, 42.0).toDF("x")
    val h = Sketches.histBuild(df, "x", 0.0, 10.0, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(h == Map(0L -> 2L, 9L -> 2L)) // -5 clamps low, 42 clamps high
  }

  test("weighted (turnstile) build sums weights; weight=1 ≡ unweighted") {
    val wev = ev.withColumn("w", lit(1L))
    val unweighted = graft.ops.Sketches.cmsBuild(ev, "user_id", 3, 32)
    val weighted1 = graft.ops.Sketches.cmsBuild(wev, "user_id", 3, 32, Some("w"))
    assert(weighted1.unionByName(unweighted).groupBy($"j", $"bucket", $"cnt")
      .count().filter($"count" =!= 2).count() == 0,
      "weight=1 turnstile sketch differs from the unweighted build")
    // weight=3 per row must triple every cell
    val w3 = graft.ops.Sketches.cmsBuild(
      ev.withColumn("w", lit(3L)), "user_id", 3, 32, Some("w"))
    assert(w3.join(unweighted.withColumnRenamed("cnt", "c1"), Seq("j", "bucket"))
      .filter($"cnt" =!= $"c1" * 3).count() == 0,
      "weight=3 turnstile sketch is not 3x the unweighted cells")
  }

  test("absent keys estimate 0 on a sparse sketch; estimate join broadcasts") {
    val sketch = graft.ops.Sketches.cmsBuild(
      ev.filter($"user_id" < 10), "user_id", 4, 1 << 16)
    val absent = Seq(999999999L).toDF("user_id")
    val est = graft.ops.Sketches.cmsEstimate(sketch, absent, "user_id", 4, 1 << 16)
    assert(est.collect().map(_.getLong(1)).toSeq == Seq(0L))
    val plan = est.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"estimate join should broadcast the sketch:\n$plan")
  }
}
