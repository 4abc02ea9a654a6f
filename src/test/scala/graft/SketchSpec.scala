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

  test("histBucketExpr computes the step in DOUBLE, not rounded DECIMAL") {
    // regression (r10, caught by q151d): Spark parses a bare `15.0`
    // literal as DECIMAL and ROUNDS the decimal division 15.0/256 to
    // 0.058594 (the exact double step is 0.05859375), flipping
    // boundary values into the neighboring bucket vs DuckDB. The value
    // -3.3984 sits exactly in that flip zone: correct bucket 198,
    // decimal-step bucket 197.
    val out = graft.ops.Sketches.histBuild(
        Seq(-3.3984).toDF("x"), "x", -15.0, 0.0, 256)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((198L, 1L)), s"got ${out.toSeq}")
  }

  // --- KMV distinct / overlap ---------------------------------------

  private def strDf(ss: Seq[String]) = ss.toDF("s")

  test("kmv: exact below k, bounded relative error above k") {
    import graft.ops.Sketches
    // 40 distinct values, k = 64 → sketch IS the value set, estimate exact
    val small = strDf((1 to 40).map(i => s"doc-$i"))
    val sk = Sketches.kmvSketch(small, col("s"), 64)
    assert(sk.count() == 40)
    val est = Sketches.kmvDistinct(sk, 64).head
    assert(est.getLong(0) == 40 && est.getLong(1) == 40)
    // 5000 distinct values, k = 256 → standard KMV error ~ 1/sqrt(k)
    // (6.2%); assert a generous 20% band (deterministic hash → this is
    // a fixed number, the band guards against regressions not noise)
    val big = strDf((1 to 5000).map(i => s"document body number $i"))
    val est2 = Sketches.kmvDistinct(
      Sketches.kmvSketch(big, col("s"), 256), 256).head.getLong(1)
    assert(math.abs(est2 - 5000.0) / 5000.0 < 0.2, s"est=$est2")
  }

  test("kmv sketches merge: union sketch == sketch of union") {
    import graft.ops.Sketches
    val a = strDf((1 to 900).map(i => s"shard-a-$i"))
    val b = strDf((500 to 1400).map(i => s"shard-b-$i"))
    val whole = Sketches.kmvSketch(a.unionByName(b), col("s"), 128)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val mergedFrames = Sketches.kmvSketch(a, col("s"), 128)
      .select(col("h")).unionByName(
        Sketches.kmvSketch(b, col("s"), 128).select(col("h")))
      .distinct().orderBy(col("h")).limit(128)
    val rk = org.apache.spark.sql.expressions.Window.orderBy(col("h"))
    val merged = mergedFrames
      .withColumn("rk", row_number().over(rk))
      .select(col("rk"), col("h"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(whole == merged)
  }

  test("kmv overlap: identical → 10000 bp, disjoint → 0, partial in between") {
    import graft.ops.Sketches
    val xs = strDf((1 to 800).map(i => s"x-$i"))
    val ys = strDf((1 to 800).map(i => s"y-$i"))
    val skX = Sketches.kmvSketch(xs, col("s"), 128)
    val skY = Sketches.kmvSketch(ys, col("s"), 128)
    assert(Sketches.kmvOverlap(skX, skX, 128).head.getLong(1) == 10000L)
    assert(Sketches.kmvOverlap(skX, skY, 128).head.getLong(1) == 0L)
    // A = 1..800, B = 401..1200: true J = 400/1200 = 3333 bp; with
    // k = 128 the deterministic estimate must land within ~2.5x the
    // 1/sqrt(k) band (fixed hash → fixed value; band guards regressions)
    val zs = strDf((401 to 1200).map(i => s"x-$i"))
    val j = Sketches.kmvOverlap(skX,
      Sketches.kmvSketch(zs, col("s"), 128), 128).head.getLong(1)
    assert(j > 1000 && j < 5800, s"jaccard_bp=$j")
  }

  test("kmvSetAlgebra: below-k sketches are EXACT set algebra; differences clamp at zero") {
    import graft.ops.Sketches
    // |A| = 30, |B| = 30, |A ∩ B| = 10 (values 21..30), all below
    // k = 128 -> every sketch is its full set and every estimate is
    // the exact cardinality
    val a = Sketches.kmvSketch(strDf((1 to 30).map(i => s"v-$i")),
      col("s"), 128)
    val b = Sketches.kmvSketch(strDf((21 to 50).map(i => s"v-$i")),
      col("s"), 128)
    val r = Sketches.kmvSetAlgebra(a, b, 128).head()
    // (k_used, est_a, est_b, est_union, est_intersect, a_only, b_only,
    //  jaccard_bp)
    assert(r.getLong(0) == 50L && r.getLong(1) == 30L &&
      r.getLong(2) == 30L && r.getLong(3) == 50L, r.toString)
    assert(r.getLong(4) == 10L && r.getLong(5) == 20L &&
      r.getLong(6) == 20L && r.getLong(7) == 2000L, r.toString)
    // A ⊂ B: a_only clamps to exactly 0, never negative
    val sub = Sketches.kmvSetAlgebra(
      Sketches.kmvSketch(strDf((1 to 10).map(i => s"v-$i")), col("s"), 128),
      Sketches.kmvSketch(strDf((1 to 40).map(i => s"v-$i")), col("s"), 128),
      128).head()
    assert(sub.getLong(5) == 0L && sub.getLong(6) == 30L, sub.toString)
  }

  test("kmvOverlapMatrix: pairwise estimates agree with the pairwise op") {
    import graft.ops.Sketches
    // three slices with planted overlaps: A∩B = 300, B∩C = 300, A∩C = ∅
    val a = (1 to 900).map(i => ("A", s"t-$i"))
    val b = (601 to 1500).map(i => ("B", s"t-$i"))
    val c = (1201 to 2100).map(i => ("C", s"t-$i"))
    val all = (a ++ b ++ c).toDF("grp", "s")
    val sk = Sketches.kmvSketchBy(all, "grp", col("s"), 64)
    val m = Sketches.kmvOverlapMatrix(sk, 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(m.size == 3)
    // the matrix must equal the pairwise kmvOverlap on the same sketches
    def one(x: String, y: String) = Sketches.kmvOverlap(
      sk.filter(col("grp") === x).select(col("rk"), col("h")),
      sk.filter(col("grp") === y).select(col("rk"), col("h")), 64)
      .head match { case r => (r.getLong(0), r.getLong(1)) }
    assert(m(("A", "B")) == one("A", "B"))
    assert(m(("B", "C")) == one("B", "C"))
    assert(m(("A", "C")) == one("A", "C"))
    // disjoint pair estimates zero; overlapping pairs land in band
    // (true J = 300/1500 = 2000 bp)
    assert(m(("A", "C"))._2 == 0L)
    assert(m(("A", "B"))._2 > 600 && m(("A", "B"))._2 < 4000,
      s"J(A,B)=${m(("A", "B"))._2}")
  }

  test("kmv overlap: empty sketches yield the zero row, not a division error") {
    import graft.ops.Sketches
    val empty = Sketches.kmvSketch(strDf(Nil), col("s"), 16)
    val r = Sketches.kmvOverlap(empty, empty, 16).head
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L &&
      r.getLong(2) == 0L && r.getLong(3) == 0L)
    // one empty side: jaccard 0, union estimate = the other side's
    val some = Sketches.kmvSketch(strDf(Seq("a", "b", "c")), col("s"), 16)
    val r2 = Sketches.kmvOverlap(some, empty, 16).head
    assert(r2.getLong(0) == 3L && r2.getLong(1) == 0L &&
      r2.getLong(2) == 3L && r2.getLong(3) == 0L)
  }

  test("kmv is partition-count invariant and avoids a global-sort plan") {
    import graft.ops.Sketches
    val data = (1 to 3000).map(i => s"p-$i")
    val one = Sketches.kmvSketch(strDf(data).repartition(1), col("s"), 64)
      .collect().map(_.getLong(1)).toSeq
    val many = Sketches.kmvSketch(strDf(data).repartition(17), col("s"), 64)
      .collect().map(_.getLong(1)).toSeq
    assert(one == many)
    // the top-k must plan as TakeOrderedAndProject (per-partition
    // heaps + k-row merge), not a global Sort + Limit
    val plan = strDf(data).select(
        graft.expressions.TextHashes.poly_hash(col("s")).as("h"))
      .filter(col("h").isNotNull).distinct()
      .orderBy(col("h")).limit(64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }
  test("heavyHitters: equals brute-force GROUP BY/HAVING under any partitioning") {
    import spark.implicits._
    // skewed multiset: two true heavy hitters over a long distinct tail
    val rows = Seq.fill(400)("the") ++ Seq.fill(150)("of") ++
      (1 to 450).map(i => s"tail$i")
    val k = 5 // threshold N/5 = 200: only "the" qualifies
    def run(parts: Int) = graft.ops.Sketches.heavyHitters(
        rows.toDF("v").repartition(parts), "v", k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val brute = {
      val n = rows.size.toLong
      rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter { case (_, c) => c * k > n }
        .map { case (v, c) => (v, c, n) }.toSet
    }
    assert(run(1) == brute && run(7) == brute && run(32) == brute)
    assert(brute == Set(("the", 400L, 1000L)))
    // lower threshold admits the second hitter exactly
    val k8 = graft.ops.Sketches.heavyHitters(
        rows.toDF("v").repartition(13), "v", 8)
      .collect().map(_.getString(0)).toSet
    assert(k8 == Set("the", "of"))
    // nulls never surface; bad k fails fast
    val withNulls = (rows.map(Option(_)) ++ Seq.fill(300)(None)).toDF("v")
    assert(!graft.ops.Sketches.heavyHitters(withNulls, "v", 3)
      .collect().map(_.getString(0)).contains(null))
    intercept[IllegalArgumentException] {
      graft.ops.Sketches.heavyHitters(rows.toDF("v"), "v", 1)
    }
  }
  test("heavyHittersBy: per-group brute-force equality under any partitioning") {
    import spark.implicits._
    val rows = Seq.fill(60)(("s1", "the")) ++ Seq.fill(10)(("s1", "of")) ++
      (1 to 30).map(i => ("s1", s"t$i")) ++
      Seq.fill(5)(("s2", "le")) ++ (1 to 5).map(i => ("s2", s"u$i"))
    val k = 4
    def run(parts: Int) = graft.ops.Sketches.heavyHittersBy(
        rows.toDF("g", "v").repartition(parts), "g", "v", k)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    val brute = rows.groupBy(_._1).toSeq.flatMap { case (g, gs) =>
      val n = gs.size.toLong
      gs.map(_._2).groupBy(identity).toSeq
        .map { case (v, o) => (g, v, o.size.toLong, n) }
        .filter { case (_, _, c, nn) => c * k > nn }
    }.toSet
    assert(run(1) == brute && run(9) == brute)
    // s1: n=100, threshold 25 -> only "the"(60); s2: n=10, threshold 2.5 -> "le"(5)
    assert(brute == Set(("s1", "the", 60L, 100L), ("s2", "le", 5L, 10L)))
    // group-cardinality guard: pass-1 state is O(groups-per-partition
    // x k), so cardinality above maxGroups must fail fast with the
    // shard-first guidance, BEFORE the sketch pass runs
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Sketches.heavyHittersBy(rows.toDF("g", "v"), "g", "v",
        k, maxGroups = 1)
    }
    assert(ex.getMessage.contains("shard"), ex.getMessage)
  }
}
