package graft

import graft.ops.Features
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("categorify: frequency-ordered ids, value tie-break, OOV for rare/null/unseen") {
    val df = Seq(
      (1L, "b"), (2L, "b"), (3L, "b"),
      (4L, "a"), (5L, "a"), (6L, "c"),
      (7L, null.asInstanceOf[String])).toDF("id", "v")
    val out = Features.categorify(df, "v", minCount = 2L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    // b (3 occurrences) -> id 1, a (2) -> id 2, c (1, below minCount)
    // and null -> OOV 0
    assert(out.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L),
      (5L, 2L), (6L, 0L), (7L, 0L)), out.mkString(","))
    // equal frequencies tie-break on value ascending
    val tie = Seq((1L, "y"), (2L, "x")).toDF("id", "v")
    val t = Features.categorify(tie, "v").orderBy("id").collect()
      .map(_.getLong(2))
    assert(t.toSeq == Seq(2L, 1L)) // x before y
  }

  test("targetEncode: out-of-fold complement, prior fallback, no self-leakage") {
    // two categories; category A's rows land in different folds, so
    // each row's encoding excludes its own fold's target sum
    val df = Seq(
      (0L, "A", 1.00), // fold h(0)=0
      (1L, "A", 3.00), // fold h(1)
      (2L, "B", 5.00),
      (3L, "B", 7.00)).toDF("id", "cat", "y")
    val out = Features.targetEncode(df, "id", "cat", "y", k = 4, alpha = 2L)
      .orderBy("id").collect()
    val prior = (100L + 300L + 500L + 700L) * 1000000L / 4 // micro-cents
    out.foreach { r =>
      val cat = r.getString(1)
      val fold = r.getAs[Long]("fold")
      val te = r.getAs[Long]("cat_te_micro")
      // reference out-of-fold arithmetic
      val rows = Seq((0L, "A", 100L), (1L, "A", 300L), (2L, "B", 500L),
        (3L, "B", 700L)).map { case (i, c, cents) =>
        // top-bits multiply-shift fold (foldCol's contract)
        (c, Math.floorMod(i * 2654435761L, 4294967296L) * 4L / 4294967296L,
          cents)
      }
      val own = rows.filter(t => t._1 == cat && t._2 == fold)
      val all = rows.filter(_._1 == cat)
      val sOther = all.map(_._3).sum - own.map(_._3).sum
      val nOther = all.size - own.size
      val want = (sOther * 1000000L + 2L * prior) / (nOther + 2L)
      // the exact equality IS the no-self-leakage proof: `want` is
      // computed from the complement only (own fold subtracted)
      assert(te == want, s"row ${r.getLong(0)}: $te != $want")
    }
    // unseen category at encode time: prior fallback — simulate via a
    // category whose complement is empty (single fold holds all rows)
    val lone = Seq((8L, "Z", 2.00)).toDF("id", "cat", "y")
    val lr = Features.targetEncode(lone, "id", "cat", "y", k = 4,
      alpha = 2L).head
    val lonePrior = 200L * 1000000L / 1
    // complement empty: (0 + 2*prior) div (0 + 2) = prior
    assert(lr.getAs[Long]("cat_te_micro") == lonePrior)
  }

  test("standardScale: hand-checked floored-mean z, serve fold held out of the fit") {
    // top-bits folds of ids 0..4: 0->0, 1->2, 2->0, 3->3, 4->1 — so
    // ids 1,3,4 train (cents 100/300/50) and 0,2 serve.
    // m = floor(450/3) = 150; var* = (102500 - 135000 + 67500) div 3
    // = 11666; std = floor(sqrt(11666)) = 108
    val df = Seq((0L, 10.00), (1L, 1.00), (2L, 2.00), (3L, 3.00),
      (4L, 0.50)).toDF("id", "v")
    val out = Features.standardScale(df, "id", "v", k = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 0L, 850L, 78703L),    // floor(8500000/108)
      (1L, 2L, -50L, -4630L),    // floor(-500000/108) — pmod, not trunc
      (2L, 0L, 50L, 4629L),
      (3L, 3L, 150L, 13888L),
      (4L, 1L, -100L, -9260L)), out.mkString(","))
    // leakage-safety proof: perturbing a SERVE row's value moves its
    // own z but not the fit — train rows' z are bit-identical
    val df2 = Seq((0L, 99.00), (1L, 1.00), (2L, 2.00), (3L, 3.00),
      (4L, 0.50)).toDF("id", "v")
    val z2 = Features.standardScale(df2, "id", "v", k = 4)
      .filter(col("fold") =!= 0).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(z2.toSeq == Seq((1L, -4630L), (3L, 13888L), (4L, -9260L)))
    // constant train column: a scaler with no scale answers NULL
    val flat = Seq((1L, 5.00), (2L, 5.00), (3L, 5.00), (0L, 7.00))
      .toDF("id", "v")
    val fz = Features.standardScale(flat, "id", "v", k = 4)
      .select("z_bp").collect()
    assert(fz.forall(_.isNullAt(0)))
  }

  test("isqrt correction is exact on adversarial int64 values") {
    import org.apache.spark.sql.functions._
    // the standardScale isqrt spelling (floor(sqrt(double)) + one-step
    // correction BOTH ways — r15 ADVICE item 2) replayed on values
    // where the double path is most stressed: k²−1 / k² / k²+1 for k
    // brushing the int64 sqrt ceiling, where sqrt(k²−1) rounds UP to k
    // and cast rounding is half-ulp ≈ 1024
    val ks = Seq(3037000499L, 3037000498L, 2147483648L, 4503599627L,
      94906265L /* ~2^26.5, below the exact-double range edge */)
    val vals = ks.flatMap(k => Seq(k * k - 1, k * k, k * k + 1))
      .filter(v => v >= 0)
    def isqrtRef(v: Long): Long = {
      var x = BigInt(v).bigInteger.sqrt().longValueExact()
      x
    }
    val df = vals.toDF("vv")
      .withColumn("s0", floor(sqrt(col("vv").cast("double"))).cast("long"))
      .withColumn("std_c", expr(
        """CASE
          |  WHEN CAST(s0 AS DECIMAL(38,0)) * s0 > vv THEN s0 - 1
          |  WHEN CAST(s0 + 1 AS DECIMAL(38,0)) * (s0 + 1) <= vv THEN s0 + 1
          |  ELSE s0 END""".stripMargin))
    val got = df.collect().map(r => r.getLong(0) -> r.getAs[Long]("std_c")).toMap
    vals.foreach { v =>
      assert(got(v) == isqrtRef(v), s"isqrt($v): got ${got(v)}, want ${isqrtRef(v)}")
    }
  }

  test("robustScale: exact type-1 median/IQR fit on train, signed floor z, zero-IQR NULL") {
    // top-bits folds: ids 1,3,4,6,7 train; 0,2,5 serve.
    // train cents sorted [50,100,300,600,700], n=5: type-1 ranks
    // floor(q*4/4) -> p25=rank1=100, med=rank2=300, p75=rank3=600,
    // iqr=500
    val df = Seq((0L, 10.00), (1L, 1.00), (2L, 2.00), (3L, 3.00),
      (4L, 0.50), (5L, 5.00), (6L, 6.00), (7L, 7.00)).toDF("id", "v")
    val out = Features.robustScale(df, "id", "v", k = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 700L, 14000L), (1L, -200L, -4000L), (2L, -100L, -2000L),
      (3L, 0L, 0L), (4L, -250L, -5000L), (5L, 200L, 4000L),
      (6L, 300L, 6000L), (7L, 400L, 8000L)), out.mkString(","))
    // degenerate IQR (>=50% of train mass on one value): NULL z
    val flat = Seq((0L, 9.00), (1L, 5.00), (2L, 5.00), (3L, 5.00),
      (5L, 5.00), (6L, 5.00), (7L, 5.00)).toDF("id", "v")
    val fz = Features.robustScale(flat, "id", "v", k = 4)
      .select("z_bp").collect()
    assert(fz.forall(_.isNullAt(0)))
  }

  test("cdfTransform: train-only CDF ranks, below-min floors to 0, serve rows scored") {
    val df = Seq((0L, 10.00), (1L, 1.00), (2L, 2.00), (3L, 3.00),
      (4L, 0.50), (5L, 5.00), (6L, 6.00), (7L, 7.00)).toDF("id", "v")
    val out = Features.cdfTransform(df, "id", "v", k = 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // train = ids 1,3,4,6,7 (cents 100,300,50,600,700), n_train=5;
    // cdf_bp = floor(1e4 * |{train <= x}| / 5)
    assert(out.toSeq == Seq(
      (0L, 0L, 10000L), (1L, 2L, 4000L), (2L, 0L, 4000L),
      (3L, 3L, 6000L), (4L, 1L, 2000L), (5L, 0L, 6000L),
      (6L, 2L, 8000L), (7L, 1L, 10000L)), out.mkString(","))
    // duplicates: every duplicate of a train value gets the SAME rank
    // (count of <=, not a tie-broken row rank)
    val dup = Seq((1L, 2.00), (2L, 2.00), (3L, 2.00), (0L, 2.00))
      .toDF("id", "v")
    val dr = Features.cdfTransform(dup, "id", "v", k = 4)
      .select("cdf_bp").collect().map(_.getLong(0))
    assert(dr.forall(_ == 10000L))
  }

  test("cdfTransformBy: ranks against the row's own segment, cross-partition exactness") {
    // folds of ids 0..7: 0,2,0,3,1,0,2,1 -> trainA = {1,3} (cents
    // 100,300), trainB = {4,6,7} (cents 1000,3000,4000): two segments
    // on different scales rank independently
    val df = Seq(("A", 0L, 5.00), ("A", 1L, 1.00), ("A", 2L, 2.00),
      ("A", 3L, 3.00), ("B", 4L, 10.00), ("B", 5L, 20.00),
      ("B", 6L, 30.00), ("B", 7L, 40.00)).toDF("g", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Features.cdfTransformBy(d, "g", "id", "v", k = 4)
        .orderBy("id").collect()
        .map(r => (r.getLong(1), r.getLong(3)))
    val out = run(df)
    assert(out.toSeq == Seq(
      (0L, 10000L), (1L, 5000L), (2L, 5000L), (3L, 10000L),
      (4L, 3333L), (5L, 3333L), (6L, 6666L), (7L, 10000L)),
      out.mkString(","))
    // partitioning invariance: the per-(group, partition) offsets make
    // a group spanning many partitions rank identically
    assert(run(df.repartition(7)).toSeq == out.toSeq)
    // a group whose train slice is empty drops (ids 10,13 both fold 0)
    val lone = df.union(Seq(("C", 10L, 1.0), ("C", 13L, 2.0))
      .toDF("g", "id", "v"))
    assert(run(lone).length == 8)
  }

  test("hashBucketCensus: mass conservation, stable assignment, nulls excluded") {
    val df = Seq("x", "x", "y", "z", "w", null.asInstanceOf[String])
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val census = Features.hashBucketCensus(df, "v", nBuckets = 4)
      .collect()
    assert(census.map(_.getAs[Long]("n_rows")).sum == 5) // null excluded
    assert(census.map(_.getAs[Long]("n_cats")).sum == 4) // x y z w
    census.foreach(r => assert(
      r.getAs[Long]("max_cat_rows") <= r.getAs[Long]("n_rows")))
    // a category lands in exactly one bucket, and the census agrees
    // with the row-level bucketize op
    val rows = Features.hashBucketize(df, "v", nBuckets = 4)
      .filter(col("v").isNotNull)
      .select("v", "v_bucket").distinct().collect()
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    // null category: bucket stays NULL (the embedding null path)
    val nb = Features.hashBucketize(df, "v", nBuckets = 4)
      .filter(col("v").isNull).select("v_bucket").head
    assert(nb.isNullAt(0))
  }
}
