package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.FrameOps

/** Edge semantics for the round-2 frame operators (q77–q79, q24b, q25b,
  * q33b, q66) that the sf0.01 fixture may not hit: leading/trailing
  * nulls under ffill/bfill, mode ties, bin boundaries, factorize code
  * stability, set-op dedup.
  */
class FrameOpsSpec extends SparkSpec {
  import spark.implicits._

  test("ffill leaves leading nulls; bfill leaves trailing nulls") {
    val df = Seq(
      (1, 1, None: Option[Double]), (1, 2, Some(10.0)), (1, 3, None),
      (1, 4, Some(20.0)), (1, 5, None)
    ).toDF("g", "i", "v")
    val wf = Window.partitionBy($"g").orderBy($"i")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wb = Window.partitionBy($"g").orderBy($"i")
      .rowsBetween(0, Window.unboundedFollowing)
    val out = df.select($"i",
        last($"v", ignoreNulls = true).over(wf).as("ff"),
        first($"v", ignoreNulls = true).over(wb).as("bf"))
      .orderBy($"i")
      .collect().map(r => (r.getInt(0), Option(r.get(1)), Option(r.get(2))))
    assert(out.toSeq == Seq(
      (1, None, Some(10.0)), (2, Some(10.0), Some(10.0)), (3, Some(10.0), Some(20.0)),
      (4, Some(20.0), Some(20.0)), (5, Some(20.0), None)))
  }

  test("mode tiebreak picks the smallest value among max-count ties") {
    val df = Seq(("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c"))
      .toDF("grp", "v")
    val counts = df.groupBy($"grp", $"v").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"grp").orderBy($"cnt".desc, $"v".asc)
    val m = counts.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"v").as[String].collect()
    assert(m.toSeq == Seq("a")) // a and b both count 2; min wins
  }

  test("fixed-width binning maps boundary values to the upper bin") {
    val df = Seq(0.0, 9999.99, 10000.0, 19999.0, 20000.0).toDF("x")
    val bins = df.select(floor($"x" / 10000).cast("int").as("bin"))
      .as[Int].collect()
    assert(bins.toSeq == Seq(0, 0, 1, 1, 2))
  }

  test("factorize codes are dense, zero-based, and order-stable") {
    val df = Seq("m", "z", "a", "m", "z").toDF("v")
    val codes = df.select($"v").distinct()
      .withColumn("code", row_number().over(Window.orderBy($"v")) - 1)
    val got = df.join(broadcast(codes), "v").select($"v", $"code")
      .distinct().orderBy($"code").as[(String, Int)].collect()
    assert(got.toSeq == Seq(("a", 0), ("m", 1), ("z", 2)))
  }

  test("array set ops dedup and ignore element order") {
    val df = Seq((Seq("b", "a", "b"), Seq("a", "c"))).toDF("x", "y")
    val r = df.select(
        array_join(array_sort(array_intersect($"x", $"y")), ",").as("i"),
        array_join(array_sort(array_union($"x", $"y")), ",").as("u"),
        array_join(array_sort(array_except($"x", $"y")), ",").as("d"))
      .as[(String, String, String)].head()
    assert(r == (("a", "a,b,c", "b")))
  }

  test("spread is a no-op on small inputs, fans out on large under-partitioned ones") {
    val docs = Tables.documents(spark, sfTiny)
    assert(Tables.spread(docs, "doc_id").rdd.getNumPartitions ==
      docs.rdd.getNumPartitions) // too small: passthrough, no shuffle
    // fan-out only applies when the runner has more cores than scan
    // splits; on a single-core runner spread is (correctly) a
    // passthrough and the expectation below would be vacuous (ADVICE r2)
    val cores = spark.sparkContext.defaultParallelism
    assume(cores > docs.rdd.getNumPartitions)
    assert(Tables.spread(docs, "doc_id", minBytesPerCore = 1)
      .rdd.getNumPartitions == cores)
  }

  test("events read adapts to the fixture's ts encoding; legacy conf never leaks") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    spark.conf.unset(key) // back to the registered default ("false")
    val ev = Tables.events(spark, sfTiny) // sets + restores the conf internally
    assert(spark.conf.get(key) == "false", "events() leaked the legacy ns conf")
    // whatever the physical encoding (ns-as-long or native µs), the
    // loader normalizes to µs TimestampType — the type every query and
    // oracle is gated against
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(ev.count() > 0) // the returned frame survives the restore
    // if the fixture is ns-encoded, a raw unscoped read must still fail
    // loudly (proves the conf genuinely was restored, not left enabled)
    val rawType = Tables.withNanosAsLong(spark) {
      spark.read.parquet(s"$sfTiny/events.parquet").schema("ts").dataType
    }
    if (rawType == org.apache.spark.sql.types.LongType) {
      intercept[Exception] {
        spark.read.parquet(s"$sfTiny/events.parquet").collect()
      }
    }
    before.foreach(v => spark.conf.set(key, v))
  }

  test("unsigned parquet ints widen to the next signed type (SURVEY §1.3 policy)") {
    // fixture written with parquet UINT_8/16/32/64 logical types; the
    // reference stores unsigned columns natively, Spark has no unsigned
    // types — the documented policy is widen-to-next-signed (u64 lands
    // in decimal(20,0), the only lossless container)
    val df = spark.read.parquet(getClass.getResource("/unsigned.parquet").getPath)
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("u8") == "smallint" || types("u8") == "int")
    assert(types("u16") == "int")
    assert(types("u32") == "bigint")
    assert(types("u64") == "decimal(20,0)")
    // max values survive the widening unchanged
    val r = df.orderBy($"u16".desc).head
    assert(r.getAs[Number]("u16").intValue == 65535)
    assert(r.getAs[Number]("u32").longValue == 4294967295L)
    assert(r.getAs[java.math.BigDecimal]("u64").toString == "18446744073709551615")
  }

  test("rolling product via exp-sum-log matches direct multiplication") {
    val df = Seq((1, 1.05), (2, 1.10), (3, 1.02), (4, 1.00)).toDF("i", "f")
    val w = Window.orderBy($"i").rowsBetween(-2, 0)
    val got = df.select(round(exp(sum(log($"f")).over(w)), 6).as("p"))
      .orderBy($"i").as[Double].collect()
    assert(got.toSeq == Seq(1.05, 1.155, 1.1781, 1.122))
  }

  test("resample surfaces empty buckets with null aggs (pandas parity)") {
    import java.sql.Timestamp
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 00:10:00"), 10.0),
      (Timestamp.valueOf("2024-01-01 00:40:00"), 20.0),
      // 01:00 hour empty
      (Timestamp.valueOf("2024-01-01 02:05:00"), 30.0)
    ).toDF("ts", "v")
    val r = graft.ops.FrameOps.resample(df, "ts", "hour", "1 hour",
        Seq(count(lit(1)).as("n"), avg($"v").as("m")))
      .orderBy($"bucket").collect()
    assert(r.length == 3)
    assert(r(1).isNullAt(r(1).fieldIndex("n")) || r(1).getAs[Long]("n") == 0L
      || r(1).get(r(1).fieldIndex("n")) == null)
    assert(r(1).isNullAt(r(1).fieldIndex("m")))
    assert(r(0).getAs[Long]("n") == 2 && r(0).getAs[Double]("m") == 15.0)
    assert(r(2).getAs[Double]("m") == 30.0)
  }

  test("urlParts decomposes scheme/host/port/path/query/domain") {
    val df = Seq(
      "https://docs.example.com:8443/kb/how-to?q=1#x",
      "http://bad-site.org/").toDF("url")
    val r = df.select(graft.ops.TextAnalysis.urlParts($"url").as("p"))
      .select($"p.scheme", $"p.host", $"p.port", $"p.path", $"p.query",
        $"p.tld", $"p.domain", $"p.path_depth")
      .orderBy($"p.scheme")
      .collect()
    assert(r(1).toSeq == Seq("https", "docs.example.com", "8443",
      "/kb/how-to", "q=1", "com", "example.com", 2))
    assert(r(0).toSeq == Seq("http", "bad-site.org", "", "/", "", "org",
      "bad-site.org", 0))
  }

  test("interpolate matches the pandas linear golden example") {
    // pd.Series([1, None, None, 7, None]).interpolate() -> [1, 3, 5, 7, 7]
    // and a leading null stays null
    val df = Seq((1L, 1, Some(1.0)), (1L, 2, None), (1L, 3, None),
      (1L, 4, Some(7.0)), (1L, 5, None),
      (2L, 1, None), (2L, 2, Some(2.0)))
      .toDF("g", "p", "v")
    val r = graft.ops.FrameOps.interpolate(df, Seq("g"), Seq("p"), "v", "vi")
      .orderBy("g", "p").collect()
      .map(x => (x.getLong(0), x.getInt(1)) -> Option(x.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(r((1L, 1)) == Some(1.0) && r((1L, 2)) == Some(3.0) &&
      r((1L, 3)) == Some(5.0) && r((1L, 4)) == Some(7.0))
    assert(r((1L, 5)) == Some(7.0)) // trailing: forward-filled
    assert(r((2L, 1)).isEmpty)      // leading: stays null
    assert(r((2L, 2)) == Some(2.0))
  }

  test("interpolate limit/limit_direction match the pandas goldens") {
    // s = pd.Series([nan,nan,1,nan,nan,nan,5,nan,nan]); goldens from
    // s.interpolate(method='linear', limit=..., limit_direction=...)
    val df = Seq[(Long, Int, Option[Double])](
      (1L, 1, None), (1L, 2, None), (1L, 3, Some(1.0)), (1L, 4, None),
      (1L, 5, None), (1L, 6, None), (1L, 7, Some(5.0)), (1L, 8, None),
      (1L, 9, None)).toDF("g", "p", "v")
    def run(ld: String, lim: Int): Seq[Option[Double]] =
      graft.ops.FrameOps.interpolate(df, Seq("g"), Seq("p"), "v", "vi",
          limit = lim, limitDirection = ld)
        .orderBy("p").collect()
        .map(x => Option(x.get(3)).map(_.asInstanceOf[Double])).toSeq
    def g(xs: Double*): Seq[Option[Double]] =
      xs.map(x => if (x.isNaN) None else Some(x))
    val n = Double.NaN
    assert(run("forward", 0) == g(n, n, 1, 2, 3, 4, 5, 5, 5))
    assert(run("forward", 1) == g(n, n, 1, 2, n, n, 5, 5, n))
    assert(run("backward", 0) == g(1, 1, 1, 2, 3, 4, 5, n, n))
    assert(run("backward", 1) == g(n, 1, 1, n, n, 4, 5, n, n))
    assert(run("both", 0) == g(1, 1, 1, 2, 3, 4, 5, 5, 5))
    assert(run("both", 1) == g(n, 1, 1, 2, n, 4, 5, 5, n))
  }

  test("interpolate limit_area matches the pandas goldens") {
    // s = pd.Series([nan,nan,1,nan,nan,nan,5,nan,nan]); goldens from
    // s.interpolate('linear', limit_direction='both', limit_area=...)
    val df = Seq[(Long, Int, Option[Double])](
      (1L, 1, None), (1L, 2, None), (1L, 3, Some(1.0)), (1L, 4, None),
      (1L, 5, None), (1L, 6, None), (1L, 7, Some(5.0)), (1L, 8, None),
      (1L, 9, None)).toDF("g", "p", "v")
    def run(area: String): Seq[Option[Double]] =
      graft.ops.FrameOps.interpolate(df, Seq("g"), Seq("p"), "v", "vi",
          limitDirection = "both", limitArea = area)
        .orderBy("p").collect()
        .map(x => Option(x.get(3)).map(_.asInstanceOf[Double])).toSeq
    def g(xs: Double*): Seq[Option[Double]] =
      xs.map(x => if (x.isNaN) None else Some(x))
    val n = Double.NaN
    assert(run("inside") == g(n, n, 1, 2, 3, 4, 5, n, n))
    assert(run("outside") == g(1, 1, 1, n, n, n, 5, 5, 5))
    assert(run("none") == g(1, 1, 1, 2, 3, 4, 5, 5, 5))
  }

  test("interpolate method='values' anchors on the order column") {
    // pd.Series([1,nan,nan,10], index=[0,1,5,10]).interpolate('values')
    //   -> [1.0, 1.9, 5.5, 10.0]  (position method gives [1,4,7,10])
    val df = Seq[(Long, Double, Option[Double])]((1L, 0.0, Some(1.0)),
      (1L, 1.0, None), (1L, 5.0, None), (1L, 10.0, Some(10.0)))
      .toDF("g", "t", "v")
    val byVal = graft.ops.FrameOps.interpolate(df, Seq("g"), Seq("t"),
        "v", "vi", method = "values")
      .orderBy("t").collect().map(_.getDouble(3)).toSeq
    assert(byVal == Seq(1.0, 1.9, 5.5, 10.0))
    val byPos = graft.ops.FrameOps.interpolate(df, Seq("g"), Seq("t"),
        "v", "vi")
      .orderBy("t").collect().map(_.getDouble(3)).toSeq
    assert(byPos == Seq(1.0, 4.0, 7.0, 10.0))
  }

  test("ewm ignore_na matches pandas for both modes over null gaps") {
    // s = pd.Series([1, nan, 3, nan, nan, 5]); ewm(alpha=0.5).mean():
    //   ignore_na=False -> [1, 1, 2.6, 2.6, 2.6, 4.675675675675675]
    //   ignore_na=True  -> [1, 1, 2.333..., 2.333..., 2.333..., 3.857142857142857]
    // ewm(alpha=0.5).var() ignore_na=False -> [nan, nan, 2, 2, 2, 3.170731707317073]
    val df = Seq[(Long, Long, Option[Double])]((1L, 1L, Some(1.0)),
      (1L, 2L, None), (1L, 3L, Some(3.0)), (1L, 4L, None), (1L, 5L, None),
      (1L, 6L, Some(5.0))).toDF("g", "p", "v")
    def means(ig: Boolean): Seq[Double] =
      graft.ops.FrameOps.ewmMean(df, Seq("g"), "p", "v", alpha = 0.5,
          as = "e", ignoreNa = ig)
        .orderBy("p").collect().map(_.getDouble(2)).toSeq
    val mF = means(false)
    assert(mF.take(5) == Seq(1.0, 1.0, 2.6, 2.6, 2.6) &&
      math.abs(mF(5) - 4.675675675675675) < 1e-12, mF)
    val mT = means(true)
    assert(math.abs(mT(2) - 2.3333333333333335) < 1e-12 &&
      math.abs(mT(5) - 3.857142857142857) < 1e-12, mT)
    val vF = graft.ops.FrameOps.ewmVar(df, Seq("g"), "p", "v", alpha = 0.5,
        varAs = "ev", stdAs = "es")
      .orderBy("p").collect()
      .map(x => Option(x.get(2)).map(_.asInstanceOf[Double])).toSeq
    assert(vF(0).isEmpty && vF(1).isEmpty, vF)
    assert(math.abs(vF(2).get - 2.0) < 1e-12 &&
      math.abs(vF(4).get - 2.0) < 1e-12 &&
      math.abs(vF(5).get - 3.170731707317073) < 1e-12, vF)
  }

  test("searchSorted matches the brute-force strict-less count, duplicates included") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      // small value domain forces duplicate elements AND probe==element
      // collisions — the side='left' tie case
      val elems = Seq.fill(1 + rnd.nextInt(30))(rnd.nextInt(10).toDouble)
      val probes = Seq.fill(1 + rnd.nextInt(15))(rnd.nextInt(12).toDouble)
      val eDf = elems.toDF("ev")
      val pDf = probes.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "pv")
      val got = graft.ops.FrameOps.searchSorted(eDf, "ev", pDf, "pv", "id", "idx")
        .orderBy("id").as[(Long, Double, Long)].collect()
      probes.zipWithIndex.foreach { case (v, i) =>
        val want = elems.count(_ < v)
        assert(got(i)._3 == want, s"trial=$trial probe=$v: ${got(i)._3} vs $want")
      }
    }
  }

  test("searchSortedLarge equals searchSorted across forced partition splits") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 4) {
      val elems = Seq.fill(20 + rnd.nextInt(40))(rnd.nextInt(15).toDouble)
      val probes = Seq.fill(10 + rnd.nextInt(20))(rnd.nextInt(18).toDouble)
      val eDf = elems.toDF("ev")
      val pDf = probes.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "pv")
      val small = graft.ops.FrameOps.searchSorted(eDf, "ev", pDf, "pv", "id", "idx")
        .orderBy("id").as[(Long, Double, Long)].collect().toSeq
      // 5 partitions over a 15-wide value domain: offsets are non-zero
      // for most probes, so the distributed-prefix arithmetic is real
      val large = graft.ops.FrameOps.searchSortedLarge(eDf, "ev", pDf, "pv", "id", "idx",
          numParts = 5)
        .orderBy("id").as[(Long, Double, Long)].collect().toSeq
      assert(large == small, s"trial=$trial")
    }
  }

  test("ngroup is dense, zero-based, in multi-key sort order") {
    val df = Seq(("b", 2), ("a", 1), ("b", 1), ("a", 1), ("b", 2)).toDF("k1", "k2")
    val got = graft.ops.FrameOps.ngroup(df, Seq("k1", "k2"), "g")
      .select($"k1", $"k2", $"g").distinct()
      .orderBy($"g").as[(String, Int, Int)].collect().toSeq
    assert(got == Seq(("a", 1, 0), ("b", 1, 1), ("b", 2, 2)))
  }

  test("interpolate options match a sequential reference on random series") {
    // brute-force pandas semantics: for each null, find anchors, apply
    // direction eligibility + row-distance limit, linear/constant fill
    def reference(vs: Seq[Option[Double]], anchors: Seq[Double],
        ld: String, limit: Int): Seq[Option[Double]] =
      vs.indices.map { i =>
        vs(i) match {
          case some @ Some(_) => some
          case None =>
            val li = (i - 1 to 0 by -1).find(vs(_).isDefined)
            val ri = (i + 1 until vs.length).find(vs(_).isDefined)
            val okL = ld != "backward" && li.isDefined &&
              (limit == 0 || i - li.get <= limit)
            val okR = ld != "forward" && ri.isDefined &&
              (limit == 0 || ri.get - i <= limit)
            if (!okL && !okR) None
            else (li, ri) match {
              case (Some(l), Some(r)) =>
                Some(vs(l).get + (vs(r).get - vs(l).get) *
                  ((anchors(i) - anchors(l)) / (anchors(r) - anchors(l))))
              case (Some(l), None) => Some(vs(l).get)
              case (None, Some(r)) => Some(vs(r).get)
              case _ => None
            }
        }
      }
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(12)
      val ps = (1 to n).map(_ * (1 + rnd.nextInt(3)).toLong).scanLeft(0L)(_ + _).tail
      val vs = ps.map(_ => if (rnd.nextDouble() < 0.4) None
        else Some((rnd.nextInt(100) - 50).toDouble))
      val ld = Seq("forward", "backward", "both")(rnd.nextInt(3))
      val limit = rnd.nextInt(3)
      val method = if (rnd.nextBoolean()) "values" else "position"
      val df = ps.zip(vs).map { case (p, v) => (1L, p, v) }.toDF("g", "p", "v")
      val got = graft.ops.FrameOps.interpolate(df, Seq("g"), Seq("p"), "v",
          "vi", method = method, limit = limit, limitDirection = ld)
        .orderBy("p").collect()
        .map(r => Option(r.get(3)).map(_.asInstanceOf[Double])).toSeq
      val anchors = if (method == "values") ps.map(_.toDouble)
        else ps.indices.map(i => (i + 1).toDouble)
      val want = reference(vs, anchors, ld, limit)
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g.isDefined == w.isDefined,
          s"trial=$trial ld=$ld lim=$limit m=$method i=$i: $g vs $w\nvs=$vs")
        g.zip(w).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-9,
            s"trial=$trial ld=$ld lim=$limit m=$method i=$i: $a vs $b") }
      }
    }
  }

  test("ewmMeanSegmented equals ewmMean on random gappy series") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      g <- 1L to 2L
      p <- 1L to 40L
    } yield (g, p, if (rnd.nextDouble() < 0.25) None
      else Some(rnd.nextDouble() * 20 - 10))
    val df = rows.toDF("g", "p", "v")
    for (ig <- Seq(false, true); sl <- Seq(3, 7, 64)) {
      val ref = graft.ops.FrameOps.ewmMean(df, Seq("g"), "p", "v",
          alpha = 0.3, as = "e", ignoreNa = ig)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
      val segd = graft.ops.FrameOps.ewmMeanSegmented(df, Seq("g"), "p", "v",
          alpha = 0.3, as = "e", segLen = sl, ignoreNa = ig)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
      assert(ref.keySet == segd.keySet, s"ig=$ig sl=$sl row sets differ")
      ref.foreach { case (k, rv) =>
        val sv = segd(k)
        assert(rv.isDefined == sv.isDefined, s"ig=$ig sl=$sl $k null mismatch")
        rv.zip(sv).foreach { case (a, b) =>
          assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)),
            s"ig=$ig sl=$sl $k: $a vs $b") }
      }
    }
  }

  test("ewmVarSegmented equals ewmVar on random gappy series") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- 1L to 2L
      p <- 1L to 40L
    } yield (g, p, if (rnd.nextDouble() < 0.25) None
      else Some(rnd.nextDouble() * 20 - 10))
    val df = rows.toDF("g", "p", "v")
    for (ig <- Seq(false, true); sl <- Seq(3, 7, 64)) {
      def toMap(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (Option(r.get(2)).map(_.asInstanceOf[Double]),
            Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
      val ref = toMap(graft.ops.FrameOps.ewmVar(df, Seq("g"), "p", "v",
        alpha = 0.3, varAs = "ev", stdAs = "es", ignoreNa = ig))
      val segd = toMap(graft.ops.FrameOps.ewmVarSegmented(df, Seq("g"), "p",
        "v", alpha = 0.3, varAs = "ev", stdAs = "es", segLen = sl,
        ignoreNa = ig))
      assert(ref.keySet == segd.keySet, s"ig=$ig sl=$sl row sets differ")
      ref.foreach { case (k, (rv, rs)) =>
        val (sv, ss) = segd(k)
        Seq((rv, sv), (rs, ss)).foreach { case (a0, b0) =>
          assert(a0.isDefined == b0.isDefined, s"ig=$ig sl=$sl $k null mismatch")
          a0.zip(b0).foreach { case (a, b) =>
            assert(math.abs(a - b) <= 1e-8 * math.max(1.0, math.abs(a)),
              s"ig=$ig sl=$sl $k: $a vs $b") }
        }
      }
    }
  }

  test("ewmVar/Std match the pandas adjust=True bias=False goldens") {
    // pd.Series([10,20,0]).ewm(alpha=0.2).var() -> [nan, 50, 111.4754...]
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 0.0))
      .toDF("g", "p", "v")
    val r = graft.ops.FrameOps.ewmVar(df, Seq("g"), "p", "v", alpha = 0.2,
        varAs = "ev", stdAs = "es")
      .orderBy("p").collect()
      .map(x => (Option(x.get(2)).map(_.asInstanceOf[Double]),
        Option(x.get(3)).map(_.asInstanceOf[Double]))).toSeq
    assert(r(0) == (None, None)) // first row: debias denominator is 0
    assert(math.abs(r(1)._1.get - 50.0) < 1e-9)
    assert(math.abs(r(1)._2.get - 7.0710678118654755) < 1e-12)
    assert(math.abs(r(2)._1.get - 111.47540983606555) < 1e-9)
    assert(math.abs(r(2)._2.get - 10.558191598757126) < 1e-12)
  }

  test("mergeOrdered interleaves and ffills like pandas merge_ordered") {
    // pd.merge_ordered(l, r, on='k', fill_method='ffill') per group g:
    // disjoint keys interleave; both value columns forward-fill
    val l = Seq((1L, 1L, 10.0), (1L, 3L, 30.0), (2L, 1L, 1.0))
      .toDF("g", "k", "lv")
    val r = Seq((1L, 2L, 5.0), (1L, 4L, 7.0)).toDF("g", "k", "rv")
    val m = graft.ops.FrameOps.mergeOrdered(l, r, on = Seq("k"),
        by = Seq("g"), fillMethod = Some("ffill"))
      .orderBy("g", "k").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        Option(x.get(2)).map(_.asInstanceOf[Double]),
        Option(x.get(3)).map(_.asInstanceOf[Double]))).toSeq
    assert(m == Seq(
      (1L, 1L, Some(10.0), None),
      (1L, 2L, Some(10.0), Some(5.0)),
      (1L, 3L, Some(30.0), Some(5.0)),
      (1L, 4L, Some(30.0), Some(7.0)),
      (2L, 1L, Some(1.0), None)))
    // without fill: plain ordered outer merge, nulls stay
    val plain = graft.ops.FrameOps.mergeOrdered(l, r, on = Seq("k"),
      by = Seq("g")).orderBy("g", "k").collect()
    assert(plain.length == 5 && plain.count(_.isNullAt(2)) == 2)
  }

  test("mergeOrdered left_by replicates right per group, pandas golden") {
    // pd.merge_ordered(l, r, on='k', left_by='g', fill_method='ffill')
    // with r lacking g: r replicated into EVERY left group
    val l = Seq((1L, 1L, 10.0), (1L, 3L, 30.0), (2L, 1L, 1.0))
      .toDF("g", "k", "lv")
    val r = Seq((2L, 5.0), (4L, 7.0)).toDF("k", "rv")
    val m = graft.ops.FrameOps.mergeOrdered(l, r, on = Seq("k"),
        by = Seq("g"), fillMethod = Some("ffill"))
      .orderBy("g", "k").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        Option(x.get(2)).map(_.asInstanceOf[Double]),
        Option(x.get(3)).map(_.asInstanceOf[Double]))).toSeq
    assert(m == Seq(
      (1L, 1L, Some(10.0), None),
      (1L, 2L, Some(10.0), Some(5.0)),
      (1L, 3L, Some(30.0), Some(5.0)),
      (1L, 4L, Some(30.0), Some(7.0)),
      (2L, 1L, Some(1.0), None),
      (2L, 2L, Some(1.0), Some(5.0)),
      (2L, 4L, Some(1.0), Some(7.0))))
  }

  test("mergeOrdered rejects a right frame with a proper subset of by") {
    val l = Seq((1L, 2L, 1L, 10.0)).toDF("g1", "g2", "k", "lv")
    val r = Seq((1L, 2L, 5.0)).toDF("g1", "k", "rv") // has g1, lacks g2
    val e = intercept[IllegalArgumentException] {
      graft.ops.FrameOps.mergeOrdered(l, r, on = Seq("k"), by = Seq("g1", "g2"))
    }
    assert(e.getMessage.contains("ALL of the by columns") &&
      e.getMessage.contains("g2"), e.getMessage)
  }

  test("ewmCov/Corr match the pandas adjust=True bias=False goldens") {
    // x = pd.Series([10,20,0]); y = pd.Series([1,3,2])
    // x.ewm(alpha=0.2).cov(y)  -> [nan, 10.0, 5.0819672131...]
    // x.ewm(alpha=0.2).corr(y) -> [nan, 1.0, 0.5092241434...]
    val df = Seq((1L, 1L, 10.0, 1.0), (1L, 2L, 20.0, 3.0),
      (1L, 3L, 0.0, 2.0)).toDF("g", "p", "x", "y")
    val r = graft.ops.FrameOps.ewmCov(df, Seq("g"), "p", "x", "y",
        alpha = 0.2, covAs = "ec", corrAs = "er")
      .orderBy("p").collect()
      .map(x => (Option(x.get(2)).map(_.asInstanceOf[Double]),
        Option(x.get(3)).map(_.asInstanceOf[Double]))).toSeq
    assert(r(0) == (None, None)) // debias denom 0; zero variance so far
    assert(math.abs(r(1)._1.get - 10.0) < 1e-9)
    assert(math.abs(r(1)._2.get - 1.0) < 1e-9)
    assert(math.abs(r(2)._1.get - 5.081967213114753) < 1e-9)
    assert(math.abs(r(2)._2.get - 0.5092241434559709) < 1e-9)
  }

  test("ewmMeanHalflife matches the pandas times= golden") {
    // pd.Series([10,20,0], times=['01-01','01-02','01-05']).ewm(
    //   halflife='1 day').mean() -> [10, 16.666..., 2.6315789...]
    val df = Seq((1L, 0.0, 11L, 10.0), (1L, 1.0, 12L, 20.0),
      (1L, 4.0, 13L, 0.0)).toDF("g", "t", "k", "v")
    val r = graft.ops.FrameOps.ewmMeanHalflife(df, Seq("g"), "t", "k",
        "v", halflife = 1.0, as = "e")
      .orderBy("k").collect().map(_.getDouble(2)).toSeq
    assert(math.abs(r(0) - 10.0) < 1e-12)
    assert(math.abs(r(1) - 16.666666666666668) < 1e-12)
    assert(math.abs(r(2) - 2.6315789473684212) < 1e-12)
  }

  test("ewmMean matches the pandas adjust=True golden values") {
    // pd.Series([10, 20, 0]).ewm(alpha=0.2).mean()
    //   -> [10.0, 15.5555555..., 9.1803278...]
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 0.0),
      (2L, 1L, 5.0)).toDF("g", "p", "v")
    val r = graft.ops.FrameOps.ewmMean(df, Seq("g"), "p", "v",
        alpha = 0.2, as = "ewm")
      .orderBy("g", "p").collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    assert(math.abs(r((1L, 1L)) - 10.0) < 1e-12)
    assert(math.abs(r((1L, 2L)) - 140.0 / 9) < 1e-12)
    assert(math.abs(r((1L, 3L)) - 22.4 / 2.44) < 1e-12)
    assert(math.abs(r((2L, 1L)) - 5.0) < 1e-12)
  }

  test("corrMatrix: all pairs in one aggregation pass, no self-join") {
    val df = Seq((1.0, 2.0, 10.0), (2.0, 4.0, 9.0), (3.0, 6.0, 8.0),
      (4.0, 8.0, 7.0)).toDF("x", "y", "z")
    val m = graft.ops.FrameOps.corrMatrix(df, Seq("x", "y", "z"))
    val plan = m.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan) // single pass, not a self-join
    val r = m.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getDouble(2), r.getDouble(3))).toMap
    assert(r.size == 6) // upper triangle of 3x3 incl. diagonal
    assert(math.abs(r(("x", "y"))._1 - 1.0) < 1e-12)  // y = 2x
    assert(math.abs(r(("x", "z"))._1 + 1.0) < 1e-12)  // z = 10 - x
    assert(math.abs(r(("x", "x"))._1 - 1.0) < 1e-12)
    // cov(x,y) = 2·var(x); var(x) of 1..4 (sample) = 5/3
    assert(math.abs(r(("x", "y"))._2 - 10.0 / 3) < 1e-9)
  }

  test("outlierFlags: z + IQR flags, zero-variance guard, inliers untouched") {
    import spark.implicits._
    // group a: 30 identical inliers + one spike. Sample-z of a single
    // spike is bounded by (n-1)/sqrt(n), so n=31 comfortably clears 3.
    // group b: constant -> sd = 0 -> z null, nothing flags.
    val rows = (1 to 30).map(i => (i.toLong, "a", 10.0)) ++
      Seq((31L, "a", 1000.0)) ++ (40 to 44).map(i => (i.toLong, "b", 7.0))
    val out = graft.ops.FrameOps.outlierFlags(
      rows.toDF("id", "g", "v"), Seq("g"), "v")
    val flagged = out.filter($"is_z_outlier" || $"is_iqr_outlier")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(flagged == Set(31L))
    val spike = out.filter($"id" === 31L).head
    assert(spike.getAs[Boolean]("is_z_outlier") &&
      spike.getAs[Boolean]("is_iqr_outlier"))
    assert(spike.getAs[Double]("z") > 3.0)
    // IQR fences of group a collapse to [10, 10]; inlier 10s don't flag
    assert(spike.getAs[Double]("iqr_lo") == 10.0 &&
      spike.getAs[Double]("iqr_hi") == 10.0)
    val b = out.filter($"g" === "b")
    assert(b.filter($"z".isNotNull).count() == 0)
    assert(b.filter($"is_z_outlier" || $"is_iqr_outlier").count() == 0)
  }

  test("groupOls: perfect line recovers slope/intercept exactly, R2 = 1") {
    // y = 7x + 3 → slope 7, intercept 3, r2 1; flat series → slope 0,
    // zero y-variance → null r2; singleton → null everything
    val df = Seq(("a", 1, 10L), ("a", 2, 17L), ("a", 3, 24L), ("a", 4, 31L),
      ("b", 1, 5L), ("b", 2, 5L), ("b", 3, 5L),
      ("c", 1, 42L)).toDF("g", "t", "v")
    val r = FrameOps.groupOls(df, Seq("g"), Seq("t"), "v")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), Option(x.get(2)), Option(x.get(3)), Option(x.get(4))))
      .toMap
    assert(r("a") == ((4L, Some(7.0), Some(3.0), Some(1.0))))
    assert(r("b") == ((3L, Some(0.0), Some(5.0), None)))
    assert(r("c") == ((1L, None, None, None)))
  }

  test("cusumChangePoint: vertex lands on the mean shift; flat series ties to 1") {
    // group a: 10,10,10,50,50 — the V-vertex of n·prefix−k·total sits
    // at the last pre-shift point (k=3): dev_3 = 5·30 − 3·130 = −240
    val df = Seq(("a", 1, 10L), ("a", 2, 10L), ("a", 3, 10L),
      ("a", 4, 50L), ("a", 5, 50L),
      ("b", 1, 7L), ("b", 2, 7L), ("b", 3, 7L)).toDF("g", "t", "v")
    val r = FrameOps.cusumChangePoint(df, Seq("g"), "t", "v")
      .collect().map(x => x.getString(0) ->
        (x.getInt(1), x.getInt(2), x.getLong(3), x.getLong(4))).toMap
    assert(r("a") == ((3, 3, -240L, 5L)))
    // flat series: dev identically 0, earliest position wins the tie
    assert(r("b") == ((1, 1, 0L, 3L)))
  }

  test("scd2Intervals: runs collapse, intervals chain, last is open") {
    // key 1: A A B A → intervals A[1,3) B[3,4) A[4,null); key 2: C → open
    val df = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "A"),
      (2L, 1L, "C")
    ).toDF("k", "seq", "v").repartition(3)
    val out = FrameOps.scd2Intervals(df, "k", Seq("seq"), Seq("v"))
    assert(out.columns.toSeq == Seq("k", "v", "valid_from", "valid_to"))
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(rows == Set(
      (1L, "A", 1L, 3L), (1L, "B", 3L, 4L), (1L, "A", 4L, -1L),
      (2L, "C", 1L, -1L)))
  }

  test("scd2Intervals: null attribute values are states, not wildcards") {
    val df = Seq(
      (1L, 1L, Some("A")), (1L, 2L, None), (1L, 3L, None), (1L, 4L, Some("A"))
    ).toDF("k", "seq", "v")
    val out = FrameOps.scd2Intervals(df, "k", Seq("seq"), Seq("v"))
      .collect().map(r => (Option(r.getString(1)).getOrElse("∅"),
        r.getLong(2))).toSet
    // A[1) → null[2) → A[4): the null run collapses to ONE interval
    assert(out == Set(("A", 1L), ("∅", 2L), ("A", 4L)))
  }

  test("scd2Intervals: multi-attribute change detection + tiebreaker order") {
    // same ts, tiebreaker id orders them; change on EITHER attribute
    val df = Seq(
      (1L, 10L, 1L, "A", 1), (1L, 10L, 2L, "A", 2), (1L, 11L, 3L, "B", 2)
    ).toDF("k", "ts", "id", "a1", "a2")
    val out = FrameOps.scd2Intervals(df, "k", Seq("ts", "id"), Seq("a1", "a2"))
      .collect().map(r => (r.getString(1), r.getInt(2), r.getLong(3))).toSet
    assert(out == Set(("A", 1, 10L), ("A", 2, 10L), ("B", 2, 11L)))
  }

  test("outlierFlagsMad: hand-checked robust z; catches what contamination hides from z-score") {
    import spark.implicits._
    // group g: values 1..9 plus a 1000 spike. median = 5.5, deviations
    // {0.5,...,4.5, 994.5} -> MAD = 2.5 (med of sorted devs); robust_z
    // of the spike = 994.5/(1.4826*2.5) = 268.3... -> flagged.
    // Classic z-score on the same group: sd ~ 313, z(1000) ~ 3.0 --
    // BELOW the 3.0 threshold (the spike inflates its own sd).
    val rows = ((1 to 9).map(i => (i.toLong, "g", i.toDouble)) :+
      ((10L, "g", 1000.0))).toDF("id", "k", "v")
    val mad = graft.ops.FrameOps.outlierFlagsMad(rows, Seq("k"), "v")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("med"), r.getAs[Double]("mad"),
          Option(r.getAs[Any]("robust_z")),
          r.getAs[Boolean]("is_mad_outlier")))).toMap
    assert(mad(10L)._1 == 5.5 && mad(10L)._2 == 2.5)
    assert(mad(10L)._3.get.asInstanceOf[Double] ==
      math.rint(994.5 / (1.4826 * 2.5) * 1e6) / 1e6)
    assert(mad(10L)._4 && !mad(1L)._4)
    val z = graft.ops.FrameOps.outlierFlags(rows, Seq("k"), "v")
      .filter(col("id") === 10L).head
    assert(!z.getAs[Boolean]("is_z_outlier")) // the negative control
    // zero-MAD group (constant majority) never flags on robust_z
    val const = Seq((1L, "c", 5.0), (2L, "c", 5.0), (3L, "c", 5.0),
      (4L, "c", 9.0)).toDF("id", "k", "v")
    val cm = graft.ops.FrameOps.outlierFlagsMad(const, Seq("k"), "v")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Boolean]("is_mad_outlier")).toMap
    assert(cm.values.forall(_ == false))
  }

  test("trailingDistinct: window membership, cross-day dedup, observed-days-only") {
    val df = Seq(
      // user 10 on day 1 and day 2 — one window sees both, counts once
      ("2024-01-01 10:00:00", 10L), ("2024-01-02 09:00:00", 10L),
      ("2024-01-02 11:00:00", 20L),
      // day 5 (gap: days 3-4 absent — must NOT appear in output)
      ("2024-01-05 08:00:00", 30L)
    ).toDF("ts", "k").select(col("ts").cast("timestamp").as("ts"), col("k"))
    val out = FrameOps.trailingDistinct(df, "ts", "k", windowDays = 3,
        as = "n")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    // day1: {10}; day2: {10 (both days, once), 20}; day5: {30} + day2's
    // contributions end at day4 (absent); days 3,4 not observed → absent
    assert(out == Map("2024-01-01" -> 1L, "2024-01-02" -> 2L,
      "2024-01-05" -> 1L))
    // window of 1 day degenerates to per-day distinct
    val out1 = FrameOps.trailingDistinct(df, "ts", "k", 1, "n")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(out1 == Map("2024-01-01" -> 1L, "2024-01-02" -> 2L,
      "2024-01-05" -> 1L))
    // null keys and null timestamps are dropped, not counted
    val withNulls = Seq(("2024-01-01 10:00:00", Some(10L)),
        ("2024-01-01 11:00:00", None), (null, Some(99L)))
      .toDF("ts", "k").select(col("ts").cast("timestamp").as("ts"), col("k"))
    assert(FrameOps.trailingDistinct(withNulls, "ts", "k", 2, "n")
      .collect().map(r => r.getLong(1)).toSeq == Seq(1L))
    intercept[IllegalArgumentException] {
      FrameOps.trailingDistinct(df, "ts", "k", 0, "n")
    }
  }

  test("snapshotAt: version prefix semantics — each historical state reconstructs") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "attr")
    val log = Seq(
      (2L, 1L, "U", "b1"),   // v1: update 2
      (3L, 2L, "U", "c2"),   // v2: insert 3
      (2L, 3L, "D", "x")     // v3: delete 2
    ).toDF("k", "version", "op", "attr")
    def at(v: Long) = FrameOps.snapshotAt(snap, log, "k", v)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(at(0L) == Set((1L, "a"), (2L, "b")))   // before any change
    assert(at(1L) == Set((1L, "a"), (2L, "b1")))
    assert(at(2L) == Set((1L, "a"), (2L, "b1"), (3L, "c2")))
    assert(at(3L) == Set((1L, "a"), (3L, "c2")))
    // as-of the max version ≡ applyChangeSet over the full log
    assert(at(99L) == FrameOps.applyChangeSet(snap, log, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("applyChangeSet: LWW within the changeset, insert, replace, delete, pass-through") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "attr")
    val changes = Seq(
      (2L, 1L, "U", "b-stale"),  // loses to v2
      (2L, 2L, "U", "b-new"),    // replace
      (3L, 1L, "U", "c-revived"),// loses to the v2 delete
      (3L, 2L, "D", "x"),        // delete wins
      (4L, 1L, "U", "d-new")     // insert
    ).toDF("k", "version", "op", "attr")
    val out = FrameOps.applyChangeSet(snap, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "b-new"), (4L, "d-new")))
    // missing attr column in the changeset fails fast
    val bad = Seq((1L, 1L, "U")).toDF("k", "version", "op")
    val err = intercept[IllegalArgumentException] {
      FrameOps.applyChangeSet(snap, bad, "k")
    }
    assert(err.getMessage.contains("attr"))
  }

  test("applyChangeSet rejects malformed ops instead of silently deleting") {
    // a winning change row whose op is outside {'U','D'} (an 'I', a
    // typo, a null) must fail the job loudly — before the fix it was
    // anti-joined out of the snapshot like a delete
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "attr")
    for (badOp <- Seq("I", "X", null)) {
      val bad = Seq((2L, 1L, badOp, "z")).toDF("k", "version", "op", "attr")
      val ex = intercept[Exception] {
        FrameOps.applyChangeSet(snap, bad, "k").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("op must be 'U' or 'D'")),
        s"op=$badOp raised the wrong error: ${ex.getMessage}")
    }
    // case-insensitivity still holds for the valid domain
    val lower = Seq((2L, 1L, "u", "b2"), (1L, 1L, "d", "x"))
      .toDF("k", "version", "op", "attr")
    assert(FrameOps.applyChangeSet(snap, lower, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((2L, "b2")))
    // a LOSING malformed row is also rejected (fail-fast beats
    // silently trusting LWW to bury garbage) — rn filter runs first,
    // so only assert the valid path here: the winner is 'U' v2
    val mixed = Seq((2L, 2L, "U", "b3"), (2L, 1L, "U", "b-stale"))
      .toDF("k", "version", "op", "attr")
    assert(FrameOps.applyChangeSet(snap, mixed, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b3")))
  }

  test("applyChangeSet: delete-everything and empty-changeset edges") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "attr")
    val delAll = Seq((1L, 1L, "D", "x"), (2L, 1L, "D", "x"))
      .toDF("k", "version", "op", "attr")
    assert(FrameOps.applyChangeSet(snap, delAll, "k").count() == 0L)
    val none = Seq.empty[(Long, Long, String, String)]
      .toDF("k", "version", "op", "attr")
    assert(FrameOps.applyChangeSet(snap, none, "k")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("trimmedMeanBy: hand-checked bounds, trim counts, spike resistance") {
    import spark.implicits._
    // group g: 1..10 plus a 1e6 spike; p05/p95 over the 11 values trim
    // the spike (and nothing low) — the trimmed mean ignores it while
    // the plain mean is dragged 5 orders of magnitude
    val df = ((1 to 10).map(i => ("g", i.toDouble)) :+ ("g", 1000000.0))
      .toDF("k", "v")
    val r = graft.ops.FrameOps.trimmedMeanBy(df, Seq("k"), "v",
      0.05, 0.95).head
    assert(r.getLong(1) == 11L)                       // n
    assert(r.getLong(3) == 1L)                        // spike trimmed hi
    assert(r.getDouble(6) < 11.0, r.toString)         // mean unpolluted
    // no trimming at [0, 1]: plain mean
    val all = graft.ops.FrameOps.trimmedMeanBy(
      Seq(("g", 2.0), ("g", 4.0)).toDF("k", "v"), Seq("k"), "v",
      0.0, 1.0).head
    assert(all.getDouble(6) == 3.0 && all.getLong(2) == 0L)
  }

  test("cohortRetention: hand-built two-cohort matrix") {
    import spark.implicits._
    def t(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")
    // epoch weeks: users 1,2 first active week W; user 1 returns W+1;
    // user 3 first active W+1
    val ev = Seq(
      (1L, t("2024-01-01")), (2L, t("2024-01-02")),
      (1L, t("2024-01-10")), (3L, t("2024-01-10")))
      .toDF("user_id", "ts")
    val r = graft.ops.FrameOps.cohortRetention(ev, "user_id", "ts")
      .collect().map(x => ((x.getLong(0), x.getLong(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    val w0 = r.keys.map(_._1).min
    assert(r((w0, 0L)) == ((2L, 2L, 10000L)))   // cohort of 2, week 0
    assert(r((w0, 1L)) == ((1L, 2L, 5000L)))    // 50% retained
    assert(r((w0 + 1, 0L)) == ((1L, 1L, 10000L)))
    assert(r.size == 3)
  }

  test("emitChangeSet round-trips: applyChangeSet(old, emit(old, new)) == new") {
    import spark.implicits._
    val old0 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, null.asInstanceOf[String], 40.0)).toDF("k", "s", "p")
    // 1 unchanged, 2 attr-changed, 3 deleted, 4 null->value change,
    // 5 inserted
    val new0 = Seq((1L, "a", 10.0), (2L, "B", 20.0),
      (4L, "x", 40.0), (5L, "e", 50.0)).toDF("k", "s", "p")
    val cs = graft.ops.FrameOps.emitChangeSet(old0, new0, "k", version = 3L)
    val ops = cs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops == Map(2L -> "U", 3L -> "D", 4L -> "U", 5L -> "U"), ops)
    // the minimal feed: unchanged key 1 emits nothing
    assert(cs.count() == 4L)
    val replayed = graft.ops.FrameOps.applyChangeSet(old0, cs, "k")
      .orderBy("k").collect().map(_.toSeq).toSeq
    val want = new0.orderBy("k").collect().map(_.toSeq).toSeq
    assert(replayed == want, s"replayed=$replayed want=$want")
  }

  test("fdCheck: held dependency scores 0, violations counted by rows") {
    import spark.implicits._
    val holds = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("a", "b")
    val r1 = graft.ops.FrameOps.fdCheck(holds, "a", "b").head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(4)) == ((2L, 0L, 0L)))
    // key 1 maps to two values (incl. a NULL, null-safely distinct):
    // 3 of 4 rows sit in violating keys -> 7500 bp
    val viol = Seq((1L, "x"), (1L, "x"), (1L, null.asInstanceOf[String]),
      (2L, "y")).toDF("a", "b")
    val r2 = graft.ops.FrameOps.fdCheck(viol, "a", "b").head
    assert((r2.getLong(1), r2.getLong(3), r2.getLong(4)) ==
      ((1L, 3L, 7500L)), r2.toString)
  }

  test("seasonalNaiveBacktest: hand-checked errors; a missing day must not mis-align (join, not lag)") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // series k: days 1..3 = 10.00; day 8 = 13.00, day 9 = 11.50,
    // day 10 MISSING, day 11 = 20.00 (its season anchor day 4 is also
    // missing -> not scored; a lag-based alignment would wrongly pair
    // day 11 with day 3)
    val df = Seq(
      (1, 10.0), (2, 10.0), (3, 10.0),
      (8, 13.0), (9, 11.5), (11, 20.0)
    ).map { case (d, v) => ("k", ts(d), v) }.toDF("key", "ts", "v")
    val r = graft.ops.FrameOps.seasonalNaiveBacktest(
      df, "key", "ts", "v", season = 7).head
    // scored: day 8 vs 1 (err +300 cents), day 9 vs 2 (err +150)
    assert(r.getLong(1) == 2L, r.toString)               // n_scored
    assert(r.getLong(2) == 450L, r.toString)             // sum_err
    assert(r.getLong(3) == 450L, r.toString)             // sum_abs_err
    assert(r.getLong(4) == 2450L, r.toString)            // sum_abs_actual
    assert(r.getLong(5) == (1000L * 450L) / 2L, r.toString)  // mae_milli
    assert(r.getLong(6) == (1000000L * 450L) / 2450L, r.toString) // wape
  }

  test("mergeAggSnapshot: merge of disjoint snapshots equals the full-rescan snapshot") {
    import spark.implicits._
    val a = Seq(("x", 1.00), ("x", 3.00), ("y", 10.00))
      .toDF("k", "v")
    val b = Seq(("x", 2.00), ("z", -5.00)).toDF("k", "v")
    val keys = Seq("k")
    val merged = graft.ops.FrameOps.mergeAggSnapshot(
        graft.ops.FrameOps.aggSnapshot(a, keys, "v"),
        graft.ops.FrameOps.aggSnapshot(b, keys, "v"), keys)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).longValueExact, r.getLong(3), r.getLong(4)))
    val direct = graft.ops.FrameOps.aggSnapshot(a.union(b), keys, "v")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).longValueExact, r.getLong(3), r.getLong(4)))
    // one-side-only keys (y, z) pass through; overlapping key x folds
    assert(merged.toSeq == direct.toSeq, merged.mkString(","))
    // empty delta: merge is an identity on the state
    val empty = graft.ops.FrameOps.aggSnapshot(
      a.filter(col("v") > 1e9), keys, "v")
    val idm = graft.ops.FrameOps.mergeAggSnapshot(
        graft.ops.FrameOps.aggSnapshot(a, keys, "v"), empty, keys)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).longValueExact, r.getLong(3), r.getLong(4)))
    val aOnly = graft.ops.FrameOps.aggSnapshot(a, keys, "v")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).longValueExact, r.getLong(3), r.getLong(4)))
    assert(idm.toSeq == aOnly.toSeq)
  }

  test("robustZscoreByHist: bucket-edge center/scale, below-resolution NULL") {
    import spark.implicits._
    // $100 buckets over [0, 1000): A cents [5000,25000,45000,85000] ->
    // buckets 0,2,4,8; (n+1)//2 = 2 -> center bucket 2 -> 20000c.
    // |dev| [15000,5000,25000,65000] -> buckets 1,0,2,6 -> cume hits 2
    // at bucket 1 -> scale 10000 -> z == dev (scale equals the 1e4 bp
    // multiplier, so the floor is the identity)
    val df = Seq(("A", 1L, 50.00), ("A", 2L, 250.00), ("A", 3L, 450.00),
      ("A", 4L, 850.00),
      ("B", 5L, 150.00), ("B", 6L, 150.00), ("B", 7L, 150.00))
      .toDF("seg", "id", "v")
    val out = graft.ops.FrameOps.robustZscoreByHist(df, "seg", "id", "v",
        loCents = 0L, hiCents = 100000L, nBins = 10)
      .orderBy("id").collect()
      .map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, -15000L, -15000L), (2L, 5000L, 5000L), (3L, 25000L, 25000L),
      (4L, 65000L, 65000L),
      // B: constant column -> |dev| all inside bucket 0 -> scale 0 ->
      // below-resolution NULL (the exact tier is the answer there)
      (5L, 5000L, null), (6L, 5000L, null), (7L, 5000L, null)),
      out.mkString(","))
  }

  test("robustZscoreBy: per-group median/MAD, spike scored not absorbed, zero-MAD NULL") {
    import spark.implicits._
    // group A: cents [100,200,300,400,10000] -> med 300 (rank 2),
    // |dev| sorted [0,100,100,200,9700] -> MAD 100 (rank 2): the spike
    // moves NEITHER (that's the point) and scores z = 970000
    val df = Seq(("A", 1L, 1.00), ("A", 2L, 2.00), ("A", 3L, 3.00),
      ("A", 4L, 4.00), ("A", 5L, 100.00),
      ("B", 6L, 5.00), ("B", 7L, 5.00), ("B", 8L, 5.00))
      .toDF("seg", "id", "v")
    val out = graft.ops.FrameOps.robustZscoreBy(df, "seg", "id", "v")
      .orderBy("id").collect()
      .map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, -200L, -20000L), (2L, -100L, -10000L), (3L, 0L, 0L),
      (4L, 100L, 10000L), (5L, 9700L, 970000L),
      // constant group: MAD 0 -> NULL z, never a fake scale
      (6L, 0L, null), (7L, 0L, null), (8L, 0L, null)),
      out.mkString(","))
  }
}
