package graft

import org.apache.spark.sql.functions._
import graft.ops.Validate
import graft.ops.Validate._

/** Specs for the expectation suite: exact violation counts, the
  * ppm-threshold boundary, null-predicate semantics, and the one-scan
  * plan claim.
  */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, 10.0, "A"), (2L, 20.0, "B"), (3L, -5.0, "A"), (4L, 200.0, "C")
  ).toDF("id", "v", "flag")

  test("expect: exact violation counts and strict pass verdicts") {
    val r = Validate.expect(df, Seq(
        notNull("id"), nonNegative("v"), between("v", 0, 100),
        inSet("flag", Seq("A", "B"))))
      .collect()
      .map(x => (x.getString(0), (x.getLong(2), x.getBoolean(4)))).toMap
    assert(r("not_null(id)") == ((0L, true)))
    assert(r("non_negative(v)") == ((1L, false)))   // -5
    assert(r("between(v,0.0,100.0)") == ((2L, false))) // -5, 200
    assert(r("in_set(flag)") == ((1L, false)))      // C
  }

  test("expect: null predicate counts as a violation") {
    val withNull = Seq((Some(1.0)), (None), (Some(-2.0)))
      .toDF("x")
    val r = Validate.expect(withNull, Seq(nonNegative("x"))).head
    assert(r.getAs[Long]("n_violations") == 2L) // null AND -2
  }

  test("expect: ppm threshold boundary is integer-exact") {
    // 1 violation in 4 rows = 250,000 ppm: passes at exactly 250000,
    // fails at 249999
    val ok = Validate.expect(df, Seq(nonNegative("v")), maxViolationPpm = 250000L)
    assert(ok.head.getAs[Boolean]("passed"))
    val notOk = Validate.expect(df, Seq(nonNegative("v")), maxViolationPpm = 249999L)
    assert(!notOk.head.getAs[Boolean]("passed"))
  }

  test("expectUnique flags duplicates with exact counts") {
    val dup = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "s")
    val r = Validate.expectUnique(dup, Seq("k", "s")).head
    assert(r.getAs[Long]("n_rows") == 3L && r.getAs[Long]("n_distinct") == 2L)
    assert(r.getAs[Long]("n_duplicate_rows") == 1L && !r.getAs[Boolean]("passed"))
    assert(Validate.expectUnique(dup.distinct(), Seq("k", "s"))
      .head.getAs[Boolean]("passed"))
  }

  test("suite compiles to ONE aggregation: single scan, no joins") {
    val plan = Validate.expect(df, Seq(notNull("id"), nonNegative("v"),
        between("v", 0, 100), inSet("flag", Seq("A"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // one aggregate over one scan — generate/explode adds no exchange
    assert(plan.split("LocalTableScan|Scan ").length <= 3, plan)
  }

  test("profile: per-column census with nulls, exact vs approx distinct") {
    val p = Seq((Some(1L), "x"), (None, "y"), (Some(1L), "x"), (Some(3L), "z"))
      .toDF("k", "s")
    val r = Validate.profile(p, Seq("k", "s"))
      .collect().map(x => (x.getString(0),
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4), x.getString(5)))).toMap
    assert(r("k") == ((4L, 1L, 2L, "1", "3"))) // nulls excluded from distinct/min/max
    assert(r("s") == ((4L, 0L, 3L, "x", "z")))
    // approx path returns the same schema and sane counts on tiny data
    val a = Validate.profile(p, Seq("k"), exact = false).head
    assert(a.getAs[Long]("n_distinct") >= 1L)
  }

  test("misuse guards: empty suite, duplicate names, bad ppm") {
    assertThrows[IllegalArgumentException] { Validate.expect(df, Seq.empty) }
    assertThrows[IllegalArgumentException] {
      Validate.expect(df, Seq(notNull("id"), notNull("id")))
    }
    assertThrows[IllegalArgumentException] {
      Validate.expect(df, Seq(notNull("id")), maxViolationPpm = -1L)
    }
  }

  test("skewProfile: hand-checked power-of-two buckets, hot key isolated") {
    import spark.implicits._
    // keys: a x1, b x2, c x3, d x4, hot x100
    val rows = Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(4)("d") ++ Seq.fill(100)("hot")
    val got = graft.ops.Validate.skewProfile(
        rows.toDF("k").repartition(5), Seq("k"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // cnt=1 -> bucket 0; cnt=2,3 -> bucket 1; cnt=4 -> 2; cnt=100 -> 6
    assert(got == Map(
      0 -> ((1L, 1L, 1L, 1L)),
      1 -> ((2L, 2L, 5L, 3L)),
      2 -> ((4L, 1L, 4L, 4L)),
      6 -> ((64L, 1L, 100L, 100L))))
  }

  test("fkCheck: orphans, null FKs, and the floor-bp ratio, hand-counted") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(3L), Some(4L), Some(4L), None)
      .toDF("fk")
    val r = Validate.fkCheck(child, parent, "fk", "pk").head
    // 6 children, 1 null FK, 3 orphan rows over 2 keys (3, 4),
    // orphan_bp = 30000 div 6 = 5000
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((6L, 1L, 3L, 2L, 5000L)))
    val keys = Validate.fkOrphanKeys(child, parent, "fk", "pk")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toList
    assert(keys == List((4L, 2L), (3L, 1L))) // count desc, key tiebreak
  }

  test("fkCheck: clean FK reports zero everything") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(1L, 2L, 2L).toDF("fk")
    val r = Validate.fkCheck(child, parent, "fk", "pk").head
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((0L, 0L, 0L)))
  }

  test("psiDrift: identical distributions score ~0; a shift doesn't") {
    val ref = Seq.tabulate(100)(i => (i % 10).toDouble).toDF("v")
    val same = Validate.psiDrift(ref, ref, "v", Seq(3.0, 6.0))
    // p = q in every bucket → every floor-nano term is exactly 0
    assert(same.select(sum(abs(col("psi_nano_term")))).head.getLong(0) == 0L)
    // shove all current mass into the top bucket → big positive PSI
    val cur = Seq.tabulate(100)(_ => 9.0).toDF("v")
    val shifted = Validate.psiDrift(ref, cur, "v", Seq(3.0, 6.0))
    assert(shifted.select(max(col("psi_nano"))).head.getLong(0) > 500000000L)
  }

  test("psiDrift: empty buckets exist via Laplace floor; grid is complete") {
    val ref = Seq(1.0).toDF("v")
    val cur = Seq(100.0).toDF("v")
    val r = Validate.psiDrift(ref, cur, "v", Seq(5.0, 50.0))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.keySet == Set("le_5.0", "le_50.0", "overflow"))
    assert(r("le_5.0") == ((2L, 1L)))   // 1 ref row + 1 floor
    assert(r("le_50.0") == ((1L, 1L)))  // floor only, both sides
    assert(r("overflow") == ((1L, 2L)))
  }

  test("tableDiff: hand-built added/removed/changed census, null-safe") {
    val old = Seq((1L, Some("a"), 10), (2L, Some("b"), 20),
      (3L, None: Option[String], 30)).toDF("k", "s", "v")
    val fresh = Seq((1L, Some("a"), 10),          // unchanged
      (2L, Some("B"), 20),                        // s changed
      (3L, None: Option[String], 31),             // v changed, null s stable
      (4L, Some("d"), 40)).toDF("k", "s", "v")    // added; key 3 stays, none removed? no: old 3 present
    val r = Validate.tableDiff(old, fresh, "k", Seq("s", "v"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("rows_old") == 3 && r("rows_new") == 4)
    assert(r("added") == 1 && r("removed") == 0)
    assert(r("changed") == 2 && r("unchanged") == 1)
    assert(r("col_changed:s") == 1 && r("col_changed:v") == 1)
  }

  test("kAnonymity: hand-counted classes, violations, l-diversity") {
    val people = Seq(
      ("US", "A", "x"), ("US", "A", "y"), ("US", "A", "x"), // class of 3
      ("US", "B", "x"), ("US", "B", "x"),                   // class of 2
      ("DE", "A", "z")                                      // class of 1
    ).toDF("country", "seg", "secret")
    val r = Validate.kAnonymity(people, Seq("country", "seg"), k = 3,
      sensitive = Some("secret")).head
    // 6 rows, 3 classes, min size 1; 2 classes below k=3 covering 3
    // rows; risk_bp = 30000 div 6 = 5000; l_min = 1 (the DE/A class
    // and US/B both have one distinct secret)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((6L, 3L, 1L, 2L, 3L, 5000L, 1L)))
    // without a sensitive column, l_min is null
    val r2 = Validate.kAnonymity(people, Seq("country"), k = 2).head
    assert(r2.isNullAt(6) && r2.getLong(3) == 1L)
    // sensitive column may not be a quasi-identifier
    assertThrows[IllegalArgumentException] {
      Validate.kAnonymity(people, Seq("country", "secret"), k = 2,
        sensitive = Some("secret"))
    }
  }

  test("generalizeToK: finest passing level chosen, floor (not trunc) bucketing, no-pass ladder") {
    val rows = Seq(("A", 0.5), ("A", 1.5), ("A", -0.5), ("A", -1.5))
      .toDF("seg", "bal")
    val r = Validate.generalizeToK(rows, Seq("seg"), "bal",
        ladder = Seq(1L, 10L), k = 2)
      .orderBy("bucket_sz").collect()
    assert(r.length == 2)
    // level 1: four singleton (seg, bucket) classes -> all at risk
    assert(r(0).getLong(0) == 1L && r(0).getLong(5) == 4L &&
      !r(0).getBoolean(7), r(0).toString)
    // level 10: FLOOR division pairs (0.5, 1.5) -> bucket 0 and
    // (-0.5, -1.5) -> bucket -1 (trunc would merge all four into one
    // class); two classes of 2, zero risk, chosen
    assert(r(1).getLong(0) == 10L && r(1).getLong(2) == 2L &&
      r(1).getLong(5) == 0L && r(1).getBoolean(7), r(1).toString)
    // a ladder that never satisfies k: nothing chosen
    val lone = Seq(("A", 1.0), ("B", 2.0)).toDF("seg", "bal")
    val r2 = Validate.generalizeToK(lone, Seq("seg"), "bal",
      ladder = Seq(1L, 100L), k = 2).collect()
    assert(r2.forall(!_.getBoolean(7)))
    // ladder must be strictly ascending
    assertThrows[IllegalArgumentException] {
      Validate.generalizeToK(rows, Seq("seg"), "bal", Seq(10L, 1L), k = 2)
    }
  }

  test("ksDrift: identical slices score 0; a location shift maxes the CDF gap") {
    val ref = Seq.tabulate(100)(i => (i % 10).toDouble).toDF("v")
    val same = Validate.ksDrift(ref, ref, "v", Seq(3.0, 6.0)).head
    assert(same.getLong(0) == 0L)
    // shift all mass to the top: CDF gap at the first boundary is
    // |40/100 - 0/100| = 4000 bp; at the second |70/100 - 0| = 7000
    val cur = Seq.tabulate(100)(_ => 9.0).toDF("v")
    val r = Validate.ksDrift(ref, cur, "v", Seq(3.0, 6.0)).head
    assert(r.getLong(0) == 7000L && r.getString(1) == "le_6.0")
    assert(r.getLong(2) == 100L && r.getLong(3) == 100L)
  }

  test("psiDrift is partition-count invariant") {
    val ref = Seq.tabulate(200)(i => (i % 17).toDouble).toDF("v")
    val cur = Seq.tabulate(150)(i => (i % 13).toDouble).toDF("v")
    def run(p: Int) = Validate.psiDrift(ref.repartition(p),
        cur.repartition(p), "v", Seq(4.0, 8.0, 12.0))
      .collect().map(_.toSeq).toSet
    assert(run(1) == run(7))
  }

  test("embeddingDriftMicro: planted shift localized; negative means truncate toward zero") {
    val old = Seq(Seq(1.25f, -1.0f), Seq(0f, 0f), Seq(0f, 0f)).toDF("embedding")
    val fresh = Seq(Seq(2.25f, -1.0f)).toDF("embedding")
    val r = Validate.embeddingDriftMicro(old, fresh, "embedding", dim = 2)
      .orderBy("i").collect()
    // dim 0: s_old=1250000/3 → 416666 (trunc), new 2250000
    assert(r(0).getAs[Long]("mean_old_micro") == 416666L)
    assert(r(0).getAs[Long]("mean_new_micro") == 2250000L)
    assert(r(0).getAs[Long]("shift_micro") == 1833334L)
    // dim 1: s_old=-1000000/3 → -333333 TRUNCATED toward zero (a
    // flooring engine would say -333334 — the sign-split is load-bearing)
    assert(r(1).getAs[Long]("mean_old_micro") == -333333L)
    assert(r(1).getAs[Long]("shift_micro") == -666667L)
    assert(r(1).getAs[Long]("abs_shift_micro") == 666667L)
    assert(r(0).getAs[Long]("n_old") == 3L && r(0).getAs[Long]("n_new") == 1L)
  }

  test("quantileMap: identity on same distribution; shift maps back onto reference") {
    val ref = Seq.tabulate(101)(i => i.toDouble).toDF("v")
    // same distribution → every value maps to (approximately) itself:
    // with nQ=10 on 0..100 the ladder is exact multiples of 10, and a
    // ladder value maps to the SAME ladder value
    val self = Validate.quantileMap(ref, ref, "v", nQ = 10)
      .filter(col("v") % 10 === 0)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2))
    assert(self.forall { case (v, m) => v == m })
    // current = reference + 1000 (pure location shift): every mapped
    // value must land back inside the reference range
    val cur = Seq.tabulate(101)(i => (i + 1000).toDouble).toDF("v")
    val m = Validate.quantileMap(cur, ref, "v", nQ = 10)
      .agg(min(col("mapped")), max(col("mapped"))).head
    assert(m.getDouble(0) == 0.0 && m.getDouble(1) == 100.0)
    // q_idx covers the full bucket range
    val idx = Validate.quantileMap(cur, ref, "v", nQ = 10)
      .select(col("q_idx")).distinct().collect().map(_.getInt(0)).sorted
    assert(idx.head == 0 && idx.last == 10)
  }

  test("quantileMapHist: identity on same distribution, shift inversion, no WindowExec") {
    // identity: same distribution → every bucket maps to itself
    val ref = Seq.tabulate(100)(i => i.toDouble).toDF("v")
    val self = Validate.quantileMapHist(ref, ref, "v", 0.0, 100.0, nBuckets = 10)
    assert(self.filter(col("bucket") =!= col("mapped_bucket")).count() == 0L)
    // location shift: cur = uniform on [50, 100) maps onto the FULL
    // reference range — its lowest values sit at cur-CDF ~ 1/5 → land
    // near ref bucket 2, its highest at CDF 1 → ref bucket 9
    val cur = Seq.tabulate(50)(i => (i + 50).toDouble).toDF("v")
    val mapped = Validate.quantileMapHist(cur, ref, "v", 0.0, 100.0, 10)
      .select(col("bucket"), col("mapped_bucket")).distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mapped == Map(5L -> 1L, 6L -> 3L, 7L -> 5L, 8L -> 7L, 9L -> 9L),
      s"got $mapped")
    // midpoints are the shared-expression arithmetic
    val mids = Validate.quantileMapHist(cur, ref, "v", 0.0, 100.0, 10)
      .select(col("mapped_bucket"), col("mapped")).distinct()
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(mids.forall { case (b, m) => m == b * 10.0 + 5.0 })
    // the scale claim: NO WindowExec anywhere in the physical plan
    // (quantileMap's global row_number is exactly what this op removes)
    val plan = Validate.quantileMapHist(cur, ref, "v", 0.0, 100.0, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected WindowExec:\n$plan")
    // partition-count invariance (histograms are mergeable integers)
    val a = Validate.quantileMapHist(cur.repartition(1), ref.repartition(1),
      "v", 0.0, 100.0, 10).orderBy("v").collect().toSeq
    val b = Validate.quantileMapHist(cur.repartition(13), ref.repartition(7),
      "v", 0.0, 100.0, 10).orderBy("v").collect().toSeq
    assert(a == b)
  }

  test("quantileLadder: exact type-1 ranks, bounds, degenerate input guard") {
    val df = Seq(5.0, 1.0, 3.0, 2.0, 4.0).toDF("v")
    // n=5, nQ=4 → ranks 0,1,2,3,4 → the sorted data itself
    assert(Validate.quantileLadder(df, "v", 4).toSeq ==
      Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    // nQ=2 → ranks 0,2,4 → min/median/max
    assert(Validate.quantileLadder(df, "v", 2).toSeq == Seq(1.0, 3.0, 5.0))
    assertThrows[IllegalArgumentException] {
      Validate.quantileLadder(Seq.empty[Double].toDF("v"), "v", 4)
    }
  }

  test("quantileLadder distributed rank equals local sorted selection under duplicates and many partitions") {
    // the r13 prefix-scan rewrite (range partition + local row_number +
    // broadcast offsets) must pick the SAME values as sorting locally —
    // including heavy duplicates, where the value at a rank must not
    // depend on the order among equals
    val rnd = new scala.util.Random(13)
    val vals = Seq.fill(5000)((rnd.nextInt(400) / 4.0))
    val df = vals.toDF("v").repartition(17)
    for (nQ <- Seq(2, 7, 16)) {
      val ladder = Validate.quantileLadder(df, "v", nQ).toSeq
      val sorted = vals.sorted
      val expect = (0 to nQ).map(q =>
        sorted((q.toLong * (vals.size - 1) / nQ).toInt))
      assert(ladder == expect, s"nQ=$nQ: $ladder vs $expect")
    }
  }

  test("benfordDigitsBy: per-group counts, densified grid, all-excluded group") {
    val df = Seq(
      ("a", 123.4), ("a", 150.0), ("a", 99.0),   // a: digits 1,1,9
      ("b", 0.25), ("b", 2e7),                   // b: digit 2 + one excluded
      ("c", 0.0)                                  // c: ALL excluded
    ).toDF("src", "v")
    val out = Validate.benfordDigitsBy(df, "src", "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(6))).toMap
    // 9 rows per group (densified), 3 groups
    assert(out.size == 27)
    assert(out(("a", 1)) == (2L, 6666L, 0L)) // 2/3 → 6666 bp
    assert(out(("a", 9)) == (1L, 3333L, 0L))
    assert(out(("a", 5))._1 == 0L)           // absent digit surfaces as 0
    assert(out(("b", 2)) == (1L, 10000L, 1L)) // 1/1 + one excluded
    // all-excluded group: t = 0 → obs_bp 0, exclusion counted
    assert(out(("c", 1)) == (0L, 0L, 1L))
    // expectations identical across groups (shared constant ladder)
    val exps = Validate.benfordDigitsBy(df, "src", "v")
      .select(col("digit"), col("exp_bp")).distinct().count()
    assert(exps == 9)
  }

  test("benfordDigits: hand-checked digits across magnitudes, exclusions, empty digits") {
    // digits: 123.4→1, 0.023→2, 2000.0→2, 9.99→9, 0.5→5, -30.0→3 (abs);
    // excluded: 0.0 (below range), 2e7 (above range); null is DROPPED
    // (not counted — null accounting belongs to profile)
    val df = Seq[Option[Double]](Some(123.4), Some(0.023), Some(2000.0),
      Some(9.99), Some(0.5), Some(-30.0), Some(0.0), Some(2e7), None)
      .toDF("v")
    val out = Validate.benfordDigits(df, "v").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    assert(out.keySet == (1 to 9).toSet)
    assert(out(1)._1 == 1L && out(2)._1 == 2L && out(3)._1 == 1L &&
      out(5)._1 == 1L && out(9)._1 == 1L)
    assert(out(4)._1 == 0L && out(7)._1 == 0L) // empty digits present as 0
    assert(out.values.forall(_._3 == 2L))      // 0.0 and 2e7 excluded
    // obs shares over the 6 counted rows: digit 2 → floor(2e4/... )
    assert(out(2)._2 == 20000L / 6)
    // expectation constants: monotone decreasing, digit 1 ≈ 30.1%
    val exp = Validate.benfordExpBp
    assert(exp.head == 3010L && exp == exp.sorted.reverse && exp.sum <= 10000L)
  }

  test("cascadePurgePlan: hand-checked two-level cascade, witnesses, dup FKs") {
    // roots {1, 2}; orders: o10,o11 belong to 1, o12 to 3 (kept),
    // o13 to 2; lineitems: two rows under o10 (dup FK), one under o12
    val roots = Seq(1L, 2L, 2L).toDF("cid") // dup root collapses
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 3L), (13L, 2L))
      .toDF("okey", "cfk")
    val items = Seq((101L, 10L), (102L, 10L), (103L, 12L))
      .toDF("ikey", "ofk")
    val r = Validate.cascadePurgePlan(roots, "cid", Seq(
        ("orders", orders, "cfk", "okey"),
        ("items", items, "ofk", "ikey")))
      .orderBy("lvl").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6)))
    // orders: deleted {10,11,13} sum 34, kept {12} sum 12
    // items: deleted {101,102} sum 203 (both under o10), kept {103}
    assert(r.toSeq == Seq(
      (1, "orders", 4L, 3L, 1L, 34L, 12L),
      (2, "items", 3L, 2L, 1L, 203L, 103L)), r.mkString(","))
  }

  test("tCloseness: hand-checked EMD, matching class = 0, constant sensitive = 0") {
    // class c1 = {a, a} (fully skewed), class c2 = {b, b}; global
    // (a: 2, b: 2, N = 4, m = 2). c1 dist (1, 0) vs global (.5, .5)
    // -> EMD = 0.5 -> 500000 ppm (and c2 symmetric)
    val df = Seq(("c1", "a"), ("c1", "a"), ("c2", "b"), ("c2", "b"))
      .toDF("qc", "s")
    val r = Validate.tCloseness(df, Seq("qc"), "s")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(r == Set(("c1", 2L, 500000L), ("c2", 2L, 500000L)), r)
    // a class matching the global distribution scores 0
    val df2 = Seq(("c1", "a"), ("c1", "b"), ("c2", "a"), ("c2", "b"))
      .toDF("qc", "s")
    val r2 = Validate.tCloseness(df2, Seq("qc"), "s")
      .collect().map(x => x.getLong(2)).toSet
    assert(r2 == Set(0L))
    // constant sensitive column (m = 1) emits 0, not a crash
    val df3 = Seq(("c1", "a"), ("c2", "a")).toDF("qc", "s")
    assert(Validate.tCloseness(df3, Seq("qc"), "s")
      .collect().forall(_.getLong(2) == 0L))
    intercept[IllegalArgumentException] {
      Validate.tCloseness(df, Seq("s"), "s")
    }
  }

  test("mutualInfoNano: ln2 on a perfect copy, 0 on independence") {
    // x == y over two values: MI = ln 2; per-cell term
    // floor(1e9 * 0.5 * ln 2) = 346573590, two cells
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val r = Validate.mutualInfoNano(dep, "x", "y").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 2L, 2L, 693147180L)), r.toString)
    // uniform independent 2x2: every cell term is exactly 0
    val ind = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
      .toDF("x", "y")
    assert(Validate.mutualInfoNano(ind, "x", "y").head.getLong(3) == 0L)
  }

  test("srmCheck: hand-checked 60/40 split with an unexpected arm") {
    val df = (Seq.fill(6)("A") ++ Seq.fill(4)("B") ++ Seq("junk"))
      .toDF("arm")
    val r = Validate.srmCheck(df, "arm", Seq(("A", 1L), ("B", 1L)))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    // n_assigned = 10; A: obs 600000, dev +100000, chi2 = (12-10)^2/20
    assert(r("A") == ((6L, 500000L, 600000L, 100000L, 0.2)), r("A"))
    assert(r("B") == ((4L, 500000L, 400000L, -100000L, 0.2)), r("B"))
    assert(r("__unexpected__")._1 == 1L)
    // an arm with zero rows still reports (cnt = 0, full deviation)
    val r2 = Validate.srmCheck(df.filter(col("arm") === "A"), "arm",
        Seq(("A", 1L), ("B", 1L)))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r2("B") == 0L && r2("A") == 6L)
  }

  test("calibrationReport: perfectly calibrated bins gap ~0, miscalibrated flagged") {
    import spark.implicits._
    // bin 0.05-ish: score 0.05, 1 positive of 20 -> pos 50000 ppm vs
    // conf 50000 ppm -> gap 0; bin at 0.95: score 0.95 but NO
    // positives -> gap = 950000
    val calib = (1 to 19).map(_ => (0.05, 0L)) :+ ((0.05, 1L))
    val bad = (1 to 10).map(_ => (0.95, 0L))
    val df = (calib ++ bad).toDF("score", "label")
    val r = Validate.calibrationReport(df, "score", "label", nBins = 10)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(3),
        x.getLong(4), x.getLong(5)))).toMap
    assert(r(0L) == ((20L, 50000L, 0L, 316666L)), r(0L))
    assert(r(9L) == ((10L, 0L, 950000L, 316666L)), r(9L))
    // ECE = (20*0 + 10*950000) / 30 = 316666
  }

  test("auditFingerprint: partition/order invariance, dup and mutation signatures, null sentinel") {
    import spark.implicits._
    val df = Seq((1L, "a", "x"), (2L, "b", null.asInstanceOf[String]),
      (3L, "a", "z")).toDF("id", "src", "v")
    def fp(d: org.apache.spark.sql.DataFrame) =
      Validate.auditFingerprint(d, "src", Seq("id", "v"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val base = fp(df)
    assert(base("a")._1 == 2L && base("b")._1 == 1L)
    // invariant under repartition AND row order
    assert(fp(df.repartition(7)) == base)
    assert(fp(df.orderBy(col("id").desc)) == base)
    // duplicated row: n and sum shift, xor of the dup pair cancels —
    // xor collapses to the remaining row's hash
    val dup = df.union(Seq((1L, "a", "x")).toDF("id", "src", "v"))
    val d = fp(dup)
    assert(d("a")._1 == 3L && d("a")._3 == base("a")._3 + fpRow(1L, "x"))
    assert(d("a")._2 == fpRow(3L, "z"), d("a"))
    // a mutated cell changes the group fingerprint
    val mut = Seq((1L, "a", "x"), (2L, "b", null.asInstanceOf[String]),
      (3L, "a", "Z")).toDF("id", "src", "v")
    assert(fp(mut)("a") != base("a"))
    // null folds as the sentinel, distinct from the empty string
    val empty = Seq((2L, "b", "")).toDF("id", "src", "v")
    assert(fp(empty)("b") != base("b"))
  }

  private def fpRow(id: Long, v: String): Long = {
    // reference poly hash of the packed row (seed 7, base 31, mod P)
    val s = s"$id\u0001$v"
    s.foldLeft(7L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
  }

  test("isotonicCalibrate: adjacent violators pool to the weighted mean; monotone input passes through") {
    import spark.implicits._
    // 4 observed bins (scores .05/.15/.25/.35 of the 10-bin [0,1]
    // ladder), raw rates [1/5, 3/5, 2/5, 4/5]: bins 1 and 2 violate
    // monotonicity and pool to (3+2)/(5+5) = 1/2
    def rows(score: Double, pos: Int) =
      (1 to 5).map(i => (score, if (i <= pos) 1L else 0L))
    val df = (rows(0.05, 1) ++ rows(0.15, 3) ++ rows(0.25, 2) ++
      rows(0.35, 4)).toDF("score", "label")
    val r = Validate.isotonicCalibrate(df, "score", "label", nBins = 10)
      .orderBy("bin").collect()
      .map(x => (x.getLong(0), x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (0L, 200000L, 200000L), (1L, 600000L, 500000L),
      (2L, 400000L, 500000L), (3L, 800000L, 800000L)), r.mkString(","))
    // fitted is non-decreasing by construction
    assert(r.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
    // already-monotone input: fitted == raw everywhere
    val mono = (rows(0.05, 1) ++ rows(0.15, 2) ++ rows(0.25, 4))
      .toDF("score", "label")
    val m = Validate.isotonicCalibrate(mono, "score", "label", nBins = 10)
      .collect().map(x => x.getLong(3) == x.getLong(4))
    assert(m.forall(identity))
  }

  test("cupedAdjust: hand-computed theta and adjusted means; zero-variance covariate yields NULL theta") {
    import spark.implicits._
    // x: 1,2,3,4; y = 2x + arm effect: A rows (1,2) y=2x, B rows y=2x+1
    val df = Seq(("A", 1.0, 2.0), ("A", 2.0, 4.0),
      ("B", 3.0, 7.0), ("B", 4.0, 9.0)).toDF("arm", "x", "y")
    // pooled: mx=2.5, cov=Σ(x-mx)(y-my)/4, var=1.25
    // y means: my=5.5; cov = ((-1.5)(-3.5)+(-0.5)(-1.5)+0.5*1.5+1.5*3.5)/4
    //        = (5.25+0.75+0.75+5.25)/4 = 3.0 ; theta = 3/1.25 = 2.4
    // A: my_a=3, mx_a=1.5 -> adj = 3 - 2.4*(1.5-2.5) = 5.4
    // B: my_a=8, mx_a=3.5 -> adj = 8 - 2.4*(3.5-2.5) = 5.6
    val r = Validate.cupedAdjust(df, "arm", "x", "y")
      .orderBy("arm").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getDouble(4)))
    assert(r.toSeq == Seq(("A", 2L, 3.0, 2.4, 5.4),
      ("B", 2L, 8.0, 2.4, 5.6)), r.mkString(","))
    // constant covariate: theta and var_reduction NULL, means intact
    val flat = Seq(("A", 1.0, 2.0), ("B", 1.0, 4.0)).toDF("arm", "x", "y")
    val f = Validate.cupedAdjust(flat, "arm", "x", "y").orderBy("arm").collect()
    assert(f.forall(_.isNullAt(3)) && f.forall(_.isNullAt(5)))
  }

  test("conversionWilson: hand-checked bounds, degenerate all/none converters stay in [0, 1]") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("A", if (i <= 3) 1L else 0L)) ++
      (1 to 5).map(_ => ("all", 1L)) ++ (1 to 5).map(_ => ("none", 0L))
    val r = Validate.conversionWilson(df.toDF("grp", "c"), "grp", "c")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3),
          x.getDouble(4), x.getDouble(5)))).toMap
    val (n, c, ppm, lo, hi) = r("A")
    assert(n == 10L && c == 3L && ppm == 300000L)
    // Wilson at p=0.3, n=10, z=1.96: center=(0.3+0.19208)/1.38416
    def wilson(p: Double, n: Double, sign: Double): Double = {
      val z = 1.96; val z2 = z * z
      ((p + z2 / (2 * n) + sign * z *
        math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))) / (1 + z2 / n))
    }
    assert(math.abs(lo - wilson(0.3, 10, -1)) < 1e-6, lo)
    assert(math.abs(hi - wilson(0.3, 10, 1)) < 1e-6, hi)
    assert(lo > 0 && hi < 1)
    // degenerate groups: bounds stay inside [0, 1], never NaN
    assert(r("all")._4 > 0 && r("all")._5 == 1.0)
    assert(r("none")._4 == 0.0 && r("none")._5 < 1)
  }

  test("thresholdReport: hand-counted confusion ladder, single-division F1, empty-prediction row") {
    import spark.implicits._
    val df = Seq((0.10, 0L), (0.20, 1L), (0.40, 0L), (0.60, 1L),
      (0.90, 1L)).toDF("score", "label")
    val out = Validate.thresholdReport(df, "score", "label",
        thrPpm = Seq(300000L, 500000L, 950000L))
      .orderBy("thr_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    assert(out.toSeq == Seq(
      // thr 0.3: preds {0.4, 0.6, 0.9} -> tp 2 fp 1 fn 1 tn 1;
      // f1 = 40000 div (4+1+1) = 6666
      (300000L, 2L, 1L, 1L, 1L, 6666L, 6666L, 6666L, 6000L),
      // thr 0.5: preds {0.6, 0.9} -> perfect precision
      (500000L, 2L, 0L, 1L, 2L, 10000L, 6666L, 8000L, 8000L),
      // thr 0.95: nothing predicted positive -> ratios 0, not errors
      (950000L, 0L, 0L, 3L, 2L, 0L, 0L, 0L, 4000L)),
      out.mkString(","))
    // monotonicity the ladder must obey: recall non-increasing in thr
    val rec = out.map(_._7)
    assert(rec.sameElements(rec.sorted.reverse))
  }

  test("thresholdReportBy: each slice equals its own solo report; null groups dropped") {
    import spark.implicits._
    val df = Seq(("a", 0.10, 0L), ("a", 0.60, 1L), ("a", 0.90, 0L),
      ("b", 0.20, 1L), ("b", 0.70, 1L),
      (null.asInstanceOf[String], 0.99, 1L)).toDF("g", "score", "label")
    val ladder = Seq(300000L, 800000L)
    val by = Validate.thresholdReportBy(df, "g", "score", "label", ladder)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))).toMap
    assert(by.keySet.map(_._1) == Set("a", "b")) // null group dropped
    for (g <- Seq("a", "b")) {
      val solo = Validate.thresholdReport(df.filter(col("g") === g),
          "score", "label", ladder)
        .collect().map(r => (g, r.getLong(0)) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toMap
      solo.foreach { case (k, v) => assert(by(k) == v, s"$k: ${by(k)} != $v") }
    }
  }

  test("aucBy: perfect / tied / inverted separations + brute-force pair agreement") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      // A: perfect separation -> 1.0
      ("A", 0.9, 1L), ("A", 0.8, 1L), ("A", 0.2, 0L), ("A", 0.1, 0L),
      // B: all tied -> 0.5 by midrank
      ("B", 0.5, 1L), ("B", 0.5, 0L), ("B", 0.5, 1L), ("B", 0.5, 0L),
      // C: inverted -> 0.0
      ("C", 0.1, 1L), ("C", 0.9, 0L),
      // D: one class only -> NULL
      ("D", 0.7, 1L), ("D", 0.3, 1L))
    val df = rows.toDF("g", "score", "y")
    val out = graft.ops.Validate.aucBy(df, "g", "score", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out("A") == Some(1000000L), out)
    assert(out("B") == Some(500000L), out)
    assert(out("C") == Some(0L), out)
    assert(out("D") == None, out)
    // brute-force reference on a mixed fixture (incl. ties): AUC =
    // (#(pos>neg) + 0.5 #(pos==neg)) / (nPos*nNeg) over ppm-floored
    // scores, single final floor to micro
    val mixed = Seq(0.91, 0.85, 0.85, 0.52, 0.40, 0.33).map(s => ("M", s, 1L)) ++
      Seq(0.85, 0.52, 0.52, 0.30, 0.12).map(s => ("M", s, 0L))
    def ppm(x: Double) = math.floor(x * 1e6).toLong
    val pos = mixed.filter(_._3 == 1L).map(r => ppm(r._2))
    val neg = mixed.filter(_._3 == 0L).map(r => ppm(r._2))
    val twice = (for (p <- pos; n <- neg) yield
      (if (p > n) 2L else if (p == n) 1L else 0L)).sum
    val want = twice * 1000000L / (2L * pos.size * neg.size)
    val got = graft.ops.Validate.aucBy(mixed.toDF("g", "score", "y"),
        "g", "score", "y")
      .collect().head.getLong(3)
    assert(got == want, s"$got != $want")
  }
}
