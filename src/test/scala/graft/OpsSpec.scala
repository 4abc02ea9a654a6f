package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity}

/** Ops not covered by the DuckDB gate: IVF search, LSH recall vs brute
  * force, multimodal extraction plumbing.
  */
class OpsSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfSmall).cache()
  private lazy val docs = Tables.documents(spark, sfSmall)

  test("negativeSampleRing: determinism, self-exclusion, hand-checked successor") {
    import spark.implicits._
    val pool = (0L until 200L).toDF("id")
    val anchors = Seq(0L, 20L, 40L).toDF("id")
    def run() = Similarity.negativeSampleRing(pool, "id", anchors, "id",
        k = 4, bucketBits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val out = run()
    // k rows per anchor (buckets dense at 200/8 = 25 candidates each)
    assert(out.size == 12)
    assert(out.groupBy(_._1).forall(_._2.size == 4))
    // never its own negative
    assert(out.forall { case (a, _, n, _) => a != n })
    // bit-for-bit reproducible (no RNG anywhere)
    assert(run() == out)
    // hand replay of one probe: smallest in-bucket forward distance
    val M = 4294967296L; val KN = 2654435761L; val div = M >> 3
    val probe = ((0L * 37 + 0L * 1009 + 17) * KN) % M
    val want = (0L until 200L)
      .map(c => (c, (c * KN) % M))
      .filter { case (c, p) => p / div == probe / div && c != 0L }
      .map { case (c, p) => ((p - probe + M) % M, c) }
      .min
    assert(out.contains((0L, 0L, want._2, want._1)))
    // partitioning invariance: 1 partition == many
    val got1 = Similarity.negativeSampleRing(pool.repartition(1), "id",
        anchors, "id", k = 4, bucketBits = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got1 == out)
  }

  test("negativeSampleRing: ids past 2^32/KN do not overflow and alias mod 2^32") {
    import spark.implicits._
    // 4e9 * 2654435761 wraps signed 64-bit in the naive multiply; the
    // decomposed Knuth hash must keep every position and distance
    // non-negative, and an id >= 2^32 must land exactly where its
    // mod-2^32 alias lands
    val M = 4294967296L
    val big = Seq(4000000000L, 4100000000L, 4200000000L, 4294967295L,
      M + 123L, 3L * M + 77L)
    val pool = (big ++ (0L until 50L)).toDF("id")
    val anchors = Seq(4000000000L).toDF("id")
    val out = Similarity.negativeSampleRing(pool, "id", anchors, "id",
        k = 8, bucketBits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.nonEmpty)
    assert(out.forall { case (_, _, n, d) => n >= 0 && d >= 0 && d < M })
    // alias check: a pool of {M + 123} behaves exactly like {123}
    def one(ids: Seq[Long]) = Similarity.negativeSampleRing(
        ids.toDF("id"), "id", Seq(7L).toDF("id"), "id",
        k = 2, bucketBits = 1)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(one(Seq(M + 123L)) == one(Seq(123L)))
  }

  test("mutualNearestPairs: hand-built mutual and hub cases") {
    import spark.implicits._
    // unit-ish vectors in 64 dims (first 3 dims used): a1<->b1 mutual,
    // a2 and a3 both point at b2 (hub) but b2's best is a2 -> only
    // (a2, b2) survives; a3 gets nothing
    def v(x: Double, y: Double, z: Double): Array[Float] =
      (Array(x, y, z) ++ Array.fill(61)(0.0)).map(_.toFloat)
    val a = Seq((10L, v(1, 0, 0)), (20L, v(0, 1, 0)), (30L, v(0, 0.9, 0.1)))
      .toDF("vec_id", "embedding")
    val b = Seq((11L, v(0.9, 0.1, 0)), (21L, v(0, 1, 0.05)))
      .toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.mutualNearestPairs(a, b, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 11L), (20L, 21L)))
    // partitioning invariance
    val got2 = graft.ops.Similarity.mutualNearestPairs(
        a.repartition(3), b.repartition(2), "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == got)
    // coinciding id spaces (aligned corpora): the same-id pair is a
    // legitimate — often the TRUE — candidate, so the default must not
    // mask the diagonal; excludeSelf=true is the self-join opt-in
    val a2 = Seq((1L, v(1, 0, 0)), (2L, v(0, 1, 0))).toDF("vec_id", "embedding")
    val b2 = Seq((1L, v(0.99, 0.01, 0)), (2L, v(0, 0.98, 0.02)))
      .toDF("vec_id", "embedding")
    val diag = graft.ops.Similarity.mutualNearestPairs(a2, b2, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(diag == Set((1L, 1L), (2L, 2L)))
    val masked = graft.ops.Similarity.mutualNearestPairs(
        a2, b2, "vec_id", "embedding", excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(masked == Set((1L, 2L), (2L, 1L)))
  }

  test("marginMinedPairs demotes hubs that raw cosine would pick; brute-force equality") {
    import spark.implicits._
    def v(x: Double, y: Double): Array[Float] =
      (Array(x, y) ++ Array.fill(62)(0.0)).map(_.toFloat)
    // b=100 is a HUB: decent cosine to BOTH anchors, so its top-k
    // neighborhood sum is high and the ratio margin demotes it; b=101
    // and b=102 are the true partners despite slightly lower raw cos
    // ordering pressure on the hub
    val a = Seq((0L, v(1.0, 0.2)), (2L, v(0.2, 1.0)))
      .toDF("vec_id", "embedding")
    val b = Seq((100L, v(0.9, 0.9)), (101L, v(1.0, 0.0)),
        (102L, v(0.0, 1.0))).toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.marginMinedPairs(a, b, "vec_id",
        "embedding", k = 2, minMarginPpm = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // brute-force replication of the integer pipeline
    val av = Seq(0L -> (1.0, 0.2), 2L -> (0.2, 1.0))
    val bv = Seq(100L -> (0.9, 0.9), 101L -> (1.0, 0.0), 102L -> (0.0, 1.0))
    def dot(p: (Double, Double), q: (Double, Double)): Long =
      math.floor((p._1.toFloat.toDouble * q._1.toFloat.toDouble +
        p._2.toFloat.toDouble * q._2.toFloat.toDouble) * 1e6).toLong
    val sc = for ((ai, ap) <- av; (bi, bp) <- bv) yield (ai, bi, dot(ap, bp))
    def topSum(xs: Seq[(Long, Long)]): Long = // (tiebreak id, cos)
      xs.sortBy { case (id, c) => (-c, id) }.take(2).map(_._2).sum
    val sa = av.map { case (ai, _) =>
      ai -> topSum(sc.filter(_._1 == ai).map(x => (x._2, x._3))) }.toMap
    val sb = bv.map { case (bi, _) =>
      bi -> topSum(sc.filter(_._2 == bi).map(x => (x._1, x._3))) }.toMap
    val want = av.map(_._1).flatMap { ai =>
      sc.filter(x => x._1 == ai && x._3 > 0 && sa(ai) + sb(x._2) > 0)
        .map { case (_, bi, c) =>
          (bi, c, (c * 4L * 1000000L) / (sa(ai) + sb(bi))) }
        .sortBy { case (bi, _, m) => (-m, bi) }.headOption
        .map { case (bi, c, m) => (ai, bi, c, m) }
    }
    assert(got.toSet == want.toSet, s"got=${got.toSeq} want=$want")
    // the margin pick differs from the raw-cosine pick for anchor 0:
    // raw cos prefers the hub (0.9+0.18 = 1.08 > 1.0), margin picks 101
    val rawTop = sc.filter(_._1 == 0L).maxBy(x => (x._3, -x._2))._2
    assert(rawTop == 100L && got.find(_._1 == 0L).get._2 == 101L)
  }

  test("ivfTopK returns k neighbors per query and respects probes") {
    val queries = emb.filter(col("vec_id") < 3)
    val res = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", "label", k = 4, nProbe = 2)
      .collect()
    assert(res.length == 12) // 3 queries × 4 neighbors
    assert(res.forall(r => r.getAs[Long]("n_id") != r.getAs[Long]("q_id")))
  }

  test("ivfTopKLearned: self-learned clusters keep top-1 recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 1)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopKLearned(emb, queries, "vec_id", "embedding",
        k = 1, nClusters = 8, nProbe = 4)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // with half the clusters probed, at least 3/5 exact top-1 hits —
    // deterministic (seeded k-means), so this is a stable bound
    val hits = bf.count { case (q, n) => ivf.get(q).contains(n) }
    assert(hits >= 3, s"recall too low: $hits/5 (ivf=$ivf bf=$bf)")
  }

  test("sq8: codes bounded, identical vectors code identically, recall vs exact") {
    val queries = emb.filter(col("vec_id") < 4)
    val scale = Similarity.sqMaxAbs(emb, "embedding")
    assert(scale > 0f)
    val codes = Similarity.sqAssign(emb, "vec_id", "embedding", scale)
    // every code in [-127, 127]
    val rows = codes.select(explode(col("sq_codes")).as("c"))
      .agg(min(col("c")), max(col("c"))).head
    assert(rows.getInt(0) >= -127 && rows.getInt(1) <= 127)
    // identical input vectors → identical code arrays
    val c0 = codes.filter(col("vec_id") === 0).head.getSeq[Int](1)
    val c0b = Similarity.sqAssign(emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", scale).head.getSeq[Int](1)
    assert(c0 == c0b)
    // quantized search keeps most of the exact top-5 (deterministic —
    // fixed fixture, fixed codes — so this is a stable bound)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
    val sq = Similarity.sqTopKLearned(emb, queries, "vec_id", "embedding", k = 5)
    val recall = Similarity.recallAtK(sq, exact, k = 5)
      .agg(avg(col("recall_bp"))).head.getDouble(0)
    assert(recall >= 8000.0, s"sq8 mean recall too low: $recall bp")
  }

  test("sqMaxAbs: empty / all-null corpus takes the zero-scale path") {
    // max over an empty corpus is a NULL aggregate — must map to the
    // documented 0f zero-scale (everything codes to 0), not NPE
    val empty = emb.filter(col("vec_id") < 0)
    assert(Similarity.sqMaxAbs(empty, "embedding") == 0f)
    val allNull = emb.select(col("vec_id"),
      lit(null).cast("array<float>").as("embedding"))
    assert(Similarity.sqMaxAbs(allNull, "embedding") == 0f)
  }

  test("ivfSq: probed-cluster pruning + integer code-dots keep top-1 recall") {
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 1)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivfsq = Similarity.ivfSqTopKLearned(emb, queries, "vec_id", "embedding",
        k = 1, nClusters = 8, nProbe = 4)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // two approximations stacked (cluster pruning + int8 scores), so a
    // looser bound than IVF-flat's 3/5 — deterministic on the fixture
    val hits = bf.count { case (q, n) => ivfsq.get(q).contains(n) }
    assert(hits >= 2, s"ivf-sq recall too low: $hits/5 (ivfsq=$ivfsq bf=$bf)")
    // scores are exact integers (the hash-gate property)
    val dots = Similarity.ivfSqTopKLearned(emb, queries, "vec_id", "embedding",
      k = 2, nClusters = 8, nProbe = 2)
    assert(dots.schema("code_dot").dataType.typeName == "long")
  }

  test("recallAtK: exact-vs-exact is 10000 bp; known misses floor exactly") {
    import spark.implicits._
    val queries = emb.filter(col("vec_id") < 4)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
    val self = Similarity.recallAtK(exact, exact, k = 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("recall_bp")))
    assert(self.length == 4 && self.forall(_._2 == 10000L))
    // hand-built approx: for q 0 keep 3 of the 5 exact hits + 2 bogus
    val keep = exact.filter(col("q_id") === 0 && col("rnk") <= 3)
    val bogus = Seq((0L, 4, -1L, 0.0), (0L, 5, -2L, 0.0))
      .toDF("q_id", "rnk", "n_id", "cos")
    val r = Similarity.recallAtK(keep.unionByName(bogus), exact, k = 5)
      .filter(col("q_id") === 0).head
    assert(r.getAs[Long]("n_exact") == 5L && r.getAs[Long]("n_hit") == 3L)
    assert(r.getAs[Long]("recall_bp") == 6000L)
    // a query with an empty approx set scores 0, not a missing row
    val none = Similarity.recallAtK(bogus.filter(col("rnk") > 99), exact, k = 5)
      .filter(col("q_id") === 1).head
    assert(none.getAs[Long]("n_hit") == 0L && none.getAs[Long]("recall_bp") == 0L)
  }

  test("rankingMetrics: hand-checked MRR and nDCG cases") {
    import spark.implicits._
    def rank(rows: (Long, Long, Int)*) = rows.toSeq.toDF("q_id", "n_id", "rnk")
    // truth for both queries: items 1, 2, 3 at ranks 1, 2, 3
    val truth = rank((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3),
      (1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3))
    // q0: perfect ordering → rr = 1e6, ndcg = 1e6 exactly
    // q1: only item 3 found, at rank 2 → rr = 500000;
    //     dcg = floor(1e9·ln2/ln3); idcg = g(1)+g(2)+g(3)
    val approx = rank((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3),
      (1L, 9L, 1), (1L, 3L, 2), (1L, 8L, 3))
    val r = Similarity.rankingMetrics(approx, truth, k = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(0L) == ((3L, 1000000L, 1000000L)))
    def g(i: Int) = math.floor(1e9 * math.log(2) / math.log(i + 1)).toLong
    val expNdcg = 1000000L * g(2) / (g(1) + g(2) + g(3))
    assert(r(1L) == ((3L, 500000L, expNdcg)))
  }

  test("rankingMetrics: whiffed query scores zero, not null") {
    import spark.implicits._
    val truth = Seq((0L, 1L, 1)).toDF("q_id", "n_id", "rnk")
    val approx = Seq((0L, 9L, 1)).toDF("q_id", "n_id", "rnk")
    val r = Similarity.rankingMetrics(approx, truth, k = 3).head
    assert(r.getLong(1) == 1L && r.getLong(2) == 0L && r.getLong(3) == 0L)
  }

  test("kmeansCentroids is deterministic and assigns every vector") {
    val c1 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val c2 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(c1 == c2)
    val n = emb.count()
    val assigned = Similarity.kmeansAssign(emb, "vec_id", "embedding",
      Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8))
    assert(assigned.count() == n)
    assert(assigned.select("cl").distinct().count() > 1)
  }

  test("lshTopK neighbors are a subset of candidates sharing the bucket") {
    val queries = emb.filter(col("vec_id") < 5)
    val res = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 3, nBits = 4)
    val buckets = Similarity.withBucket(emb, "embedding", nBits = 4)
      .select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    res.collect().foreach { r =>
      assert(buckets(r.getAs[Long]("q_id")) == buckets(r.getAs[Long]("n_id")))
    }
  }

  test("brute-force top-1 at least matches LSH top-1 cosine") {
    val queries = emb.filter(col("vec_id") === 0)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 1)
      .collect().head.getAs[Double]("cos")
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 1, nBits = 4)
      .collect().headOption.map(_.getAs[Double]("cos"))
    lsh.foreach(l => assert(bf >= l)) // exact ≥ approximate
  }

  test("pqAssign emits one code per subspace within codebook range") {
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      dim = 64, nSub = 4, k = 8, iters = 2)
    assert(books.count() == 32) // 4 subspaces × 8 codewords
    assert(books.select("c_vec").collect().forall(_.getSeq[Float](0).length == 16))
    val codes = Similarity.pqAssign(emb, "vec_id", "embedding", books)
    assert(codes.count() == emb.count())
    codes.collect().foreach { r =>
      val cs = r.getSeq[Long](1)
      assert(cs.length == 4 && cs.forall(c => c >= 0 && c < 8))
    }
  }

  test("pqTopKLearned: ADC recall vs brute force on the quantized corpus") {
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 3)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val pq = Similarity.pqTopKLearned(emb, queries, "vec_id", "embedding",
        dim = 64, k = 3, nSub = 8, nCodes = 32)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    // The fixture's unit vectors are near-random: rank-1-vs-rank-5
    // cosine margins (~0.05) sit below PQ quantization error, so top-3
    // recall is inherently modest — EXACTNESS of the ADC arithmetic is
    // the q99c oracle's job (full DuckDB replay); this pins that the
    // quantizer still ranks true neighbors above the field, and the
    // deterministic training makes the bound stable run-to-run
    val overlap = bf.map { case (q, ns) => (ns & pq.getOrElse(q, Set.empty)).size }.sum
    assert(overlap >= 4, s"ADC top-3 overlap too low: $overlap/15")
    // every query still gets exactly k results
    assert(pq.values.forall(_.size == 3))
  }

  test("ivfPqTopKLearned: k results per query, all from probed clusters") {
    val queries = emb.filter(col("vec_id") < 3)
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8)
    val membership = Similarity.kmeansAssign(emb, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("cl")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val res = Similarity.ivfPqTopKLearned(emb, queries, "vec_id", "embedding",
      dim = 64, k = 3, nClusters = 8, nProbe = 2, nSub = 4, nCodes = 8)
    val rows = res.collect()
    assert(rows.length == 9) // 3 queries × 3
    // every neighbor must live in one of its query's 2 probed clusters —
    // which certainly excludes at least one of the 8 clusters overall
    val neighborClusters = rows.map(r => membership(r.getAs[Long]("n_id"))).toSet
    assert(neighborClusters.size <= 6,
      s"neighbors from too many clusters for 3 queries × 2 probes: $neighborClusters")
    assert(rows.forall(r => r.getAs[Long]("n_id") != r.getAs[Long]("q_id")))
  }

  test("pqCodebooks rejects a subspace count that does not divide dim") {
    val e = intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(emb, "vec_id", "embedding", dim = 64, nSub = 5, k = 4)
    }
    assert(e.getMessage.contains("divide evenly"))
  }

  test("mmrRerank: diversity demotes the near-duplicate of the first pick") {
    import spark.implicits._
    // A is best; B is A's near-verbatim twin; C is weaker but orthogonal.
    // Plain top-2 = (A, B); MMR(λ=0.5) must pick (A, C).
    val vecs = Seq(
      (10L, Array(1f, 0f)),   // A
      (11L, Array(0.99f, 0.14f)), // B ≈ A
      (12L, Array(0f, 1f))    // C
    ).toDF("id", "vec")
    val cand = Seq((1L, 10L, 0.9), (1L, 11L, 0.89), (1L, 12L, 0.5))
      .toDF("q_id", "n_id", "rel")
    val r = Similarity.mmrRerank(cand, vecs, "id", "vec", k = 3, lambda = 0.5)
      .orderBy(col("rank")).collect()
    assert(r.map(_.getAs[Long]("n_id")).toSeq == Seq(10L, 12L, 11L))
    // rank-1 score = floor(λ·rel·1e6) — no similarity penalty yet
    assert(r.head.getAs[Long]("score_ppm") == 450000L)
  }

  test("embeddingNearPairs auto blockBits: exact tier for small corpora, scaled bits above") {
    // 500 fixture vectors ≤ targetBucketSize → exact tier (bits 0):
    // auto must equal the explicit exact run
    val auto = Dedup.embeddingNearPairs(emb, "vec_id", "embedding",
      minCosine = 0.4, blockBits = -1).collect().toSet
    val exact = Dedup.embeddingNearPairs(emb, "vec_id", "embedding",
      minCosine = 0.4, blockBits = 0).collect().toSet
    assert(auto == exact && auto.nonEmpty)
    // above the target, auto must match the explicitly derived bits
    val autoSmallTarget = Dedup.embeddingNearPairs(emb, "vec_id", "embedding",
      minCosine = 0.4, blockBits = -1, targetBucketSize = 64).collect().toSet
    val explicit3 = Dedup.embeddingNearPairs(emb, "vec_id", "embedding",
      minCosine = 0.4, blockBits = 3).collect().toSet // ceil(log2(500/64)) = 3
    assert(autoSmallTarget == explicit3)
  }

  test("snapshotDiff: added/removed/changed/unchanged verdicts") {
    import spark.implicits._
    val o = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val n = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "text")
    val r = Dedup.snapshotDiff(o, n, "id", "text")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("rrfFuse: hand-computed reciprocal-rank scores and ordering") {
    import spark.implicits._
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q_id", "n_id", "rnk")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("q_id", "n_id", "rnk")
    val r = Similarity.rrfFuse(Seq(a, b), k = 5)
      .orderBy(col("rank")).collect()
    // y=11 in both lists wins: 1/62 + 1/61; then x=10 (1/61), z=12 (1/62)
    assert(r.map(_.getAs[Long]("n_id")).toSeq == Seq(11L, 10L, 12L))
    assert(r.map(_.getAs[Long]("rrf_ppm")).toSeq == Seq(32522L, 16393L, 16129L))
  }

  test("lshPlan: one chosen factorization with the minimal FP+FN area") {
    val rows = Dedup.lshPlan(spark, nPerm = 16, threshold = 0.5, grid = 200).collect()
    assert(rows.length == 5) // divisors of 16
    assert(rows.forall(r => r.getAs[Int]("bands") * r.getAs[Int]("rows_per_band") == 16))
    val chosen = rows.filter(_.getAs[Boolean]("chosen"))
    assert(chosen.length == 1)
    val best = chosen.head.getAs[Long]("score_ppb")
    assert(rows.forall(_.getAs[Long]("score_ppb") >= best))
    // extreme factorizations are never optimal at an interior threshold:
    // b=16,r=1 catches everything (FP-heavy), b=1,r=16 almost nothing
    val cb = chosen.head.getAs[Int]("bands")
    assert(cb != 1 && cb != 16, s"degenerate banding chosen: $cb")
  }

  test("minhash LSH finds the planted near-duplicates with high estimate") {
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.9).collect()
    assert(pairs.nonEmpty, "expected planted near-duplicate docs")
  }

  test("multimodal extraction is deterministic and schema-typed") {
    val withMedia = Multimodal.withMediaColumn(docs.limit(10), "doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, withMedia, "doc_id").collect()
    assert(feats.length == 10)
    assert(feats.forall(f => f.width >= 64 && f.height >= 64))
    assert(feats.forall(f => f.brightness >= 0 && f.brightness < 1))
    // dims are PARSED from header bytes; they must equal the synthesis
    // arithmetic — a wrong offset/endianness breaks this equality
    assert(feats.forall(f =>
      f.width == 64 + Math.floorMod(f.doc_id * 13, 577L).toInt &&
      f.height == 64 + Math.floorMod(f.doc_id * 7, 409L).toInt))
    assert(feats.forall(f => Set("png", "jpeg", "gif").contains(f.format)))
    val again = Multimodal.extractFeatures(spark, withMedia, "doc_id").collect()
    assert(feats.sortBy(_.doc_id).toSeq == again.sortBy(_.doc_id).toSeq)
  }

  test("kmeansSeedsFarthest spreads seeds where lowest-id seeds collapse") {
    import spark.implicits._
    def v(x: Float, y: Float, z: Float) = Array(x, y, z)
    // ids correlate with embedding-space position: the 4 lowest ids are
    // all within 0.01 of the x-axis pole — exactly the degeneracy the
    // verdict flagged for crawl-ordered corpora
    val rows = Seq(
      (0L, v(1f, 0f, 0f)), (1L, v(1f, 0.01f, 0f)), (2L, v(1f, 0f, 0.01f)),
      (3L, v(0.99f, 0f, 0f)),
      (10L, v(0f, 1f, 0f)), (11L, v(0.01f, 1f, 0f)),
      (20L, v(0f, 0f, 1f)), (21L, v(0f, 0.01f, 1f))).toDF("vec_id", "embedding")
    def d2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    // lowest-id seeds: pairwise squared distance < 0.01 — collapsed
    val low = rows.orderBy("vec_id").limit(3).collect()
      .map(_.getSeq[Float](1).toArray)
    assert(d2(low(0), low(1)) < 0.01 && d2(low(0), low(2)) < 0.01)
    // farthest-point seeds: one per orthogonal group (pairwise d2 ~ 2)
    val seeds = Similarity.kmeansSeedsFarthest(rows, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(seeds.length == 3)
    for (i <- 0 until 3; j <- i + 1 until 3)
      assert(d2(seeds(i)._2, seeds(j)._2) > 1.0,
        s"seeds ${seeds(i)._1} and ${seeds(j)._1} collapsed")
    // one seed per orthogonal group = three distinct dominant axes
    // (the returned ids are cluster ordinals, not source vec_ids)
    assert(seeds.map(_._2.zipWithIndex.maxBy(_._1)._2).toSet.size == 3,
      "expected one seed per orthogonal group")
    // deterministic across runs (no RNG anywhere in the traversal)
    val again = Similarity.kmeansSeedsFarthest(rows, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
    assert(seeds.map(t => (t._1, t._2.toSeq)).toSeq == again.toSeq)
    // fewer distinct points than k: stops early, returns what exists
    val tiny = Seq((1L, v(1f, 0f, 0f)), (2L, v(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.kmeansSeedsFarthest(tiny, "vec_id", "embedding", 5).count() == 2)
  }

  test("HeaderDecoder parses real container headers and degrades on malformed bytes") {
    import graft.ops.Multimodal.HeaderDecoder.parseHeader
    // golden fixtures: handcrafted headers with known dims (NOT produced
    // by synthesizeBlob, so synthesis and parsing can't share a bug)
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // sig
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 1, 0x2c, // width 300 big-endian
      0, 0, 0, 0xc8, // height 200 big-endian
      8, 2, 0, 0, 0, 0xde, 0xad, 0xbe, 0xef).map(_.toByte) ++ Array[Byte](7, 7)
    assert(parseHeader(png) == (("png", 300, 200, 33)))
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array(0x40, 0x01, 0x2c, 0x01, 0x00, 0x00, 0x00).map(_.toByte) // 320x300 LE, no GCT
    assert(parseHeader(gif) == (("gif", 320, 300, 13)))
    // GIF with a global color table: flags 0x91 → 2^(1+1)=4 entries = 12 bytes
    val gifGct = "GIF87a".getBytes("US-ASCII") ++
      Array(0x10, 0x00, 0x08, 0x00, 0x91, 0x00, 0x00).map(_.toByte) ++
      Array.fill[Byte](12)(0x33) ++ Array[Byte](1, 2)
    assert(parseHeader(gifGct) == (("gif", 16, 8, 25)))
    // JPEG: SOI + COM segment (scan must skip it) + SOF2 (progressive) + SOS
    val jpeg = Array(0xff, 0xd8, 0xff, 0xfe, 0x00, 0x04, 0x41, 0x42, // COM len 4
      0xff, 0xc2, 0x00, 0x0b, 8, 0x00, 0x96, 0x01, 0x90, 1, 1, 0x11, 0, // SOF2 150x400, 1 comp
      0xff, 0xda, 0x00, 0x08, 1, 1, 0, 0, 63, 0).map(_.toByte) ++ Array[Byte](9)
    assert(parseHeader(jpeg) == (("jpeg", 400, 150, 31)))
    // malformed: truncated PNG (sig only), JPEG without SOF, short GIF,
    // empty, and plain text
    assert(parseHeader(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))._1 == "png")
    assert(parseHeader(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))._2 == -1)
    assert(parseHeader(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) ==
      (("jpeg", -1, -1, 4)))
    assert(parseHeader("GIF89a".getBytes("US-ASCII")) == (("gif", -1, -1, 6)))
    assert(parseHeader(Array.empty[Byte]) == (("unknown", -1, -1, 0)))
    assert(parseHeader("hello world".getBytes("UTF-8")) == (("unknown", -1, -1, 0)))
    // synthesizeBlob round-trip at adversarial ids (0, negatives via
    // floorMod, large): parse(synthesize(id)) recovers the id-derived dims
    for (id <- Seq(0L, 1L, 2L, 576L, 12345678901L)) {
      val (fmt, w, h, off) = parseHeader(
        graft.ops.Multimodal.synthesizeBlob(id, "payload".getBytes("UTF-8")))
      assert(w == 64 + Math.floorMod(id * 13, 577L).toInt)
      assert(h == 64 + Math.floorMod(id * 7, 409L).toInt)
      val expFmt = Seq("png", "jpeg", "gif")(Math.floorMod(id, 3L).toInt)
      assert(fmt == expFmt)
      val expOff = Seq(33, 43, 13)(Math.floorMod(id, 3L).toInt)
      assert(off == expOff)
    }
  }

  test("WavDecoder parses RIFF chunk structure and degrades on malformed bytes") {
    import graft.ops.Multimodal.WavDecoder.parseWavHeader
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // golden fixture handcrafted (NOT via synthesizeWavBlob): stereo
    // 44100 Hz 16-bit, 8 payload bytes, with a JUNK chunk before fmt_
    // AND an odd-sized chunk (pad byte) so the scan's even-padding and
    // skip logic are both exercised
    val junk = "JUNK".getBytes("US-ASCII") ++ le32(3) ++
      Array[Byte](1, 2, 3, 0) // size 3 + pad to even
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
      le16(2) ++ le32(44100) ++ le32(44100L * 4) ++ le16(4) ++ le16(16)
    val data = "data".getBytes("US-ASCII") ++ le32(8) ++
      Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)
    val body = "WAVE".getBytes("US-ASCII") ++ junk ++ fmt ++ data
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
    val (f, ch, rate, bits, off, len) = parseWavHeader(wav)
    assert((f, ch, rate, bits, len) == (("wav", 2, 44100, 16, 8)))
    assert(off == wav.length - 8)
    // data size field larger than the real tail: length clamps
    val lying = "RIFF".getBytes("US-ASCII") ++ le32(100) ++
      "WAVE".getBytes("US-ASCII") ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(9999) ++ Array[Byte](1, 2, 3)
    assert(parseWavHeader(lying)._6 == 3)
    // malformed: RIFF without WAVE, bare magic, empty, text
    assert(parseWavHeader("RIFFxxxxAVI ".getBytes("US-ASCII"))._1 == "unknown")
    assert(parseWavHeader("RIFF".getBytes("US-ASCII"))._1 == "unknown")
    assert(parseWavHeader(Array.empty[Byte]) ==
      (("unknown", -1, -1, -1, 0, 0)))
    val noFmt = "RIFF".getBytes("US-ASCII") ++ le32(4) ++
      "WAVE".getBytes("US-ASCII")
    assert(parseWavHeader(noFmt) == (("wav", -1, -1, -1, noFmt.length, 0)))
    // synthesizeWavBlob round-trip at adversarial ids (incl. the
    // LIST-chunk path at id % 5 == 0 — a fixed-offset reader fails it)
    for (id <- Seq(0L, 1L, 2L, 5L, 7L, 12345678901L)) {
      val blob = graft.ops.Multimodal.synthesizeWavBlob(id,
        "payloadXY".getBytes("UTF-8"))
      val (f2, c2, r2, b2, _, l2) = parseWavHeader(blob)
      assert(f2 == "wav" && l2 == 9)
      assert(c2 == 1 + Math.floorMod(id, 2L).toInt)
      assert(r2 == 8000 + 100 * Math.floorMod(id * 17, 361L).toInt)
      assert(b2 == 8 + 8 * Math.floorMod(id, 3L).toInt)
    }
  }

  test("Mp4Decoder walks the real box tree and degrades on malformed bytes") {
    import graft.ops.Multimodal.{Mp4Decoder, synthesizeMp4Blob}
    // round-trip at adversarial ids, including the free/udta offset
    // shift at id % 5 == 0 (a fixed-offset reader fails it) and a
    // large id exercising floorMod
    for (id <- Seq(0L, 1L, 2L, 5L, 7L, 19L, 12345678901L)) {
      val blob = synthesizeMp4Blob(id, "framePayload".getBytes("UTF-8"))
      val f = Mp4Decoder.decode(id, blob)
      val fps = 12 + Math.floorMod(id, 19L)
      val nf = 24 + Math.floorMod(id * 7, 721L)
      assert(f.format == "mp4", s"id $id")
      assert(f.movie_timescale == 1000L)
      assert(f.duration_ms == nf * 1000L / fps)
      assert(f.width == 128 + Math.floorMod(id * 11, 1793L).toInt)
      assert(f.height == 72 + Math.floorMod(id * 5, 1009L).toInt)
      assert(f.fps_milli == fps * 1000L)
      assert(f.n_frames == nf)
      assert(f.n_bytes == blob.length)
    }
    def be32(v: Long) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // ftyp without moov: recognized container, all sentinels
    val bare = be32(16) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be32(0)
    val fb = Mp4Decoder.parseMp4Header(bare)
    assert(fb.format == "mp4" && fb.width == -1 && fb.n_frames == -1L)
    // lying child size: moov present, mvhd size field says 9999 —
    // the scan clamps to the buffer and the short body leaves -1s
    val lyingMvhd = be32(9999) ++ "mvhd".getBytes("US-ASCII") ++ be32(0)
    val lying = bare ++ be32(8L + lyingMvhd.length) ++
      "moov".getBytes("US-ASCII") ++ lyingMvhd
    val fl = Mp4Decoder.parseMp4Header(lying)
    assert(fl.format == "mp4" && fl.movie_timescale == -1L)
    // not an mp4 at all
    assert(Mp4Decoder.parseMp4Header("plain text here".getBytes).format
      == "unknown")
    assert(Mp4Decoder.parseMp4Header(Array.empty[Byte]).format == "unknown")
  }

  test("linkageScores: blocked pairs, weight sums, null-safe agreement") {
    import spark.implicits._
    val a = Seq((1L, "z1", "AUTO", Some(5L)), (2L, "z2", "BLDG", None))
      .toDF("id", "blk", "seg", "bal")
    val b = Seq((10L, "z1", "AUTO", Some(5L)),  // both agree  -> 4000
        (11L, "z1", "AUTO", Some(6L)),          // seg only    -> 300
        (12L, "z1", "FURN", Some(5L)),          // bal only    -> 1700
        (13L, "z2", "BLDG", None),              // null==null agrees -> 4000
        (14L, "z9", "AUTO", Some(5L)))          // other block -> no pair
      .toDF("id", "blk", "seg", "bal")
    val r = Dedup.linkageScores(a, b, "id", "blk",
        Seq(("seg", 1500L, -800L), ("bal", 2500L, -1200L)),
        minScoreMilli = Long.MinValue)
      .collect().map(x => ((x.getLong(0), x.getLong(1)),
        (x.getInt(2), x.getLong(3)))).toMap
    assert(r == Map(
      (1L, 10L) -> ((2, 4000L)), (1L, 11L) -> ((1, 300L)),
      (1L, 12L) -> ((1, 1700L)), (2L, 13L) -> ((2, 4000L))), r)
    // threshold prunes
    assert(Dedup.linkageScores(a, b, "id", "blk",
      Seq(("seg", 1500L, -800L), ("bal", 2500L, -1200L)),
      minScoreMilli = 1700L).count() == 3L)
    intercept[IllegalArgumentException] {
      Dedup.linkageScores(a, b, "id", "blk", Seq.empty, 0L)
    }
  }

  test("marginMinedPairsIvf with full probing equals the exact quadratic tier") {
    import spark.implicits._
    // nProbe == nClusters -> every anchor scores every candidate (the
    // candidate set is complete), so the IVF tier must emit EXACTLY
    // the exact tier's frame — the consistency anchor that pins the
    // composition's arithmetic independent of the recall trade
    val rnd = new scala.util.Random(244)
    def vec() = Array.fill(64)((rnd.nextInt(1000) / 1000.0).toFloat)
    val a = (0 until 30).map(i => (i * 2L, vec())).toDF("vec_id", "embedding")
    val b = (0 until 30).map(i => (i * 2L + 1, vec())).toDF("vec_id", "embedding")
    val exact = graft.ops.Similarity.marginMinedPairs(a, b,
        "vec_id", "embedding", k = 3, minMarginPpm = 900000L)
      .collect().map(_.toSeq).toSet
    val ivfFull = graft.ops.Similarity.marginMinedPairsIvf(a, b,
        "vec_id", "embedding", k = 3, minMarginPpm = 900000L,
        nClusters = 4, nProbe = 4, itersCoarse = 2)
      .collect().map(_.toSeq).toSet
    assert(ivfFull == exact, s"ivf=$ivfFull exact=$exact")
    // partial probing mines a SUBSET of anchors, never novel pairs
    // with inflated scores above the same threshold from thin air:
    // every emitted (a, b, cos) pair's cosine must match the exact
    // tier's score for that pair (margins can differ — neighborhoods
    // shrink — but the underlying similarity cannot)
    val allCos = a.select(col("vec_id").as("a_id"), col("embedding").as("av"))
      .crossJoin(b.select(col("vec_id").as("b_id"), col("embedding").as("bv")))
      .withColumn("cos_u6", floor(graft.expressions.TextHashes
        .dot_f(col("av"), col("bv")) * lit(1000000.0d)).cast("long"))
      .select(col("a_id"), col("b_id"), col("cos_u6"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ivf1 = graft.ops.Similarity.marginMinedPairsIvf(a, b,
        "vec_id", "embedding", k = 3, minMarginPpm = 900000L,
        nClusters = 4, nProbe = 1, itersCoarse = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(ivf1.nonEmpty)
    ivf1.foreach { case (pair, cos) =>
      assert(allCos(pair) == cos, s"$pair: $cos vs ${allCos(pair)}")
    }
  }

  test("linkageWeights: hand-computed m/u log-ratios, smoothing, degenerate-label guard") {
    import spark.implicits._
    val a = Seq((1L, "AUTO", 5L), (2L, "BLDG", 6L), (3L, "AUTO", 7L))
      .toDF("id", "seg", "bal")
    val b = Seq((10L, "AUTO", 5L), (11L, "FURN", 6L), (12L, "AUTO", 9L))
      .toDF("id", "seg", "bal")
    // labeled pairs: 2 matches, 2 non-matches
    //   (1,10) match:   seg agree, bal agree
    //   (3,12) match:   seg agree, bal disagree
    //   (2,11) nonmatch: seg disagree, bal agree
    //   (1,12) nonmatch: seg agree, bal disagree
    val lab = Seq((1L, 10L, true), (3L, 12L, true),
      (2L, 11L, false), (1L, 12L, false))
      .toDF("a_id", "b_id", "is_match")
    val w = Dedup.linkageWeights(a, b, "id", lab, Seq("seg", "bal"))
      .map { case (f, wa, wd) => f -> ((wa, wd)) }.toMap
    // seg: m = (2+0.5)/3, u = (1+0.5)/3; bal: m = (1+0.5)/3, u same
    def fl(x: Double) = math.floor(x * 1000.0).toLong
    val mSeg = 2.5 / 3.0; val uSeg = 1.5 / 3.0
    val mBal = 1.5 / 3.0; val uBal = 1.5 / 3.0
    assert(w("seg") == ((fl(math.log(mSeg / uSeg)),
      fl(math.log((1 - mSeg) / (1 - uSeg))))), w)
    assert(w("bal") == ((fl(math.log(mBal / uBal)),
      fl(math.log((1 - mBal) / (1 - uBal))))), w)
    // learned weights feed linkageScores directly: seg-agree beats
    // seg-disagree in the learned model (mSeg > uSeg)
    assert(w("seg")._1 > 0 && w("seg")._2 < 0, w)
    assert(w("bal")._1 == 0 && w("bal")._2 == 0, w) // uninformative field
    intercept[IllegalArgumentException] {
      Dedup.linkageWeights(a, b, "id",
        Seq((1L, 10L, true)).toDF("a_id", "b_id", "is_match"), Seq("seg"))
    }
  }
}
