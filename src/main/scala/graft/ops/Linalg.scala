package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed dense-vector linear algebra for embedding pipelines.
  *
  * SemDeDup-style semantic dedup and ANN recall both improve when the
  * embedding space is centered/whitened first; the distributed piece of
  * that is the Gramian / scatter matrix X^T X — a d×d (trivially
  * driver-sized for d ≤ a few thousand) summary of an arbitrarily large
  * vector table. The reference has no linalg surface (cuml does) —
  * beyond-reference capability in the same spirit as the ANN tiers in
  * [[Similarity]].
  *
  * 100 TB posture: one scan; each task folds its rows into a LOCAL
  * d(d+1)/2 long array and emits exactly one array per partition, so
  * the shuffle carries numPartitions × d²/2 longs — independent of row
  * count (the classic map-side-combined Gramian). Products are
  * floor-quantized to micro-units BEFORE summation, making the result
  * a 64-bit integer sum that any engine reproduces bit-for-bit
  * regardless of association order (the [[Graph.pageRankPpb]] /
  * bm25 basis-point trick applied to linalg).
  */
object Linalg {

  /** Upper-triangle Gramian of a float-vector column in integer
    * micro-units: g_micro(i, j) = Σ_rows floor(x_i · x_j · 1e6),
    * 0-based i ≤ j. Overflow headroom: |x|≤1e3 ⇒ per-row ≤ 1e12;
    * ~9e6 rows per long of headroom — plenty past 100 TB for unit-norm
    * embeddings (|x|≤1 ⇒ per-row ≤ 1e6 ⇒ 9e12 rows).
    */
  def gramianMicro(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 4096, s"dim must be in [1, 4096], got $dim")
    val spark = df.sparkSession
    val tri = dim * (dim + 1) / 2
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("part_micro", LongType, nullable = false)))
    val vecs = df.select(col(vecCol).cast("array<float>").as("v"))
    val rows = vecs.rdd.mapPartitions { it =>
      val acc = new Array[Long](tri)
      var any = false
      while (it.hasNext) {
        val a = it.next().getSeq[Float](0)
        if (a != null) {
          any = true
          var i = 0
          var idx = 0
          while (i < dim) {
            val xi = a(i).toDouble
            var j = i
            while (j < dim) {
              acc(idx) += math.floor(xi * a(j).toDouble * 1e6).toLong
              idx += 1
              j += 1
            }
            i += 1
          }
        }
      }
      if (!any) Iterator.empty
      else {
        var i = 0
        var idx = 0
        val out = new Array[Row](tri)
        while (i < dim) {
          var j = i
          while (j < dim) {
            out(idx) = Row(i, j, acc(idx))
            idx += 1
            j += 1
          }
          i += 1
        }
        out.iterator
      }
    }
    spark.createDataFrame(rows, schema)
      .groupBy(col("i"), col("j"))
      .agg(sum(col("part_micro")).as("g_micro"))
  }

  /** Column means of a float-vector column in integer micro-units:
    * (i, sum_micro, n) — pair with [[gramianMicro]] to form the exact
    * covariance on the driver. Same one-scan, partition-local shape.
    */
  def columnSumsMicro(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1 && dim <= 4096, s"dim must be in [1, 4096], got $dim")
    df.select(posexplode(col(vecCol).cast("array<float>")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(sum(floor(col("x").cast("double") * 1e6).cast("long")).as("sum_micro"),
        count(lit(1)).as("n"))
  }

  /** Driver-side top eigenvector of a gramianMicro result via power
    * iteration (deterministic: fixed start vector 1/√d, fixed iteration
    * count). The input is d×d — bounded driver work, exactly like the
    * k-means centroid collect in [[Similarity]]. Returns the unit
    * eigenvector and its Rayleigh quotient (in original units).
    */
  def topEigen(gram: DataFrame, dim: Int, iterations: Int = 30): (Array[Double], Double) = {
    val g = Array.ofDim[Double](dim, dim)
    gram.select("i", "j", "g_micro").collect().foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val v = r.getLong(2) / 1e6
      g(i)(j) = v
      g(j)(i) = v
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim))
    var it = 0
    while (it < iterations) {
      val w = Array.tabulate(dim)(i => {
        var s = 0.0
        var j = 0
        while (j < dim) { s += g(i)(j) * v(j); j += 1 }
        s
      })
      val n = math.sqrt(w.map(x => x * x).sum)
      v = if (n == 0.0) v else w.map(_ / n)
      it += 1
    }
    val rayleigh = {
      var s = 0.0
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { s += v(i) * g(i)(j) * v(j); j += 1 }
        i += 1
      }
      s
    }
    (v, rayleigh)
  }

  /** Project a vector column onto a (broadcast) orthonormal basis:
    * adds `outCol` = Array(basis_k · x). Pure map — no shuffle; the
    * serving-side companion of [[topEigen]] for PCA-reduced ANN.
    */
  def projectTo(df: DataFrame, vecCol: String, basis: Seq[Array[Double]],
      outCol: String = "proj"): DataFrame = {
    val spark = df.sparkSession
    val b = spark.sparkContext.broadcast(basis.map(_.clone).toArray)
    val fn = udf { (a: Seq[Float]) =>
      if (a == null) null
      else b.value.map { e =>
        var s = 0.0
        var i = 0
        val n = math.min(e.length, a.length)
        while (i < n) { s += e(i) * a(i); i += 1 }
        s
      }
    }
    df.withColumn(outCol, fn(col(vecCol).cast("array<float>")))
  }

  /** Top eigenvector by INTEGER power iteration in milli-units — the
    * hash-gateable tier of [[topEigen]]: start v ≡ 1000, each round
    * w = G·v exactly in 64-bit integers over the micro-unit Gramian,
    * then rescale v ← trunc(w·1000 / max|w|) with division TRUNCATING
    * toward zero (Scala `/`; an engine whose `//` floors must
    * sign-split — the oracle does). Every step is exact integer
    * arithmetic, so any engine replays the vector bit-for-bit; the
    * direction converges to [[topEigen]]'s (milli resolution) and the
    * deterministic all-positive start pins the sign.
    *
    * The d×d collect is the same bounded-driver-work class as
    * [[topEigen]] / the k-means centroids. Overflow bound:
    * |w_i| ≤ d·max|G|·1000 and the rescale multiplies by 1000 more —
    * keep d·max|G| under ~9e12 (micro-unit Gramians of ~1e9 rows at
    * |x|≤1; re-quantize coarser beyond).
    */
  def topEigenMilli(gram: DataFrame, dim: Int, iterations: Int = 6): Array[Long] = {
    require(iterations >= 1 && iterations <= 30,
      s"iterations must be in [1, 30], got $iterations")
    val g = Array.ofDim[Long](dim, dim)
    gram.select("i", "j", "g_micro").collect().foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      g(i)(j) = r.getLong(2)
      g(j)(i) = r.getLong(2)
    }
    var v = Array.fill(dim)(1000L)
    var it = 0
    while (it < iterations) {
      val w = Array.tabulate(dim) { i =>
        var s = 0L
        var j = 0
        while (j < dim) { s += g(i)(j) * v(j); j += 1 }
        s
      }
      val m = w.map(math.abs).max
      if (m == 0L) it = iterations // zero Gramian: keep v, stop
      else { v = w.map(x => x * 1000L / m); it += 1 }
    }
    v
  }

  /** Exact integer PCA projection: proj = Σ_i floor(x_i·1e6) · v_i
    * with `v` from [[topEigenMilli]] — one codegen'd map-only
    * expression (micro·milli units), no shuffle, hash-gateable.
    */
  def projectMicroMilli(df: DataFrame, vecCol: String, v: Array[Long],
      outCol: String = "proj"): DataFrame = {
    val x = col(vecCol).cast("array<float>")
    val terms = v.indices.map { i =>
      floor(x.getItem(i).cast("double") * 1e6).cast("long") * lit(v(i))
    }
    df.withColumn(outCol, terms.reduce(_ + _))
  }

  /** Top-r eigenpairs of the micro-unit Gramian by SUBSPACE iteration
    * (block power method with per-round Gram–Schmidt
    * re-orthogonalization — more robust than sequential deflation when
    * eigenvalues cluster). Driver-side doubles over the d×d collect —
    * the same bounded-work class as [[topEigen]]; eigenvalues come out
    * in the ORIGINAL value scale (the Gramian's micro units ÷ 1e6).
    *
    * Deterministic for a given JVM (fixed coordinate-basis start,
    * fixed iteration count) but double-valued — so it ships with
    * [[pcaWhitenCheck]]'s SELF-PROVING gate rather than a bit-exact
    * oracle (the q209b HyperBall discipline: exact integers cross
    * engines, the float tier is verified by within-bound flags the
    * oracle restates as literal 1s).
    */
  def topEigenK(gram: DataFrame, dim: Int, r: Int,
      iterations: Int = 200): (Seq[Array[Double]], Array[Double]) = {
    require(r >= 1 && r <= dim, s"need 1 <= r <= dim, got $r (dim $dim)")
    val g = Array.ofDim[Double](dim, dim)
    gram.select("i", "j", "g_micro").collect().foreach { row =>
      val (i, j) = (row.getInt(0), row.getInt(1))
      val v = row.getLong(2) / 1e6
      g(i)(j) = v
      g(j)(i) = v
    }
    def matVec(x: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var s = 0.0; var j = 0
        while (j < dim) { s += g(i)(j) * x(j); j += 1 }
        s
      }
    // fixed deterministic start: the first r coordinate basis vectors
    var basis = Array.tabulate(r)(k =>
      Array.tabulate(dim)(i => if (i == k) 1.0 else 0.0))
    var it = 0
    while (it < iterations) {
      val w = basis.map(matVec)
      // modified Gram–Schmidt
      var k = 0
      while (k < r) {
        var p = 0
        while (p < k) {
          var dot = 0.0; var i = 0
          while (i < dim) { dot += w(p)(i) * w(k)(i); i += 1 }
          i = 0
          while (i < dim) { w(k)(i) -= dot * w(p)(i); i += 1 }
          p += 1
        }
        val n = math.sqrt(w(k).map(x => x * x).sum)
        // a collapsed direction restarts on a fresh coordinate axis
        if (n < 1e-12) {
          var i = 0
          while (i < dim) { w(k)(i) = if (i == (k + it) % dim) 1.0 else 0.0; i += 1 }
        } else {
          var i = 0
          while (i < dim) { w(k)(i) /= n; i += 1 }
        }
        k += 1
      }
      basis = w
      it += 1
    }
    val lambda = basis.map { v =>
      val gv = matVec(v)
      var s = 0.0; var i = 0
      while (i < dim) { s += v(i) * gv(i); i += 1 }
      s
    }
    (basis.toSeq, lambda)
  }

  /** PCA WHITENING with a self-proving gate — the op [[gramianMicro]]'s
    * scaladoc promises ("PCA-whitening prep", completed): project every
    * vector onto the top-r eigenbasis scaled by √n/√λ_k (the √n keeps
    * whitened coordinates O(1), so the micro-floor truncation in the
    * verification Gramian stays at 1e-6 RELATIVE noise instead of
    * drowning the ~1/n raw products), so the whitened table's Gramian
    * is n·I on the retained block — then
    * VERIFY exactly that, in Spark, with the exact integer
    * [[gramianMicro]] over the whitened vectors. Emitted rows are the
    * r(r+1)/2 upper-triangle flags
    *
    *   ok = |G_white(i, j) / n − δ_ij| ≤ tol
    *
    * plus each component's spectrum-order flag (λ_k ≥ λ_{k+1}) — the
    * oracle restates them as literal 1s, so ONE broken eigenvector,
    * wrong λ scale, or non-orthogonal pair reddens the gate (the q209b
    * within-bound-flag discipline; the double-valued basis itself
    * never crosses engines).
    *
    * Components with λ ≤ λ_1·1e-9 (numerical rank deficiency) are
    * excluded from whitening — whitening a null direction divides by
    * ~0; the retained block shrinks accordingly.
    *
    * 100 TB posture: two scans (Gramian, whitened Gramian) + one
    * map-only projection; everything else is driver-side d×d.
    *
    * @return (i, j, g_white_ppm — the whitened Gramian entry ÷ n in
    *         ppm as a diagnostic, ok_identity, ok_order)
    */
  def pcaWhitenCheck(df: DataFrame, vecCol: String, dim: Int, r: Int,
      iterations: Int = 200, tol: Double = 0.05): DataFrame = {
    val spark = df.sparkSession
    val gram = gramianMicro(df, vecCol, dim)
    val (basis, lambda) = topEigenK(gram, dim, r, iterations)
    val n = df.filter(col(vecCol).isNotNull).count()
    require(n > 0, "empty vector table")
    val keep = lambda.zipWithIndex.filter { case (l, _) =>
      l > math.max(lambda.head, 0.0) * 1e-9 && l > 0.0
    }.map(_._2)
    val white = keep.map(k =>
      basis(k).map(_ * math.sqrt(n.toDouble) / math.sqrt(lambda(k))))
    val rw = white.length
    val projected = projectTo(df.filter(col(vecCol).isNotNull), vecCol,
      white.toSeq, "w")
      .select(col("w").cast("array<float>").as("w"))
    val gw = gramianMicro(projected, "w", rw)
      .withColumn("g_white_ppm",
        expr(s"(g_micro div ${n}L)"))
      .withColumn("ok_identity",
        (abs(col("g_micro").cast("double") / 1e6 / n.toDouble -
          when(col("i") === col("j"), 1.0).otherwise(0.0)) <= tol)
          .cast("int"))
    val orderOk = keep.indices.map { k =>
      if (k + 1 >= rw) 1 else if (lambda(keep(k)) >= lambda(keep(k + 1))) 1 else 0
    }
    import spark.implicits._
    val orderDf = keep.indices.map(k => (k, orderOk(k)))
      .toDF("i", "ok_order")
    gw.join(orderDf, Seq("i"))
      .select(col("i"), col("j"), col("g_white_ppm"),
        col("ok_identity"), col("ok_order"))
  }
}
