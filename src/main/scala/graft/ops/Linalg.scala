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
}
