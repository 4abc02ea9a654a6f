package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.TextHashes._

/** Similarity search over an embedding column (M6c; the reference
  * delegates this to cuml/raft out-of-repo — here it's a first-class
  * operator set).
  *
  * Three tiers, all shuffle-based:
  *  1. [[bruteForceTopK]] — exact: broadcast the (small) query set
  *     against the corpus, codegen'd dot product, per-query top-k via
  *     TakeOrdered-style window. Scales linearly in corpus size: the
  *     corpus is never shuffled, only scanned.
  *  2. [[lshTopK]] — approximate: join queries to corpus on a signed
  *     random-projection bucket (RandomProjectionBits expression), then
  *     top-k within bucket. At 100 TB the bucket column is also the
  *     natural parquet partition/bucketing key, turning ANN into a
  *     partition-pruned scan.
  *  3. [[ivfTopK]] — approximate: coarse quantizer = per-cluster
  *     centroids (tiny, broadcast); queries probe their nearest
  *     `nProbe` clusters and search only those corpus slices.
  */
object Similarity {

  /** Exact top-k neighbors by dot product (cosine for unit vectors).
    * `queries` must be broadcast-small (the usual ANN asymmetry).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("q_id"), col(vec).as("q_vec"))
    val scored = corpus.select(col(id).as("n_id"), col(vec).as("n_vec"))
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", dot_f(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("cos"), 6).as("cos"))
  }

  /** Bucket assignment for the LSH tier (exposed for audits/bench). */
  def withBucket(df: DataFrame, vec: String, nBits: Int = 8): DataFrame =
    df.withColumn("bucket", rp_bits(col(vec), nBits))

  /** Approximate top-k: candidates restricted to the query's RP bucket.
    * Recall is tunable via nBits (fewer bits → bigger buckets → higher
    * recall, more compute).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, k: Int, nBits: Int = 8): DataFrame = {
    val c = withBucket(corpus, vec, nBits)
      .select(col(id).as("n_id"), col(vec).as("n_vec"), col("bucket"))
    val q = withBucket(queries, vec, nBits)
      .select(col(id).as("q_id"), col(vec).as("q_vec"), col("bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", dot_f(col("q_vec"), col("n_vec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("cos"), 6).as("cos"))
  }

  /** Per-cluster mean vectors (float), computed distributed: explode to
    * (cluster, pos, v), average, re-assemble. Result is #clusters × dim —
    * broadcast-small by construction.
    */
  private def centroidMeans(assigned: DataFrame, vec: String): DataFrame =
    assigned
      .select(col("cl"), posexplode(col(vec)).as(Seq("pos", "v")))
      .groupBy(col("cl"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("cl"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cl"), transform(col("pm"), p => p.getField("m").cast("float")).as("c_vec"))

  /** Nearest-centroid assignment: argmax dot product against the (tiny)
    * centroid set, ties → lowest cluster id. Returns (id, vec, cl).
    *
    * The centroid table is collected (k × dim floats — driver-trivial
    * by the coarse-quantizer contract) and broadcast as a VARIABLE, and
    * the whole argmax runs inside one UDF per corpus row: a zero-
    * shuffle, zero-row-expansion map stage. Two earlier formulations
    * measured progressively worse at 100×: a row_number window over the
    * N×k broadcast-join expansion shuffled N×k rows (~190 GB/iter at
    * k=3175), and a map-side max(struct) still paid the N×k BNLJ row
    * materialization (~80 s/iter at k=448 — the dominant cost, since
    * the per-expanded-row join machinery is ~10× a fused dot product).
    * The UDF loop is the shape a native engine uses: k fused dots per
    * row, nothing allocated, nothing joined. Scores replay dot_f's
    * index-order float→double accumulation exactly, so the winner is
    * bit-identical to the expression path the oracles replay.
    */
  def kmeansAssign(df: DataFrame, id: String, vec: String,
      centroids: DataFrame): DataFrame = {
    val cents: Array[(Long, Array[Float])] = centroids
      .select(col("cl").cast("long"), col("c_vec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val bc = df.sparkSession.sparkContext.broadcast(cents)
    val assignUdf = udf { (v: Seq[Float]) =>
      val cs = bc.value
      val vl = v.length
      var best = 0L; var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < cs.length) {
        val c = cs(j)._2
        val n = math.min(vl, c.length)
        var s = 0.0; var i = 0
        while (i < n) { s += v(i).toDouble * c(i).toDouble; i += 1 }
        // strict > keeps the FIRST maximum; cs is sorted by cl, so ties
        // resolve to the lowest cluster id (the window's tie-break)
        if (s > bestScore) { bestScore = s; best = cs(j)._1 }
        j += 1
      }
      best
    }
    df.select(col(id), col(vec), assignUdf(col(vec)).as("cl"))
  }

  /** Learned coarse quantizer: deterministic shuffle-based k-means.
    * Seeds = the k lowest-id vectors (no RNG — reproducible across runs
    * and engines); a FIXED iteration count, each round one broadcast
    * join (assign) + one aggregation (recompute means) — no driver-side
    * data, no convergence collect. Centroids are localCheckpoint'ed per
    * round so the iteration does not nest Catalyst plans. At 100 TB the
    * corpus is scanned once per round; k and dim stay driver-trivial.
    */
  def kmeansCentroids(corpus: DataFrame, id: String, vec: String,
      k: Int, iters: Int = 3): DataFrame = {
    val wSeed = Window.orderBy(col(id))
    var cents = corpus.orderBy(col(id)).limit(k)
      .select((row_number().over(wSeed) - 1).cast("long").as("cl"), col(vec).as("c_vec"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      cents = centroidMeans(kmeansAssign(corpus, id, vec, cents), vec)
        .localCheckpoint(true)
    }
    cents
  }

  /** IVF with a LEARNED coarse quantizer: k-means centroids → assign the
    * corpus → probe-and-search via [[ivfTopK]]. The end-to-end ANN a
    * user calls when no partition column exists.
    */
  def ivfTopKLearned(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int, nClusters: Int, nProbe: Int = 2,
      iters: Int = 3): DataFrame = {
    val cents = kmeansCentroids(corpus, id, vec, nClusters, iters)
    ivfTopK(kmeansAssign(corpus, id, vec, cents), queries, id, vec, "cl", k, nProbe)
  }

  /** IVF-style search with a provided coarse partition (cluster column):
    * centroids = per-cluster mean vector (computed distributed, result is
    * broadcast-small); each query probes its nProbe nearest centroids and
    * searches only those clusters.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
      cluster: String, k: Int, nProbe: Int = 2): DataFrame = {
    // centroids: explode to (cluster, pos, v), average, re-assemble —
    // all shuffle-side; the result is #clusters × dim, tiny
    val centroids = corpus
      .select(col(cluster).as("cl"), posexplode(col(vec)).as(Seq("pos", "v")))
      .groupBy(col("cl"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("cl"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cl"), transform(col("pm"), p => p.getField("m").cast("float")).as("c_vec"))

    val qc = queries.select(col(id).as("q_id"), col(vec).as("q_vec"))
      .join(broadcast(centroids))
      .withColumn("c_dist", dot_f(col("q_vec"), col("c_vec")))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("c_dist").desc, col("cl").asc)
    val probes = qc.withColumn("p", row_number().over(wProbe)).filter(col("p") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("cl"))

    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    corpus.select(col(id).as("n_id"), col(vec).as("n_vec"), col(cluster).as("cl"))
      .join(broadcast(probes), Seq("cl"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", dot_f(col("q_vec"), col("n_vec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("cos"), 6).as("cos"))
  }
}
