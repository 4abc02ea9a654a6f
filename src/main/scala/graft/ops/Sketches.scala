package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch as a relational program (Cormode & Muthukrishnan
  * 2005; reference counterpart: the frequency-sketch layer next to
  * SURVEY §2.4's approx-distinct rows — Spark ships `count_min_sketch`
  * as an opaque binary agg, but its seeded murmur hashes cannot be
  * replayed by an external oracle, so this implementation uses an
  * explicit pairwise-independent hash family that both Spark and DuckDB
  * evaluate bit-identically).
  *
  * The sketch IS a DataFrame: (j, bucket, cnt) with j < depth,
  * bucket < width — at most depth·width rows regardless of input size.
  * Construction is explode(depth)→groupBy, a single map-side-combined
  * shuffle whose combined output is bounded by tasks·depth·width, and
  * sketches MERGE by unioning and re-summing (SketchSpec proves
  * shard-merge ≡ whole-corpus build). Estimation joins probes against
  * the sketch — a broadcast by construction (the sketch is tiny) — and
  * takes min over j; estimates never undercount, overcount bounded by
  * e·N/width with probability 1 − e^(−depth).
  *
  * Hash family: h_j(x) = ((a_j·(x mod p) + b_j) mod p) mod width with
  * p = 2^31 − 1 (Mersenne) and a_j, b_j fixed affine functions of j.
  * Reducing x mod p FIRST keeps every product under 2^62 — no int64
  * overflow for any long key (the [[Corpus.hashBucket]] lesson). Keys
  * must be non-negative integral (`pmod` guards the residue).
  */
object Sketches {

  private val P = 2147483647L // 2^31 - 1

  private def aj(j: Int): Long = (2654435761L * (j + 1)) % P
  private def bj(j: Int): Long = (40503L * (j + 1) * (j + 1) + 7L) % P

  private def bucketExpr(key: Column, j: Int, width: Int): Column =
    pmod(pmod(lit(aj(j)) * pmod(key.cast("long"), lit(P)) + lit(bj(j)),
      lit(P)), lit(width))

  /** Build the (j, bucket, cnt) sketch frame for `key` occurrences
    * (optionally weighted by `weight`, the turnstile form).
    */
  def cmsBuild(df: DataFrame, key: String, depth: Int, width: Int,
      weight: Option[String] = None): DataFrame = {
    require(depth > 0 && width > 0, "need depth > 0 and width > 0")
    val rows = (0 until depth).map(j =>
      struct(lit(j).as("j"), bucketExpr(col(key), j, width).as("bucket")))
    // the weight column must survive the explode projection — selecting
    // only (key, e) dropped it and sum() failed to resolve (ADVICE r7)
    val exploded = df.select(
      col(key) +: weight.map(c => col(c).as("__w")).toSeq :+
        explode(array(rows: _*)).as("e"): _*)
    val w = weight.map(_ => sum(col("__w")).as("cnt"))
      .getOrElse(count(lit(1)).as("cnt"))
    exploded
      .groupBy(col("e.j").as("j"), col("e.bucket").as("bucket"))
      .agg(w)
  }

  /** Merge sketches built with the same (depth, width): union + re-sum.
    * Counts are additive per cell, the defining CMS property.
    */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("j"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /** Point-query `probes`' `key` column against a sketch: estimate =
    * min over j of the key's bucket count (0 when the bucket is empty —
    * keys never inserted estimate 0 unless every row collides).
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, key: String,
      depth: Int, width: Int, as: String = "cms_est"): DataFrame = {
    val rows = (0 until depth).map(j =>
      struct(lit(j).as("j"), bucketExpr(col(key), j, width).as("bucket")))
    probes.select(col(key), explode(array(rows: _*)).as("e"))
      .select(col(key), col("e.j").as("j"), col("e.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col(key))
      .agg(min(coalesce(col("cnt"), lit(0L))).as(as))
  }
}
