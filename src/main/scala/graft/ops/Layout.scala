package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB write path.
  *
  * Parquet data skipping is min/max-stat based: a scan prunes a file or
  * row group when the predicate falls outside its stats. A single-column
  * sort gives perfect stats on one dimension and useless stats on every
  * other; Z-ORDERING (interleaving the bits of two sort keys) gives each
  * file a small rectangle of the 2-d key space, so selective predicates
  * on EITHER (or both) dimensions touch few files. This is the layout
  * trick behind Delta/Iceberg `OPTIMIZE ZORDER BY` — here as a plain
  * column expression + repartitionByRange, nothing engine-private.
  *
  * All arithmetic is integer bit-twiddling (the classic parallel
  * bit-spread), so the DuckDB oracle replays it exactly.
  */
object Layout {

  /** Spread the low 16 bits of `x` into the even bit positions of a
    * 32-bit word (0b1111 → 0b01010101).
    */
  private def spread(x: Column): Column = {
    val v0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton/Z value of two 16-bit keys: bits of `a` at even positions,
    * bits of `b` at odd ones. Keys wider than 16 bits should be
    * quantized (rank-bucketed) first; values ≤ 65535 pass through.
    */
  def zValue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Write-side helper: cluster `df` into `nFiles` range partitions of
    * the Z value of (`a`, `b`), sorted within each, so every output
    * file covers a compact rectangle of the 2-d key space and parquet
    * min/max stats prune on both dimensions. One range shuffle — the
    * same cost as any global sort-before-write.
    */
  def zOrderBy(df: DataFrame, a: Column, b: Column, nFiles: Int): DataFrame = {
    val z = zValue(a, b)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Hilbert value of two 16-bit keys — the locality-tighter sibling of
    * [[zValue]]: consecutive curve positions are ALWAYS 4-adjacent grid
    * cells (the Z curve jumps at every power-of-two boundary), so range
    * partitions of the Hilbert index tile the key space into compact,
    * never-split squares and each file's min/max stats box is tighter.
    * Delta Lake moved its OPTIMIZE clustering from Z-order to Hilbert
    * for exactly this. Computed by a codegen'd 16-level
    * quadrant-rotation expression
    * ([[graft.expressions.HilbertIndex]]) — a column fold would blow
    * up the expression tree exponentially across levels. Keys wider
    * than 16 bits should be quantized (rank-bucketed) first.
    */
  def hValue(a: Column, b: Column): Column =
    graft.expressions.TextHashes.hilbert_index(a, b)

  /** Write-side helper: [[zOrderBy]] with the Hilbert index as the
    * clustering key — same one-range-shuffle cost, tighter per-file
    * stat boxes under two-dimensional predicates.
    */
  def hilbertOrderBy(df: DataFrame, a: Column, b: Column,
      nFiles: Int): DataFrame = {
    df.withColumn("__h", hValue(a, b))
      .repartitionByRange(nFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }

  /** CLUSTERING DEPTH of a written layout — the layout-quality number
    * data-layout maintenance decides on (the lakehouse "clustering
    * depth" / min-max overlap metric): per file the [min, max]
    * interval of the clustering key, then the maximum number of file
    * intervals covering any single point. A key-range-partitioned
    * layout has depth ≤ 2 (only boundary values shared); a round-robin
    * layout has depth = nFiles (every file spans the whole range and
    * every point probe reads everything). Depth is exactly the number
    * of files a point-lookup's min-max pruning CANNOT skip — when it
    * drifts up after appends, it is time to re-cluster ([[zOrderBy]] /
    * [[hilbertOrderBy]]).
    *
    * Computed by the classic sweep: +1 at each interval open, −1 after
    * each close, sorted by (x, open-before-close) so CLOSED intervals
    * sharing a boundary count as overlapping; the running-sum max is
    * the depth. The sweep frame is 2 rows per FILE — bounded by file
    * count, not data — so the single-partition window is bounded by
    * construction (spec-gated: file splits are engine-private, no
    * cross-engine oracle can exist).
    *
    * NULL keys (r15 ADVICE item 3): min/max ignore NULLs, so a file's
    * interval covers its NON-NULL values — files with partial NULLs
    * participate with that interval (correct: min-max pruning for a
    * point lookup consults exactly those stats), while all-NULL files
    * have no interval at all, are EXCLUDED from the sweep, and are
    * reported separately as `n_null_files` (a point probe on the key
    * skips them via null-count stats; counting them in n_files would
    * understate depth/n_files density).
    *
    * @return one row: (n_files, n_null_files, max_depth)
    */
  def clusteringDepth(spark: org.apache.spark.sql.SparkSession,
      path: String, keyCol: String): DataFrame = {
    val files = spark.read.parquet(path)
      .groupBy(input_file_name().as("__f"))
      .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"))
    val nullFiles = files.filter(col("lo").isNull)
      .agg(count(lit(1)).as("n_null_files"))
    val bounds = files.filter(col("lo").isNotNull)
      .select(explode(array(
        struct(col("lo").as("x"), lit(1).as("d")),
        struct(col("hi").as("x"), lit(-1).as("d")))).as("e"))
      .select(col("e.x").as("x"), col("e.d").as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("x").asc, col("d").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    bounds.withColumn("depth", sum(col("d")).over(w))
      .agg((count(lit(1)) / 2).cast("long").as("n_files"),
        coalesce(max(col("depth")), lit(0)).as("max_depth"))
      .crossJoin(nullFiles)
      .select(col("n_files"), col("n_null_files"), col("max_depth"))
  }
}
