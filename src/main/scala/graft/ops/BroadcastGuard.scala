package graft.ops

import org.apache.spark.sql.SparkSession

/** Shared sizing guard for the measured-size broadcast pattern the
  * iterative graph/dedup loops use (opt guide §3.1): a loop-built
  * (checkpointed) frame carries no stats, so the planner would default
  * every per-round join to a sort-merge reshuffle of the big side; the
  * ops measure the small side ONCE (a bounded count amortized over all
  * rounds) and broadcast it only while the estimate fits the session
  * `autoBroadcastJoinThreshold` — past it the shuffled plan is kept
  * byte-for-byte, so cluster-scale posture is unchanged.
  *
  * Centralized (r17 ADVICE): the threshold parse and the sizing
  * arithmetic were copy-pasted across 14 sites with drifting constants,
  * and every site parsed the conf with `.toLong` — Spark accepts
  * byte-size strings ("10MB", "10m") for this conf, which would have
  * thrown NumberFormatException on any session that sets a unit suffix.
  */
private[graft] object BroadcastGuard {
  /** Conservative bytes/row for frames of a few longs (node ids,
    * counts). Spark's own broadcast estimate for a 2-long row is ~28 B;
    * 64 leaves ~2x headroom for object overhead in the built relation. */
  val RowBytesNarrow = 64L

  /** Frames carrying a short string column (labels) on top of the
    * longs — the modularity/label shapes. */
  val RowBytesLabeled = 96L

  /** The session broadcast threshold in bytes. Accepts both the raw
    * numeric form the repo's entry points set and Spark's unit-suffixed
    * byte strings; a disabled threshold (-1/0) or an unparseable value
    * falls back to never-broadcast / the 10 MB default respectively. */
  def thresholdBytes(spark: SparkSession): Long = {
    val raw = spark.conf
      .get("spark.sql.autoBroadcastJoinThreshold", (10L << 20).toString)
      .trim
    // JavaUtils rejects a leading sign, but Spark's own conf parser
    // (ConfigHelpers.byteFromString) strips it first — "-1" must keep
    // meaning "broadcast disabled", exactly like the planner reads it
    val (body, sign) =
      if (raw.startsWith("-")) (raw.substring(1), -1L) else (raw, 1L)
    try sign * org.apache.spark.network.util.JavaUtils.byteStringAsBytes(body)
    catch { case _: IllegalArgumentException | _: NumberFormatException =>
      10L << 20 }
  }

  /** True when `rows` rows at `rowBytes` each fit the session broadcast
    * threshold (strict <, matching the planner's own comparison). */
  def fits(spark: SparkSession, rows: Long, rowBytes: Long): Boolean =
    rows * rowBytes < thresholdBytes(spark)
}
