// Round-14 wave-3 scale receipts: eval/cleaning/incremental ops
// (q286-q290) at 20M rows.
//  1. thresholdReport / thresholdReportBy at 20M: ONE scan into
//     4*|ladder| conditional sums (global and per-5-cohorts) -- wall
//     must read like a scan either way.
//  2. robustZscoreBy at 20M x 5 segments: two group-partitioned rank
//     windows -- the honest cost of exact per-segment order statistics
//     (each segment sorts within its partition); receipt is wall +
//     partition-invariance of a fixed probe row set.
//  3. aggSnapshot/mergeAggSnapshot at 20M: state build is one
//     aggregation; the MERGE touches only the two |keys|-row state
//     frames -- receipt is merge wall (ms-scale, independent of row
//     count) + exact equality with the full 20M rescan.
//  4. WavDecoder throughput over 2M synthesized blobs: pure
//     mapPartitions scan, no shuffle.
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_r14c.scala
import org.apache.spark.sql.functions._

def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  System.gc()
}
def timed(tag: String)(f: => Long): Unit = {
  purge()
  val t0 = System.nanoTime()
  val n = f
  println(f"[stress] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n%d")
}
import spark.implicits._

val scored = spark.range(20000000L).select(
  col("id"),
  concat(lit("seg"), pmod(col("id"), lit(5))).as("seg"),
  (pmod(col("id") * 2654435761L, lit(1000000L)) / 1000000.0).as("score"),
  (pmod(col("id") * 961748927L, lit(100L)) < 30).cast("long").as("label"),
  (pmod(col("id") * 2654435761L, lit(100000L)) / 10.0).as("v"))

val ladder = Seq(100000L, 300000L, 500000L, 700000L, 900000L)
timed("thresholdReport 20M x5thr") {
  graft.ops.Validate.thresholdReport(scored, "score", "label", ladder).count()
}
timed("thresholdReportBy 20M x5seg") {
  graft.ops.Validate.thresholdReportBy(scored, "seg", "score", "label",
    ladder).count()
}

timed("robustZscoreBy 20M x5seg") {
  graft.ops.FrameOps.robustZscoreBy(scored, "seg", "id", "v").count()
}
val p1 = graft.ops.FrameOps.robustZscoreBy(scored, "seg", "id", "v")
  .filter(col("id") < 10).orderBy("id").collect()
  .map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
val p2 = graft.ops.FrameOps.robustZscoreBy(scored.repartition(224),
    "seg", "id", "v")
  .filter(col("id") < 10).orderBy("id").collect()
  .map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
println(s"[stress] robustZscoreBy partition-invariant: ${p1 == p2}")

// the 100 TB tier: same screen from O(groups*bins) state, no sort
// window -- the wall gap vs the exact tier above IS the tier's reason
timed("robustZscoreByHist 20M x5seg") {
  graft.ops.FrameOps.robustZscoreByHist(scored, "seg", "id", "v",
    loCents = 0L, hiCents = 1000000L, nBins = 100).count()
}
// tier agreement: bucket-resolution centers sit within one bucket
// width of the exact medians
val exC = graft.ops.FrameOps.robustZscoreBy(scored, "seg", "id", "v")
  .filter(col("id") < 5).orderBy("id").collect().map(_.getLong(2))
val bkC = graft.ops.FrameOps.robustZscoreByHist(scored, "seg", "id", "v",
    0L, 1000000L, 100)
  .filter(col("id") < 5).orderBy("id").collect().map(_.getLong(2))
val maxGap = exC.zip(bkC).map(t => math.abs(t._1 - t._2)).max
println(s"[stress] hist-tier center gap <= bucket width: ${maxGap <= 10000} (max $maxGap c)")

timed("cdfTransformBy 20M x5seg") {
  graft.ops.Features.cdfTransformBy(scored, "seg", "id", "v").count()
}
val cb1 = graft.ops.Features.cdfTransformBy(scored, "seg", "id", "v")
  .filter(col("id") < 10).orderBy("id").collect().map(_.getLong(3)).toSeq
val cb2 = graft.ops.Features.cdfTransformBy(scored.repartition(224),
    "seg", "id", "v")
  .filter(col("id") < 10).orderBy("id").collect().map(_.getLong(3)).toSeq
println(s"[stress] cdfTransformBy partition-invariant: ${cb1 == cb2}")

// incremental fold: history state built once, delta folds in; merge
// wall is independent of the 20M underlying rows
val hist = graft.ops.FrameOps.aggSnapshot(
  scored.filter(col("id") < 19000000L), Seq("seg"), "v")
hist.cache().count()
val delta = graft.ops.FrameOps.aggSnapshot(
  scored.filter(col("id") >= 19000000L), Seq("seg"), "v")
delta.cache().count()
timed("mergeAggSnapshot (state only)") {
  graft.ops.FrameOps.mergeAggSnapshot(hist, delta, Seq("seg")).count()
}
val m = graft.ops.FrameOps.mergeAggSnapshot(hist, delta, Seq("seg"))
  .orderBy("seg").collect()
  .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toString,
    r.getLong(3), r.getLong(4))).toSeq
val full = graft.ops.FrameOps.aggSnapshot(scored, Seq("seg"), "v")
  .orderBy("seg").collect()
  .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).toString,
    r.getLong(3), r.getLong(4))).toSeq
println(s"[stress] merge == full 20M rescan: ${m == full}")

// WAV decode throughput: synthesize + parse 2M blobs, no shuffle
val docs2m = spark.range(2000000L).select(col("id").as("doc_id"),
  concat(lit("payload-"), col("id")).as("text"))
timed("WavDecoder 2M blobs") {
  graft.ops.Multimodal.extractAudioFeatures(spark,
    graft.ops.Multimodal.withAudioColumn(docs2m, "doc_id", "text"),
    "doc_id").toDF().filter(col("format") === "wav").count()
}

println("[stress] r14c receipts complete")
sys.exit(0)
