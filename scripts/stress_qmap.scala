// Round-10: 100x scale stress for Validate.quantileMapHist (q216b) vs
// the exact-ladder quantileMap (q216). Claim under test: the histogram
// path has NO single-partition stage -- wall stays ~flat and peak task
// partition-sized at 100x -- while the exact ladder's global
// row_number degrades with a one-partition sort of the full column.
// 100x = 100 copies of the sf0.1 purchase/click value columns with
// deterministic per-copy jitter (distinct values, same shape).
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_qmap.scala
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

val shuffleW = new LongAdder
val peakMem = new java.util.concurrent.atomic.AtomicLong
spark.sparkContext.addSparkListener(new SparkListener {
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    if (e.taskMetrics != null) {
      shuffleW.add(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
      peakMem.getAndAccumulate(e.taskMetrics.peakExecutionMemory, math.max)
    }
})
def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  System.gc()
}
def timed(tag: String)(f: => Long): Unit = {
  purge(); shuffleW.reset(); peakMem.set(0)
  val t0 = System.nanoTime()
  val n = f
  println(f"[stress] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-10d shuffleMB=${shuffleW.sum / 1e6}%8.1f  " +
    f"peakTaskMB=${peakMem.get / 1e6}%7.1f")
}

val sf = "/root/testdata/sf0.1"
val ev = spark.read.parquet(s"$sf/events.parquet")
def blow(t: String, out: String): Unit =
  spark.range(100).select(col("id").as("copy"))
    .crossJoin(ev.filter(col("event_type") === t && col("value").isNotNull)
      .select(col("event_id"), col("value")))
    .select((col("event_id") + col("copy") * 10000000L).as("event_id"),
      (col("value") + col("copy") % 7 * 0.001).as("value"))
    .repartition(64).write.mode("overwrite").parquet(out)
blow("purchase", "/tmp/stress_qm/cur100.parquet")
blow("click", "/tmp/stress_qm/ref100.parquet")
ev.filter(col("event_type") === "purchase" && col("value").isNotNull)
  .select(col("event_id"), col("value"))
  .write.mode("overwrite").parquet("/tmp/stress_qm/cur1.parquet")
ev.filter(col("event_type") === "click" && col("value").isNotNull)
  .select(col("value"))
  .write.mode("overwrite").parquet("/tmp/stress_qm/ref1.parquet")
val cur1 = spark.read.parquet("/tmp/stress_qm/cur1.parquet")
val ref1 = spark.read.parquet("/tmp/stress_qm/ref1.parquet")
val cur100 = spark.read.parquet("/tmp/stress_qm/cur100.parquet")
val ref100 = spark.read.parquet("/tmp/stress_qm/ref100.parquet")
println(s"[stress] cur 1x=${cur1.count()} 100x=${cur100.count()}")

timed("hist 1x") {
  graft.ops.Validate.quantileMapHist(cur1, ref1, "value", 0.0, 200.0, 32).count()
}
timed("hist 100x") {
  graft.ops.Validate.quantileMapHist(cur100, ref100, "value", 0.0, 200.0, 32).count()
}
timed("exact 1x") {
  graft.ops.Validate.quantileMap(cur1, ref1, "value", nQ = 16).count()
}
timed("exact 100x") {
  graft.ops.Validate.quantileMap(cur100, ref100, "value", nQ = 16).count()
}
sys.exit(0)
