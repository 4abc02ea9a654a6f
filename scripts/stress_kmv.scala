// Round-10: 100x scale stress for Sketches.kmvSketch/kmvOverlap
// (q218/q219). Claim under test: the sketch build is scan-bound --
// TakeOrderedAndProject ships k rows per partition to the driver-side
// merge regardless of corpus size, so shuffle stays ~zero and wall
// tracks the scan, while the sketch itself stays k rows. 100x = 100
// copies of sf0.1 documents with per-copy suffixes (distinct texts).
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_kmv.scala
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
  println(f"[stress] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-8d shuffleMB=${shuffleW.sum / 1e6}%8.1f  " +
    f"peakTaskMB=${peakMem.get / 1e6}%7.1f")
}

val sf = "/root/testdata/sf0.1"
val docs = spark.read.parquet(s"$sf/documents.parquet")
  .select(col("doc_id"), col("text"))
spark.range(100).select(col("id").as("copy")).crossJoin(docs)
  .select(concat(col("text"), lit(" v"), col("copy")).as("text"))
  .repartition(64).write.mode("overwrite").parquet("/tmp/stress_kmv/d100.parquet")
val d1 = docs
val d100 = spark.read.parquet("/tmp/stress_kmv/d100.parquet")
println(s"[stress] docs 1x=${d1.count()} 100x=${d100.count()}")

import graft.ops.{Sketches, Dedup}
timed("kmv build 1x") {
  Sketches.kmvSketch(d1, Dedup.normText(col("text")), 256).count()
}
timed("kmv build 100x") {
  Sketches.kmvSketch(d100, Dedup.normText(col("text")), 256).count()
}
timed("kmv overlap 100x") {
  val a = Sketches.kmvSketch(
    d100.filter(pmod(crc32(col("text")), lit(3)) =!= 0),
    Dedup.normText(col("text")), 256)
  val b = Sketches.kmvSketch(
    d100.filter(pmod(crc32(col("text")), lit(3)) =!= 1),
    Dedup.normText(col("text")), 256)
  val r = Sketches.kmvOverlap(a, b, 256).head()
  println(s"[stress] overlap row: $r")
  1L
}
sys.exit(0)
