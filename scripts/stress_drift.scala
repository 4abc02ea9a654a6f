// Round-8: 100x scale stress for Corpus.domainDrift (the KL drift
// dashboard). Claim: one (source, term) token-count shuffle, then
// vocabulary-sized frames: wall ~linear in corpus size, shuffle
// carries term+counts (never text), peak task memory flat. The 100x
// fixture replicates documents with id offsets and source suffixes
// (sources scale 5 -> 500, vocabulary unchanged).
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_drift.scala
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
  println(f"[stress] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-9d shuffleMB=${shuffleW.sum / 1e6}%8.1f  peakTaskMB=${peakMem.get / 1e6}%7.1f")
}

val docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
  .select(col("doc_id"), col("text"), col("source"))
docs1.repartition(32).write.mode("overwrite").parquet("/tmp/stress_dd/d1.parquet")
spark.range(100).select(col("id").as("copy")).crossJoin(docs1)
  .select((col("doc_id") + col("copy") * 100000000L).as("doc_id"),
    col("text"), concat(col("source"), lit("_"), col("copy")).as("source"))
  .repartition(64).write.mode("overwrite").parquet("/tmp/stress_dd/d100.parquet")

val d1 = spark.read.parquet("/tmp/stress_dd/d1.parquet")
val d100 = spark.read.parquet("/tmp/stress_dd/d100.parquet")
println(s"[stress] docs 1x=${d1.count()} 100x=${d100.count()}")

timed("domainDrift 1x") {
  graft.ops.Corpus.domainDrift(d1, "text", "source").count()
}
timed("domainDrift 100x") {
  graft.ops.Corpus.domainDrift(d100, "text", "source").count()
}
sys.exit(0)
