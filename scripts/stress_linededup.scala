// Round-10: 100x scale stress for Corpus.dedupLinesKeepFirst (q221).
// Claim under test: first-occurrence selection is an argmin AGGREGATE
// (min over struct(id, cidx)), so a corpus-hot chunk -- here EVERY
// chunk is duplicated ~100x, plus a planted corpus-constant leading
// chunk shared by ALL docs -- stays map-side-combined at O(1) state
// per distinct chunk; peak task memory must stay ~flat 1x -> 100x
// (a row_number window over the chunk key would instead sort the hot
// chunk's millions of copies inside one partition).
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_linededup.scala
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
// planted hot chunk: a constant 8-token prefix on EVERY doc (w=8 makes
// it exactly one chunk), so one chunk key holds |docs| copies
val docs = spark.read.parquet(s"$sf/documents.parquet")
  .select(col("doc_id"),
    concat(lit("hot hot hot hot hot hot hot hot "), col("text")).as("text"))
// 100x: identical text per copy (the dedup-stress shape -- every chunk
// ~100 copies), ids disambiguated per copy
spark.range(100).select(col("id").as("copy")).crossJoin(docs)
  .select((col("copy") * 10000000L + col("doc_id")).as("doc_id"), col("text"))
  .repartition(64).write.mode("overwrite").parquet("/tmp/stress_ld/d100.parquet")
val d1 = docs
val d100 = spark.read.parquet("/tmp/stress_ld/d100.parquet")
println(s"[stress] docs 1x=${d1.count()} 100x=${d100.count()}")

timed("lineDedup 1x") {
  graft.ops.Corpus.dedupLinesKeepFirst(d1, "doc_id", "text", w = 8)
    .agg(sum(col("n_removed"))).head.getLong(0)
}
timed("lineDedup 100x") {
  graft.ops.Corpus.dedupLinesKeepFirst(d100, "doc_id", "text", w = 8)
    .agg(sum(col("n_removed"))).head.getLong(0)
}
System.exit(0)
