// Round-11: 100x scale stress for Dedup.dedupCorpusKeepBest (q92g).
// Claim under test: the membership frame (id, canonical_id, quality) is
// persisted before its two consumers (per-cluster argmax + join-back),
// so keep-best costs ONE corpus text scan + narrow joins over the base
// dedupCorpus -- not a second full membership build (which re-runs the
// md5/normText fingerprint scan over the text column). Receipt axes:
// wall + input bytes read: keepBest's deltas over base dedupCorpus must
// stay small and NOT include a second text-sized input read at 100x.
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_keepbest.scala
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

val shuffleW = new LongAdder
val inputR = new LongAdder
val peakMem = new java.util.concurrent.atomic.AtomicLong
spark.sparkContext.addSparkListener(new SparkListener {
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    if (e.taskMetrics != null) {
      shuffleW.add(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
      inputR.add(e.taskMetrics.inputMetrics.bytesRead)
      peakMem.getAndAccumulate(e.taskMetrics.peakExecutionMemory, math.max)
    }
})
def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  System.gc()
}
def timed(tag: String)(f: => Long): Unit = {
  purge(); shuffleW.reset(); inputR.reset(); peakMem.set(0)
  val t0 = System.nanoTime()
  val n = f
  println(f"[stress] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-8d shuffleMB=${shuffleW.sum / 1e6}%8.1f  " +
    f"inputMB=${inputR.sum / 1e6}%8.1f  peakTaskMB=${peakMem.get / 1e6}%7.1f")
}

val sf = "/root/testdata/sf0.1"
val docs0 = spark.read.parquet(s"$sf/documents.parquet")
// 100x: identical text per copy (dedup-stress shape -- exact-dup
// collapse carries the load), ids disambiguated per copy
spark.range(100).select(col("id").as("copy")).crossJoin(docs0)
  .select((col("copy") * 10000000L + col("doc_id")).as("doc_id"), col("text"))
  .repartition(64).write.mode("overwrite").parquet("/tmp/stress_kb/d100.parquet")
def withQ(df: org.apache.spark.sql.DataFrame) = df.withColumn("n_toks",
  size(filter(split(graft.ops.Dedup.normText(col("text")), " "),
    t => length(t) > 0)))
val d1 = withQ(docs0.select(col("doc_id"), col("text")))
val d100 = withQ(spark.read.parquet("/tmp/stress_kb/d100.parquet"))
println(s"[stress] docs 1x=${d1.count()} 100x=${d100.count()}")

timed("base 1x") {
  graft.ops.Dedup.dedupCorpus(d1, "doc_id", "text").count()
}
timed("keepBest 1x") {
  graft.ops.Dedup.dedupCorpusKeepBest(d1, "doc_id", "text", "n_toks").count()
}
timed("base 100x") {
  graft.ops.Dedup.dedupCorpus(d100, "doc_id", "text").count()
}
timed("keepBest 100x") {
  graft.ops.Dedup.dedupCorpusKeepBest(d100, "doc_id", "text", "n_toks").count()
}
System.exit(0)
