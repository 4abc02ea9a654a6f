// Round-11: heavyHitters (q228) scale receipt.
// Claim under test: the MG-candidates + exact-recount plan shuffles
// O(k * partitions + heavy counts), NOT the full distinct-token tail a
// naive value_counts shuffles -- so shuffle bytes stay ~flat 1x -> 100x
// while the naive plan's grow with the tail. (Wall can favor either at
// small scale; shuffle is the axis that kills at 100 TB.)
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_heavyhitters.scala
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
def timed(tag: String)(f: => Long): Unit = {
  spark.catalog.clearCache(); System.gc()
  shuffleW.reset(); peakMem.set(0)
  val t0 = System.nanoTime()
  val n = f
  println(f"[stress] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-8d shuffleMB=${shuffleW.sum / 1e6}%8.1f  " +
    f"peakTaskMB=${peakMem.get / 1e6}%7.1f")
}

val sf = "/root/testdata/sf0.1"
val docs0 = spark.read.parquet(s"$sf/documents.parquet")
// 100x with a WEB-SCALE tail: 80% of docs get every token suffixed
// with (copy, doc_id) -- ~80% of the 27M tokens become globally unique
// (the vocabulary-explosion shape: URLs, ids, hashes), while 20% keep
// the shared heavy head. A naive value_counts must shuffle one row per
// distinct token per partition -- the tail rides the exchange; MG
// candidates shuffle k rows per partition regardless.
spark.range(100).select(col("id").as("copy")).crossJoin(docs0)
  .select(col("copy"), col("doc_id"),
    when(col("doc_id") % 5 =!= 0,
      regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1_"), col("copy") * 100000 + col("doc_id"))))
      .otherwise(col("text")).as("text"))
  .repartition(64).write.mode("overwrite").parquet("/tmp/stress_hh/d100.parquet")
def toks(df: org.apache.spark.sql.DataFrame) = df
  .select(explode(split(graft.ops.Dedup.normText(col("text")), " ")).as("tok"))
  .filter(length(col("tok")) > 0)
val t1 = toks(docs0)
val t100 = toks(spark.read.parquet("/tmp/stress_hh/d100.parquet"))
println(s"[stress] tokens 1x=${t1.count()} 100x=${t100.count()}")

timed("naive counts 1x") {
  t1.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    .filter(col("c") > 100).count()
}
timed("heavyHitters 1x") {
  graft.ops.Sketches.heavyHitters(t1, "tok", 50).count()
}
timed("naive counts 100x") {
  t100.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    .filter(col("c") > 10000).count()
}
timed("heavyHitters 100x") {
  graft.ops.Sketches.heavyHitters(t100, "tok", 50).count()
}
System.exit(0)
