// PQ ANN at 100x (round 8): train codebooks on the sf0.1 slice (the
// production posture - codebook quality needs thousands of vectors,
// not the corpus), then encode + ADC-scan the 100x-replicated
// embeddings (200k rows). Measures wall + shuffle for the encode pass
// and the ADC top-k scan separately, at 1x and 100x: both are
// broadcast/map shapes, so wall should scale ~linearly with rows and
// shuffle stays ~0 (the only exchange is the per-query top-k window
// over |queries|*k candidate rows).
// Run like stress100.scala (spark-shell -i, after it built /tmp/stress100).
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

val shuffleW = new LongAdder
spark.sparkContext.addSparkListener(new SparkListener {
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    if (e.taskMetrics != null)
      shuffleW.add(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
})

def timed(tag: String)(f: => Long): Unit = {
  shuffleW.reset()
  val t0 = System.nanoTime()
  val n = f
  println(f"[stress] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-9d shuffleMB=${shuffleW.sum / 1e6}%8.1f")
}

val emb1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
val emb100 = spark.read.parquet("/tmp/stress100/embeddings.parquet")
val queries = emb1.filter(col("vec_id") < 8)

// codebooks: trained ONCE on the 1x slice, reused at both scales
val books = graft.ops.Similarity.pqCodebooks(emb1, "vec_id", "embedding",
  dim = 64, nSub = 4, k = 8, iters = 2).localCheckpoint(true)
println("[stress] codebooks trained on 1x slice: " + books.count() + " codewords")

for ((tag, emb) <- Seq("1x" -> emb1, "100x" -> emb100)) {
  timed(s"pq_encode_$tag") {
    graft.ops.Similarity.pqAssign(emb, "vec_id", "embedding", books)
      .queryExecution.toRdd.count()
  }
  timed(s"pq_adc_scan_$tag") {
    val codes = graft.ops.Similarity.pqAssign(emb, "vec_id", "embedding", books)
    graft.ops.Similarity.pqTopK(codes, queries, "vec_id", "embedding",
      k = 10, books).queryExecution.toRdd.count()
  }
}
System.exit(0)
