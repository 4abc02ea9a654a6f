// Round-8: measure the two embedding-dedup scale tiers at 100x (200k
// vectors) with the purge the bench uses, closing the measurement
// holes VERDICT r7 flagged: (a) SemDeDup through the r7 sqrt-N
// DEFAULT cluster count (the quadratic-defusing path, previously only
// gated at sf0.01), (b) the RP-blocked near-pair tier (q96b's shape -
// the one a 100 TB corpus runs; the exact tier is labeled
// fixture-only). Run like stress100.scala (spark-shell -i, after it
// built /tmp/stress100).
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

val shuffleW = new LongAdder
spark.sparkContext.addSparkListener(new SparkListener {
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    if (e.taskMetrics != null)
      shuffleW.add(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
})

def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  System.gc()
}

def timed(tag: String)(f: => Long): Unit = {
  purge()
  shuffleW.reset()
  val t0 = System.nanoTime()
  val n = f
  println(f"[stress] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-9d shuffleMB=${shuffleW.sum / 1e6}%8.1f")
}

val emb1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
val emb100 = spark.read.parquet("/tmp/stress100/embeddings.parquet")

for ((tag, emb) <- Seq("1x" -> emb1, "100x" -> emb100)) {
  // sqrt-N default overload: nClusters derived from the corpus size
  timed(s"semdedup_sqrtN_$tag") {
    graft.ops.Corpus.semanticDupPairs(emb, "vec_id", "embedding",
      threshold = 0.4).queryExecution.toRdd.count()
  }
  timed(s"rp_blocked_b4_$tag") {
    graft.ops.Dedup.embeddingNearPairs(emb, "vec_id", "embedding",
      minCosine = 0.4, blockBits = 4).queryExecution.toRdd.count()
  }
}
// the production knob: bucket count must scale with N (quadratic is
// per-bucket) - at 100x, 2^8 buckets puts the per-bucket population
// back at the 1x/2^4 level
timed("rp_blocked_b8_100x") {
  graft.ops.Dedup.embeddingNearPairs(emb100, "vec_id", "embedding",
    minCosine = 0.4, blockBits = 8).queryExecution.toRdd.count()
}
System.exit(0)
