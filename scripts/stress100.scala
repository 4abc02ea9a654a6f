// 100x scale stress of the flagship dedup path (VERDICT r5 item 5).
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.sql.autoBroadcastJoinThreshold=16777216 \
//         --conf spark.sql.session.timeZone=UTC \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress100.scala
// Replicates documents 100x (5k -> 500k rows) and embeddings 100x
// (2k -> 200k) with offset ids, then times q92c / q95b / q145 warm at
// sf0.1 and at 100x, recording per-query shuffle-write volume.
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

val sf = "/root/testdata/sf0.1"
val out = "/tmp/stress100"
val copies = 100

for (t <- Seq("documents", "embeddings")) {
  val idCol = if (t == "documents") "doc_id" else "vec_id"
  val base = spark.read.parquet(s"$sf/$t.parquet")
  spark.range(copies).select(col("id").as("copy"))
    .crossJoin(base)
    .withColumn(idCol, col(idCol) + col("copy") * lit(10000000L))
    .drop("copy")
    .repartition(64)
    .write.mode("overwrite").parquet(s"$out/$t.parquet")
  println(s"[stress] wrote $out/$t.parquet: " +
    spark.read.parquet(s"$out/$t.parquet").count() + " rows")
}

object M {
  @volatile var shuffleWrite = 0L
  @volatile var peakExecMem = 0L
}
spark.sparkContext.addSparkListener(new SparkListener {
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      M.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
      M.peakExecMem = math.max(M.peakExecMem, m.peakExecutionMemory)
    }
  }
})

def run(tag: String, name: String, dir: String): Unit = {
  M.shuffleWrite = 0L; M.peakExecMem = 0L
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.foreach(_ => ())
  val sec = (System.nanoTime() - t0) / 1e9
  println(f"[stress] $tag%-14s $name%-22s $sec%8.2f s  " +
    f"shuffleWrite=${M.shuffleWrite / 1048576.0}%9.1f MiB  " +
    f"peakTaskMem=${M.peakExecMem / 1048576.0}%7.1f MiB")
}

// warm (JIT + parquet footers), untimed
run("warmup", "q92c_dedup_pipeline", sf)

for (q <- Seq("q92c_dedup_pipeline", "q95b_ngram_jaccard_capped", "q145_semantic_dedup")) {
  run("sf0.1", q, sf)
  run("100x", q, out)
}
// the quadratic knob: SemDeDup's within-cluster pair count is bounded
// by cluster SIZE, so production scales nClusters with N -- show the
// same operator with sqrt(N)-ish clusters at 100x
locally {
  val t0 = System.nanoTime()
  graft.ops.Corpus.semanticDupPairs(
      graft.Tables.embeddings(spark, out), "vec_id", "embedding",
      nClusters = 64, threshold = 0.4, iters = 2)
    .queryExecution.toRdd.foreach(_ => ())
  println(f"[stress] 100x-k64      q145(nClusters=64)     ${(System.nanoTime() - t0) / 1e9}%8.2f s")
}
System.exit(0)
