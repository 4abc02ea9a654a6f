// Round-8: 100x scale stress for the two new heavy ops -
// Graph.pageRankPpb (iterative joins) and Linalg.gramianMicro
// (map-side-combined Gramian). Claims under test:
//   - pagerank: wall ~linear in |E|, per-round shuffle carries two
//     longs per edge, driver sees nothing;
//   - gramian: SHUFFLE VOLUME INDEPENDENT OF ROW COUNT (partitions x
//     d^2/2 longs), wall linear in rows (pure map).
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.sql.session.timeZone=UTC \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_graph_linalg.scala
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
  purge()
  shuffleW.reset(); peakMem.set(0)
  val t0 = System.nanoTime()
  val n = f
  println(f"[stress] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-9d shuffleMB=${shuffleW.sum / 1e6}%8.1f  peakTaskMB=${peakMem.get / 1e6}%7.1f")
}

// ---- fixtures: 1x = sf0.1-derived; 100x = offset-id replication ----
val sf = "/root/testdata/sf0.1"
val li = spark.read.parquet(s"$sf/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
val ord = spark.read.parquet(s"$sf/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
  .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("sn")).distinct()
val edges1 = pairs.select(col("c").as("src"), col("sn").as("dst"))
  .union(pairs.select(col("sn").as("src"), col("c").as("dst")))
edges1.repartition(32).write.mode("overwrite").parquet("/tmp/stress_g/edges1.parquet")
spark.range(100).select(col("id").as("copy")).crossJoin(edges1)
  .select((col("src") + col("copy") * 100000000L).as("src"),
    (col("dst") + col("copy") * 100000000L).as("dst"))
  .repartition(64).write.mode("overwrite").parquet("/tmp/stress_g/edges100.parquet")

val emb1 = spark.read.parquet(s"$sf/embeddings.parquet")
spark.range(100).select(col("id").as("copy")).crossJoin(emb1)
  .withColumn("vec_id", col("vec_id") + col("copy") * 10000000L).drop("copy")
  .repartition(64).write.mode("overwrite").parquet("/tmp/stress_g/emb100.parquet")

val e1 = spark.read.parquet("/tmp/stress_g/edges1.parquet")
val e100 = spark.read.parquet("/tmp/stress_g/edges100.parquet")
val m100 = spark.read.parquet("/tmp/stress_g/emb100.parquet")
println(s"[stress] edges 1x=${e1.count()} 100x=${e100.count()}  emb 1x=${emb1.count()} 100x=${m100.count()}")

for (pass <- 1 to 2) {
  timed(s"pagerank_1x_p$pass") {
    graft.ops.Graph.pageRankPpb(e1, "src", "dst", iterations = 3)
      .queryExecution.toRdd.count()
  }
  timed(s"pagerank_100x_p$pass") {
    graft.ops.Graph.pageRankPpb(e100, "src", "dst", iterations = 3)
      .queryExecution.toRdd.count()
  }
  timed(s"gramian_1x_p$pass") {
    graft.ops.Linalg.gramianMicro(emb1, "embedding", 64)
      .queryExecution.toRdd.count()
  }
  timed(s"gramian_100x_p$pass") {
    graft.ops.Linalg.gramianMicro(m100, "embedding", 64)
      .queryExecution.toRdd.count()
  }
}
System.exit(0)
