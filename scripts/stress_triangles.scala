// Round-8: 100x scale stress for Graph.triangleCount. Claims under
// test:
//   - wall ~linear in |E| on a replicated (disjoint-copy) graph: the
//     degree-ordered orientation bounds wedge fan-out, so the wedge
//     self-join does not go quadratic;
//   - shuffled rows carry only longs (edges, wedges, corners);
//   - peak task memory stays flat (partition-sized, not graph-sized).
// The 100x fixture is 100 disjoint id-offset copies of the 1x graph,
// so the true output is exactly 100x the 1x output - any superlinear
// wall or shuffle growth is join blowup, not data.
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.sql.session.timeZone=UTC \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_triangles.scala
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

// ---- fixtures: 1x = the q181 co-occurrence graph at sf0.1 ----
val sf = "/root/testdata/sf0.1"
val hi = spark.read.parquet(s"$sf/lineitem.parquet")
  .filter(col("l_quantity") >= 45)
  .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
val edges1 = hi.as("x").join(hi.as("y"),
    col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
  .select(col("x.sk").as("src"), col("y.sk").as("dst"))
edges1.repartition(32).write.mode("overwrite").parquet("/tmp/stress_t/edges1.parquet")
spark.range(100).select(col("id").as("copy")).crossJoin(edges1)
  .select((col("src") + col("copy") * 100000000L).as("src"),
    (col("dst") + col("copy") * 100000000L).as("dst"))
  .repartition(64).write.mode("overwrite").parquet("/tmp/stress_t/edges100.parquet")

val e1 = spark.read.parquet("/tmp/stress_t/edges1.parquet")
val e100 = spark.read.parquet("/tmp/stress_t/edges100.parquet")
println(s"[stress] edges 1x=${e1.count()} 100x=${e100.count()}")

timed("triangles 1x") {
  graft.ops.Graph.triangleCount(e1, "src", "dst")
    .agg(sum(col("triangles"))).head.getLong(0)
}
timed("triangles 100x") {
  graft.ops.Graph.triangleCount(e100, "src", "dst")
    .agg(sum(col("triangles"))).head.getLong(0)
}
sys.exit(0)
