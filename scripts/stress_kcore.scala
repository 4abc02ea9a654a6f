// Round-9: 100x scale stress for Graph.kCorePeel (the q180 shape:
// k=10, 3 fixed rounds, bipartite customer-supplier graph). Claim
// under test: per round one bounded degree agg + double left-semi on
// a shrinking persisted edge list -> wall linear in |E|, peak task
// partition-sized, output exactly 100x on disjoint copies.
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_kcore.scala
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

val sf = "/root/testdata/sf0.1"
val li = spark.read.parquet(s"$sf/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
val ord = spark.read.parquet(s"$sf/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
  .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("sn")).distinct()
val edges1 = pairs.select(col("c").as("src"), col("sn").as("dst"))
  .union(pairs.select(col("sn").as("src"), col("c").as("dst")))
edges1.repartition(32).write.mode("overwrite").parquet("/tmp/stress_kc/e1.parquet")
spark.range(100).select(col("id").as("copy")).crossJoin(edges1)
  .select((col("src") + col("copy") * 100000000L).as("src"),
    (col("dst") + col("copy") * 100000000L).as("dst"))
  .repartition(64).write.mode("overwrite").parquet("/tmp/stress_kc/e100.parquet")

val e1 = spark.read.parquet("/tmp/stress_kc/e1.parquet")
val e100 = spark.read.parquet("/tmp/stress_kc/e100.parquet")
println(s"[stress] edges 1x=${e1.count()} 100x=${e100.count()}")

timed("kCorePeel 1x") {
  graft.ops.Graph.kCorePeel(e1, "src", "dst", k = 10, rounds = 3).count()
}
timed("kCorePeel 100x") {
  graft.ops.Graph.kCorePeel(e100, "src", "dst", k = 10, rounds = 3).count()
}
timed("kCorePeel 100x fixpoint") {
  graft.ops.Graph.kCorePeel(e100, "src", "dst", k = 10, rounds = -1).count()
}
sys.exit(0)
