// Round-9: 100x scale stress for Graph.harmonicCentralityMicro. Claim
// under test: on a disjoint-copy graph the exact-pair BFS stays linear
// in the ball mass (100 copies -> exactly 100x the pairs and 100x the
// output rows), peak task memory stays partition-sized, and the
// localCheckpoint-per-round discipline keeps the driver out of the
// loop. 100x = 100 disjoint id-offset copies of the sf0.1 qty>=45 part
// co-occurrence graph (the q209 graph).
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_harmonic.scala
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
def timed(tag: String)(f: => (Long, Long)): Unit = {
  purge(); shuffleW.reset(); peakMem.set(0)
  val t0 = System.nanoTime()
  val (n, h) = f
  println(f"[stress] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-9d hSum=$h%-15d shuffleMB=${shuffleW.sum / 1e6}%8.1f  " +
    f"peakTaskMB=${peakMem.get / 1e6}%7.1f")
}

val sf = "/root/testdata/sf0.1"
val hi = spark.read.parquet(s"$sf/lineitem.parquet")
  .filter(col("l_quantity") >= 45)
  .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
val edges1 = hi.as("x").join(hi.as("y"),
    col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
  .select(col("x.pk").as("src"), col("y.pk").as("dst"))
edges1.repartition(32).write.mode("overwrite").parquet("/tmp/stress_hc/e1.parquet")
spark.range(100).select(col("id").as("copy")).crossJoin(edges1)
  .select((col("src") + col("copy") * 100000000L).as("src"),
    (col("dst") + col("copy") * 100000000L).as("dst"))
  .repartition(64).write.mode("overwrite").parquet("/tmp/stress_hc/e100.parquet")

val e1 = spark.read.parquet("/tmp/stress_hc/e1.parquet")
val e100 = spark.read.parquet("/tmp/stress_hc/e100.parquet")
println(s"[stress] edges 1x=${e1.count()} 100x=${e100.count()}")

def run(e: org.apache.spark.sql.DataFrame): (Long, Long) = {
  val r = graft.ops.Graph.harmonicCentralityMicro(e, "src", "dst", maxDepth = 3)
  val a = r.agg(count(lit(1)), sum(col("harmonic_micro"))).head()
  (a.getLong(0), a.getLong(1))
}
timed("harmonic 1x") { run(e1) }
timed("harmonic 100x") { run(e100) }
sys.exit(0)
