// Round-11: hitsMilli (q171f/g) depth receipt.
// Claim under test: the rescaled loop's per-round cost is |E|-bounded
// and CONSTANT across rounds (two |E|-row equi-joins + bounded aggs +
// a 1-row broadcast max per half-step) -- depth 12 costs ~2x depth 6,
// and values never leave [0, 1000] (no overflow cliff like the raw
// integer form's 4-round cap).
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_hitsmilli.scala
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
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  System.gc()
  shuffleW.reset()
  val t0 = System.nanoTime()
  val n = f
  println(f"[stress] $tag%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-8d shuffleMB=${shuffleW.sum / 1e6}%8.1f")
}

val sf = "/root/testdata/sf0.1"
val li = spark.read.parquet(s"$sf/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
val ord = spark.read.parquet(s"$sf/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
val de = li.join(ord, col("l_orderkey") === col("o_orderkey"))
  .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
  .distinct().persist()
println(s"[stress] edges=${de.count()}")

for (it <- Seq(2, 6, 12)) {
  timed(s"hitsMilli it=$it") {
    val r = graft.ops.Graph.hitsMilli(de, "src", "dst", iterations = it)
    val bad = r.filter(col("auth_milli") < 0 || col("auth_milli") > 1000 ||
      col("hub_milli") < 0 || col("hub_milli") > 1000).count()
    require(bad == 0, s"values left [0,1000]: $bad rows")
    r.count()
  }
}
System.exit(0)
