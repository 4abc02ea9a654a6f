// Round-10: scale stress for Graph.harmonicCentralityHyperBall vs the
// exact pair-set BFS. Claim under test: the exact op's cost scales with
// the BALL MASS Sum|ball_3(v)| (the pair volume), while HyperBall's
// scales with |E| * 2^p ONLY -- so as the graph densifies (lineitem
// quantity threshold 46 -> 43 -> 40 on sf0.1, pair volume growing
// ~10x), exact wall/shuffle must grow with the pair volume while the
// sketch's stays ~|E|-proportional. Second leg: 100 disjoint copies of
// the qty>=45 graph pin peak-task flatness for the sketch.
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_hyperball.scala
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
  val (n, balls) = f
  println(f"[stress] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-9d ballMass=$balls%-12d shuffleMB=${shuffleW.sum / 1e6}%8.1f  " +
    f"peakTaskMB=${peakMem.get / 1e6}%7.1f")
}

val sf = "/root/testdata/sf0.1"
def edgesAt(qty: Int): org.apache.spark.sql.DataFrame = {
  val hi = spark.read.parquet(s"$sf/lineitem.parquet")
    .filter(col("l_quantity") >= qty)
    .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
  hi.as("x").join(hi.as("y"),
      col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
    .select(col("x.pk").as("src"), col("y.pk").as("dst"))
}
def runExact(e: org.apache.spark.sql.DataFrame): (Long, Long) = {
  val r = graft.ops.Graph.harmonicCentralityMicro(e, "src", "dst", maxDepth = 3)
  val a = r.agg(count(lit(1)), sum(col("n_reached"))).head()
  (a.getLong(0), a.getLong(1))
}
def runHB(e: org.apache.spark.sql.DataFrame): (Long, Long) = {
  val r = graft.ops.Graph.harmonicCentralityHyperBall(
    e, "src", "dst", maxDepth = 3, p = 10)
  val a = r.agg(count(lit(1)), sum(col("n_reached_est"))).head()
  (a.getLong(0), a.getLong(1))
}

for (qty <- Seq(46, 43, 40)) {
  val path = s"/tmp/stress_hb/e_q$qty.parquet"
  edgesAt(qty).repartition(32).write.mode("overwrite").parquet(path)
  val e = spark.read.parquet(path)
  println(s"[stress] qty>=$qty edges=${e.count()}")
  timed(s"exact qty>=$qty") { runExact(e) }
  timed(s"hyperball qty>=$qty") { runHB(e) }
}

// 100 disjoint copies: sketch peak-task flatness + exact-100x scaling
val e45 = edgesAt(45)
spark.range(100).select(col("id").as("copy")).crossJoin(e45)
  .select((col("src") + col("copy") * 100000000L).as("src"),
    (col("dst") + col("copy") * 100000000L).as("dst"))
  .repartition(64).write.mode("overwrite").parquet("/tmp/stress_hb/e100.parquet")
val e100 = spark.read.parquet("/tmp/stress_hb/e100.parquet")
println(s"[stress] 100x edges=${e100.count()}")
timed("hyperball 100x q45") { runHB(e100) }
sys.exit(0)
