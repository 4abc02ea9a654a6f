// Round-11 wave-2 scale receipts.
//
// (a) FrameOps.trailingDistinct (q236). Claim: after the first
//     distinct, everything downstream is keyed on DISTINCT (day, user)
//     pairs x window length -- so a 100x event-volume blowup that adds
//     NO new pairs (the bot-retry / duplicate-feed shape: same users,
//     same days, 100x the events) leaves the fan-out + re-distinct
//     shuffle FLAT, while the naive day-range self-join (days JOIN raw
//     events BETWEEN) shuffles raw volume x window and grows ~100x.
// (b) Graph.bipartiteProject (q238). Claim: the per-basket cap bounds
//     the quadratic basket blowup -- one planted viral basket (10k
//     items) explodes the uncapped projection to ~5e7 pairs while the
//     capped form stays at C(8,2) for that basket; wall/shuffle must
//     stay ~flat vs the no-viral baseline.
//
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_r11wave2.scala
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
    f"rows=$n%-10d shuffleMB=${shuffleW.sum / 1e6}%8.1f  " +
    f"peakTaskMB=${peakMem.get / 1e6}%7.1f")
}

val sf = "/root/testdata/sf0.1"
val ev = spark.read.parquet(s"$sf/events.parquet")
  .select(col("ts").cast("timestamp").as("ts"), col("user_id"))
// 100x: same (day, user) pairs -- copies shift ts by `copy` SECONDS
// (stays inside the same calendar day for all but a vanishing sliver)
spark.range(100).select(col("id").as("copy")).crossJoin(ev)
  .select(timestamp_micros(unix_micros(col("ts"))
      + (col("copy") % 30) * 1000000L).as("ts"),
    col("user_id"))
  .repartition(64).write.mode("overwrite").parquet("/tmp/stress_td/e100.parquet")
val e1 = ev
val e100 = spark.read.parquet("/tmp/stress_td/e100.parquet")
println(s"[stress] events 1x=${e1.count()} 100x=${e100.count()}")

def naive(df: org.apache.spark.sql.DataFrame): Long = {
  val d = df.select(to_date(col("ts")).as("day")).distinct()
  d.join(df.select(to_date(col("ts")).as("eday"), col("user_id")),
      col("eday").between(date_sub(col("day"), 6), col("day")))
    .groupBy(col("day")).agg(countDistinct(col("user_id")).as("u7"))
    .count()
}
timed("trailing naive 1x")(naive(e1))
timed("trailing op 1x") {
  graft.ops.FrameOps.trailingDistinct(e1, "ts", "user_id", 7, "u7").count()
}
timed("trailing naive 100x")(naive(e100))
timed("trailing op 100x") {
  graft.ops.FrameOps.trailingDistinct(e100, "ts", "user_id", 7, "u7").count()
}

// ---- bipartiteProject: viral-basket quadratic control ---------------
val li = spark.read.parquet(s"$sf/lineitem.parquet")
  .filter(col("l_quantity") >= 40)
  .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
// planted viral basket: ONE basket holding 10k distinct items
val viral = spark.range(10000)
  .select(lit(-1L).as("b"), (col("id") + 9000000L).as("i"))
val withViral = li.unionByName(viral)
println(s"[stress] incidence base=${li.count()} +viral=${withViral.count()}")

timed("project cap8 base") {
  graft.ops.Graph.bipartiteProject(li, "b", "i", 8).count()
}
timed("project cap8 viral") {
  graft.ops.Graph.bipartiteProject(withViral, "b", "i", 8).count()
}
timed("project UNCAPPED viral") {
  // cap 10000 admits the whole viral basket -> C(10k,2) ~ 5e7 pairs
  graft.ops.Graph.bipartiteProject(withViral, "b", "i", 10000).count()
}
sys.exit(0)
