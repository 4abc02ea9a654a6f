// Round-10: changeset-heavy scale stress for FrameOps.applyChangeSet
// (the CDC/MERGE core, q212). The r9 fixture gate exercised a SMALL
// changeset (broadcast-able); claim under test here: with a changeset
// ~EQUAL in size to the snapshot (every key touched, multi-version
// LWW, forced shuffle-on-key everywhere -- no broadcast side), wall
// stays ~linear in rows and peak task memory stays partition-sized at
// 100x. Snapshot = orders sf0.1 (150k rows); changes = 2 versioned
// rows per key (stale U + winning U or D, 50/50). 100x = disjoint
// key-offset copies of BOTH sides (15M snapshot + 30M change rows).
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_cdc.scala
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
  println(f"[stress] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-10d keySum=$h%-16d shuffleMB=${shuffleW.sum / 1e6}%8.1f  " +
    f"peakTaskMB=${peakMem.get / 1e6}%7.1f")
}

val sf = "/root/testdata/sf0.1"
val snap1 = spark.read.parquet(s"$sf/orders.parquet")
  .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
    col("o_totalprice").as("price"))
// every key gets a stale v1 'U' plus a winning v2: U (new price) or D
// by key parity -- the all-keys-touched, multi-version LWW shape
val ch1 = snap1.select(col("k"), lit(1L).as("version"), lit("U").as("op"),
    col("status"), (col("price") * 2).as("price"))
  .unionByName(snap1.select(col("k"), lit(2L).as("version"),
    when(col("k") % 2 === 0, "U").otherwise("D").as("op"),
    col("status"), (col("price") + 1).as("price")))
snap1.repartition(32).write.mode("overwrite").parquet("/tmp/stress_cdc/s1.parquet")
ch1.repartition(32).write.mode("overwrite").parquet("/tmp/stress_cdc/c1.parquet")
def blow(df: org.apache.spark.sql.DataFrame, out: String): Unit =
  spark.range(100).select(col("id").as("copy")).crossJoin(df)
    .withColumn("k", col("k") + col("copy") * 100000000L).drop("copy")
    .repartition(64).write.mode("overwrite").parquet(out)
blow(snap1, "/tmp/stress_cdc/s100.parquet")
blow(ch1, "/tmp/stress_cdc/c100.parquet")

def run(s: String, c: String): (Long, Long) = {
  val out = graft.ops.FrameOps.applyChangeSet(
    spark.read.parquet(s), spark.read.parquet(c), "k")
  val a = out.agg(count(lit(1)), sum(col("k"))).head()
  (a.getLong(0), a.getLong(1))
}
println(s"[stress] snap1=${spark.read.parquet("/tmp/stress_cdc/s1.parquet").count()} " +
  s"ch1=${spark.read.parquet("/tmp/stress_cdc/c1.parquet").count()} " +
  s"snap100=${spark.read.parquet("/tmp/stress_cdc/s100.parquet").count()} " +
  s"ch100=${spark.read.parquet("/tmp/stress_cdc/c100.parquet").count()}")
timed("cdc 1x") { run("/tmp/stress_cdc/s1.parquet", "/tmp/stress_cdc/c1.parquet") }
timed("cdc 100x") { run("/tmp/stress_cdc/s100.parquet", "/tmp/stress_cdc/c100.parquet") }
sys.exit(0)
