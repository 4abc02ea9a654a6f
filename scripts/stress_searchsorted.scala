// 100x stress for FrameOps.searchSortedLarge (round 7): the distributed
// prefix-scan formulation vs the single-ordered-window searchSorted.
// elems = lineitem.l_extendedprice, probes = events.value; 100x = per-
// replica jitter so values stay distinct and range-partitionable.
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path target/scala-2.13/classes \
//         --driver-memory 24g --conf spark.ui.enabled=false \
//         --conf spark.sql.shuffle.partitions=32 \
//         -i scripts/stress_searchsorted.scala   (ASCII only)
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

val sf = "/root/testdata/sf0.1"

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
def timed(tag: String)(f: => Unit): Unit = {
  M.shuffleWrite = 0L; M.peakExecMem = 0L
  val t0 = System.nanoTime()
  f
  val sec = (System.nanoTime() - t0) / 1e9
  println(f"[stress] $tag%-36s $sec%8.2f s  " +
    f"shuffleWrite=${M.shuffleWrite / 1048576.0}%9.1f MiB  " +
    f"peakTaskMem=${M.peakExecMem / 1048576.0}%7.1f MiB")
}
def drain(df: org.apache.spark.sql.DataFrame): Unit =
  df.queryExecution.toRdd.foreach(_ => ())

def rep(df: org.apache.spark.sql.DataFrame, vcol: String, times: Int) = {
  if (times == 1) df
  else df.crossJoin(spark.range(times).select(col("id").as("__r")))
    .withColumn(vcol, col(vcol) + col("__r") * 1e-4)
    .drop("__r")
}

def elems(times: Int) = rep(
  graft.Tables.lineitem(spark, sf).select(col("l_extendedprice").cast("double").as("v")),
  "v", times)
def probes(times: Int) = rep(
  graft.Tables.events(spark, sf).select(col("event_id"), col("value").cast("double").as("p")),
  "p", times).withColumn("event_id",
    col("event_id") + (rand(7) * 0).cast("long"))  // keep plan fresh per run

// warmup (JIT), untimed
drain(graft.ops.FrameOps.searchSortedLarge(elems(1), "v", probes(1), "p", "event_id", "pos"))

// single-ordered-window formulation at 1x: the global sort collapses to
// ONE task for the running count -- the bottleneck Large removes
timed("searchSorted(global window) @ 1x")(
  drain(graft.ops.FrameOps.searchSorted(elems(1), "v", probes(1), "p", "event_id", "pos")))
timed("searchSortedLarge @ 1x   (700k rows)")(
  drain(graft.ops.FrameOps.searchSortedLarge(elems(1), "v", probes(1), "p", "event_id", "pos")))
timed("searchSortedLarge @ 10x  (7M rows)")(
  drain(graft.ops.FrameOps.searchSortedLarge(elems(10), "v", probes(10), "p", "event_id", "pos")))
timed("searchSorted(global window) @ 10x")(
  drain(graft.ops.FrameOps.searchSorted(elems(10), "v", probes(10), "p", "event_id", "pos")))
timed("searchSortedLarge @ 100x (70M rows)")(
  drain(graft.ops.FrameOps.searchSortedLarge(elems(100), "v", probes(100), "p", "event_id", "pos")))

sys.exit(0)
