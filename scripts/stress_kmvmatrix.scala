// Round-11: kmvOverlapMatrix shard-count receipt (verdict item 5).
// Claim under test: the S^2/2 pairwise matrix stays a bounded small
// frame at fleet-scale shard counts BECAUSE it runs over k-row
// sketches only (never the corpora), and the pair expansion rides two
// hash EQUI-joins (the r11 rewrite) -- at S=1000, k=64 that is 499,500
// pairs and ~64M narrow intermediate rows, which local[32] chews
// through in seconds. Beyond S ~ 10^3, block the pair list first (see
// scaladoc) -- the quadratic term, not row width, is the budget.
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_kmvmatrix.scala
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
def timed(tag: String)(f: => Long): Unit = {
  spark.catalog.clearCache(); System.gc()
  shuffleW.reset(); peakMem.set(0)
  val t0 = System.nanoTime()
  val n = f
  println(f"[stress] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-8d shuffleMB=${shuffleW.sum / 1e6}%8.1f  " +
    f"peakTaskMB=${peakMem.get / 1e6}%7.1f")
}

// synthetic: S shards, each with 20k keys drawn from a 2M-key space so
// shard pairs genuinely overlap; sketches built once per S then the
// matrix timed alone (the matrix IS the op under test -- in production
// the grouped sketch is a tiny maintained artifact, not rebuilt)
def run(s: Int): Unit = {
  val docs = spark.range(s.toLong * 20000)
    .select((col("id") % s).cast("string").as("src"),
      concat(lit("k"), ((col("id") * 2654435761L) % 2000000)).as("key"))
  val sk = graft.ops.Sketches.kmvSketchBy(docs, "src", col("key"), k = 64)
    .persist()
  println(s"[stress] S=$s sketch rows=" + sk.count())
  timed(s"matrix S=$s") {
    graft.ops.Sketches.kmvOverlapMatrix(sk, 64).count()
  }
  sk.unpersist(blocking = false)
}
run(100)
run(1000)
System.exit(0)
