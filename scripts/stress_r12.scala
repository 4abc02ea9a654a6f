// Round-12 scale receipts: the two new ops whose naive forms are
// scale-killers.
//  1. kTruss: the degree-ORIENTED triangle enumeration vs the naive
//     unoriented wedge join on a hub graph -- the naive form pivots
//     wedges on every endpoint, so one degree-d hub emits O(d^2)
//     wedge rows before the closing-edge probe; orientation pivots
//     only on the lowest-rank endpoint.
//  2. linkageScores: blocked candidate join vs the unblocked
//     all-pairs cross -- blocking is the whole scale story (the LSH
//     banding argument restated for records).
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_r12.scala
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

val shuffleW = new LongAdder
spark.sparkContext.addSparkListener(new SparkListener {
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    if (e.taskMetrics != null)
      shuffleW.add(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
})
def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  System.gc()
}
def timed(tag: String)(f: => Long): Unit = {
  purge(); shuffleW.reset()
  val t0 = System.nanoTime()
  val n = f
  println(f"[stress] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
    f"rows=$n%-10d shuffleMB=${shuffleW.sum / 1e6}%8.1f")
}

// ---- 1. kTruss orientation vs naive wedges on a hub graph ----------
// hub 0 connects to 1..4000; the 1..200 clique-ish ring adds triangles
import spark.implicits._
val hubEdges = (1L to 4000L).map(i => (0L, i)) ++
  (1L to 200L).flatMap(i => Seq((i, i % 200 + 1), (i, (i + 1) % 200 + 1)))
val hubDf = hubEdges.toDF("src", "dst")

timed("ktruss-oriented") {
  graft.ops.Graph.kTruss(hubDf, "src", "dst", k = 3, rounds = 1).count()
}
timed("naive-wedges") {
  // the unoriented wedge count the oriented form avoids: pivot on
  // EVERY node -- the hub alone contributes ~4000^2/2 wedge rows
  val e = hubDf.select(col("src").as("a"), col("dst").as("b"))
    .filter(col("a") =!= col("b"))
    .select(least(col("a"), col("b")).as("a"),
      greatest(col("a"), col("b")).as("b")).distinct()
  val adj = e.union(e.select(col("b").as("a"), col("a").as("b")))
  adj.as("x").join(adj.as("y"),
      col("x.a") === col("y.a") && col("x.b") < col("y.b"))
    .count() // wedge rows BEFORE any closing-edge probe
}

// ---- 2. linkageScores blocking vs all-pairs -------------------------
val n = 200000L
val recs = spark.range(n).select(col("id"),
  pmod(col("id") * 2654435761L % 4294967296L, lit(500L)).as("blk"),
  (col("id") % 7L).cast("string").as("f1"),
  (col("id") % 11L).cast("string").as("f2"))
val a = recs.filter(col("id") % 2 === 0)
val b = recs.filter(col("id") % 2 === 1)

timed("linkage-blocked") {
  graft.ops.Dedup.linkageScores(a, b, "id", "blk",
    Seq(("f1", 1500L, -800L), ("f2", 2500L, -1200L)), 1700L).count()
}
timed("linkage-allpairs") {
  // the unblocked form: constant block key = full cross of 100k x 100k
  // = 1e10 pairs; count a 1% sample of one side to keep the receipt
  // finishable, then scale the wall in the writeup
  graft.ops.Dedup.linkageScores(
    a.filter(col("id") % 200 === 0).withColumn("blk", lit(1L)),
    b.withColumn("blk", lit(1L)),
    "id", "blk",
    Seq(("f1", 1500L, -800L), ("f2", 2500L, -1200L)), 1700L).count()
}
System.exit(0)
