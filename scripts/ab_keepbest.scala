// Round-12 (VERDICT r11 item 4): A/B the q92g keep-best persist shape.
// r10 mandated persisting the membership frame so keep-best costs ONE
// corpus text scan; the shipped form (A) eagerly localCheckpoints the
// FINAL frame, which is the single biggest local-scale regression in
// the catalog (q92g 4.17 -> 5.83 s at sf0.1). Candidates:
//   A  memb.persist()            + out.localCheckpoint(true)  [shipped]
//   B  memb.localCheckpoint(true) + out LAZY                  [narrow
//      frame materialized instead of the wide final join]
//   C  memb.persist() + count() barrier + out LAZY + unpersist-on-
//      consume (caller-managed)  [no checkpoint at all]
// Each timed min-of-3 at sf0.1 as "time to a consumed count", with
// inputMB proving the one-text-scan guarantee holds (a second
// membership build re-reads the text column and shows up as ~2x input).
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/ab_keepbest.scala
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

val inputR = new LongAdder
spark.sparkContext.addSparkListener(new SparkListener {
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    if (e.taskMetrics != null)
      inputR.add(e.taskMetrics.inputMetrics.bytesRead)
})
def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  System.gc()
}
def timed3(tag: String)(f: => Long): Unit = {
  var best = Double.MaxValue; var bestIn = 0.0; var n = 0L
  (1 to 3).foreach { _ =>
    purge(); inputR.reset()
    val t0 = System.nanoTime()
    n = f
    val dt = (System.nanoTime() - t0) / 1e9
    if (dt < best) { best = dt; bestIn = inputR.sum / 1e6 }
  }
  println(f"[ab] $tag%-10s min3=$best%7.2f s  rows=$n%-9d inputMB=$bestIn%8.1f")
}

val sf = sys.env.getOrElse("AB_SF", "/root/testdata/sf0.1")
val docs = spark.read.parquet(s"$sf/documents.parquet")
  .withColumn("quality", length(col("text")).cast("long"))

import graft.ops.Dedup
def membOf(): DataFrame =
  Dedup.dedupCorpus(docs, "doc_id", "text", 5, 16, 4, 0.9)
    .select(col("doc_id"), col("canonical_id"))
    .join(docs.select(col("doc_id"), col("quality")), Seq("doc_id"))
def bestOf(memb: DataFrame): DataFrame =
  memb.groupBy(col("canonical_id"))
    .agg(max(struct(col("quality").as("q"), (-col("doc_id")).as("negid"))).as("b"))
    .select(col("canonical_id"), (-col("b.negid")).as("best_id"))
def outOf(memb: DataFrame, best: DataFrame): DataFrame =
  memb.join(best, Seq("canonical_id"))
    .select(col("doc_id"), col("canonical_id"), col("best_id"),
      (col("doc_id") === col("best_id")).cast("int").as("keep"))

timed3("A-shipped") {
  val memb = membOf().persist()
  val out = outOf(memb, bestOf(memb)).localCheckpoint(true)
  memb.unpersist(blocking = false)
  out.count()
}
timed3("B-ckptMemb") {
  val memb = membOf().localCheckpoint(true)
  outOf(memb, bestOf(memb)).count()
}
timed3("C-persist") {
  val memb = membOf().persist()
  memb.count()
  val n = outOf(memb, bestOf(memb)).count()
  memb.unpersist(blocking = false)
  n
}
// one-scan reference: base dedupCorpus text read alone
timed3("base-scan") {
  Dedup.dedupCorpus(docs, "doc_id", "text", 5, 16, 4, 0.9).count()
}
System.exit(0)
