// Round-15 wave-2 scale receipts: AUC, repetition rules, seasonal
// decomposition, distinct-n -- each at 20M rows (or 1M docs for the
// text kernels, whose fan-out is 9x tokens).
//  1. aucBy at 20M rows / 8 groups: one shuffle to the ppm-bounded
//     (group, score) cell frame + a group-partitioned window. Receipt:
//     wall + bit-identical output under a 224-way repartition.
//  2. gopherRepetition at 1M synthetic docs (~12 words each -> ~100M
//     (doc, n, gram) rows): the lead/stack kernel, no HOF-into-explode.
//  3. seasonalDecompose at 20M events over ~2 years of hourly slots:
//     ONE shuffle to the 17k-slot series; decomposition rides the
//     bounded frame. Receipt: wall + partition invariance.
//  4. distinctNgramRatios at 1M docs: same kernel class as (2).
// Run:  /opt/spark/bin/spark-shell --master "local[16]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 60g --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.ui.enabled=false -i scripts/stress_r15b.scala
import org.apache.spark.sql.functions._

def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  System.gc()
}
def timed(tag: String)(f: => Long): Unit = {
  purge()
  val t0 = System.nanoTime()
  val n = f
  println(f"[stress] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n%d")
}
import spark.implicits._

// ---- 1. aucBy at 20M rows ------------------------------------------
val scored = spark.range(20000000L).select(
  pmod(col("id"), lit(8L)).as("g"),
  (pmod(col("id") * 7919L, lit(1000000L)) / 1000000.0).as("score"),
  when(pmod(col("id") * 104729L, lit(100L)) <
    (pmod(col("id") * 7919L, lit(1000000L)) / 20000L), 1L).otherwise(0L).as("y"))
timed("aucBy 20M x 8 groups") {
  graft.ops.Validate.aucBy(scored, "g", "score", "y").count()
}
val a1 = graft.ops.Validate.aucBy(scored, "g", "score", "y")
  .orderBy("grp").collect().map(_.toString).mkString("|")
val a2 = graft.ops.Validate.aucBy(scored.repartition(224), "g", "score", "y")
  .orderBy("grp").collect().map(_.toString).mkString("|")
println(s"[stress] aucBy partition-invariant: ${a1 == a2}  ${a1.take(120)}")

// ---- 2. gopherRepetition at 1M docs --------------------------------
val words12 = array((0 until 12).map(j =>
  concat(lit("tok"), pmod(col("id") * (j * 13 + 7), lit(500)))): _*)
val docs1m = spark.range(1000000L).select(
  col("id").as("doc_id"), array_join(words12, " ").as("text"))
timed("gopherRepetition 1M docs") {
  // sum a right-side column: a bare count() lets Catalyst ELIMINATE
  // the unique-key left joins and measure only the base scan
  graft.ops.TextAnalysis.gopherRepetition(docs1m, "doc_id", "text")
    .agg(sum("dup5_bp"), sum("top2_bp"), count(lit(1)))
    .collect().head.getLong(2)
}

// ---- 3. seasonalDecompose at 20M events ----------------------------
val ev20 = spark.range(20000000L).select(
  timestamp_seconds(lit(1704067200L) + col("id") * 3L).as("ts"),
  (pmod(col("id") * 31L, lit(10000L)) / 100.0).as("value"))
timed("seasonalDecompose 20M events") {
  graft.ops.DatetimeOps.seasonalDecompose(ev20, "ts", "value")
    .agg(sum("resid_c"), count(lit(1))).collect().head.getLong(1)
}
val s1 = graft.ops.DatetimeOps.seasonalDecompose(ev20, "ts", "value")
  .agg(sum("v_c"), sum("trend_c"), sum("resid_c"), count(lit(1)))
  .collect().head.toString
val s2 = graft.ops.DatetimeOps.seasonalDecompose(ev20.repartition(224),
    "ts", "value")
  .agg(sum("v_c"), sum("trend_c"), sum("resid_c"), count(lit(1)))
  .collect().head.toString
println(s"[stress] seasonalDecompose partition-invariant: ${s1 == s2}  agg=$s1")

// ---- 4. distinctNgramRatios at 1M docs -----------------------------
timed("distinctNgramRatios 1M docs") {
  graft.ops.TextAnalysis.distinctNgramRatios(docs1m, "doc_id", "text")
    .agg(sum("dist3_bp"), count(lit(1))).collect().head.getLong(1)
}
println("[stress] done")
sys.exit(0)
