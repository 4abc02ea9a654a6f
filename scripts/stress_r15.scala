// Round-15 scale receipts for the new op families.
//  1. betweennessSampled on a 2M-edge / 500k-node hash graph, K=16,
//     depth 3: per-round cost = one |E|-row equi-join; state is
//     O(K * |ball|) pairs. Receipt: wall + bit-identical aggregate
//     under a 224-way repartition (the localCheckpoint pinning
//     discipline).
//  2. unigramTrainEm over a 2M-doc synthetic corpus (bounded 200-word
//     vocabulary): the corpus is scanned ONCE into the distinct-word
//     dictionary; both EM iterations run on the ~200-row dictionary.
//     Receipt: wall ~ scan cost, learned vocab identical under
//     repartition.
//  3. Mp4Decoder throughput over 2M synthesized blobs: pure
//     mapPartitions scan, no shuffle (the r14 HeaderDecoder receipt,
//     video leg).
//  4+5. quantileMapStream + kmvDistinctSlidingStream over a staged
//     5M-event / ~560-window replay: state per open window is 16 longs
//     (resp. 64 hashes x 2 overlapping windows); wall is dominated by
//     the AvailableNow state-store replay every streaming gate pays.
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_r15.scala
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

// ---- 1. betweennessSampled: 2M edges, 500k nodes, K=16, depth 3 ----
val E = spark.range(2000000L).select(
  pmod(col("id") * 48271L, lit(500000L)).as("src"),
  pmod(col("id") * 2654435761L, lit(500000L)).as("dst"))
timed("betweenness 2M-edge K16 d3") {
  graft.ops.Graph.betweennessSampled(E, "src", "dst", k = 16, maxDepth = 3)
    .count()
}
val b1 = graft.ops.Graph.betweennessSampled(E, "src", "dst", 16, 3)
  .agg(sum("bc_micro"), sum("n_piv"), count(lit(1)))
  .collect().head.toString
val b2 = graft.ops.Graph.betweennessSampled(E.repartition(224), "src", "dst", 16, 3)
  .agg(sum("bc_micro"), sum("n_piv"), count(lit(1)))
  .collect().head.toString
println(s"[stress] betweenness partition-invariant: ${b1 == b2}  agg=$b1")

// ---- 2. unigramTrainEm: 2M docs, bounded vocabulary ----------------
val words8 = array((0 until 8).map(j =>
  concat(lit("w"), pmod(col("id") * (j * 7 + 3), lit(200)))): _*)
val corpus = spark.range(2000000L).select(
  col("id").as("doc_id"), array_join(words8, " ").as("text"))
timed("unigramTrainEm 2M docs") {
  graft.ops.Bpe.unigramTrainEm(corpus, "text").count()
}
val u1 = graft.ops.Bpe.unigramTrainEm(corpus, "text")
  .orderBy("piece").collect().map(_.toString).mkString("|")
val u2 = graft.ops.Bpe.unigramTrainEm(corpus.repartition(224), "text")
  .orderBy("piece").collect().map(_.toString).mkString("|")
println(s"[stress] unigramTrainEm partition-invariant: ${u1 == u2}  vocab=${u1.take(120)}...")

// ---- 3. Mp4Decoder: 2M blobs, scan-only ----------------------------
val docs2m = spark.range(2000000L).select(
  col("id").as("doc_id"), lpad(lit("x"), 64, "y").as("text"))
timed("mp4 decode 2M blobs") {
  graft.ops.Multimodal.extractVideoFeatures(spark,
    graft.ops.Multimodal.withVideoColumn(docs2m, "doc_id", "text"),
    "doc_id").filter(col("n_frames") > 0).count()
}

// ---- 4+5. streaming monitors over a 5M-event replay ----------------
val stage = "/tmp/stress_r15_events"
spark.range(5000000L).select(
    col("id").as("event_id"),
    pmod(col("id"), lit(100000L)).as("user_id"),
    when(pmod(col("id"), lit(3)) === 0, "click").otherwise("purchase")
      .as("event_type"),
    (pmod(col("id") * 7919L, lit(20000L)) / 100.0).as("value"),
    timestamp_seconds(lit(1704067200L) + (col("id") / 30L)).as("ts"))
  .write.mode("overwrite").parquet(s"$stage/events.parquet")
val refCounts = graft.ops.Sketches.histReferenceCounts(
  spark.read.parquet(s"$stage/events.parquet")
    .filter(col("event_type") === "click"), "value", 0.0, 200.0, 16)
// readStream straight at the staged directory (eventsStream's symlink
// staging is for the single-FILE fixtures; this stage is a real dir)
val evSchema = spark.read.parquet(s"$stage/events.parquet").schema
def evStream = spark.readStream.schema(evSchema)
  .parquet(s"$stage/events.parquet")
timed("quantileMapStream 5M events") {
  graft.streaming.Streams.runToBatch(spark,
    graft.streaming.Streams.quantileMapStream(
      evStream.filter(col("event_type") === "purchase"),
      refCounts, 0.0, 200.0, 16),
    "stress_qmap").count()
}
timed("slidingDistinct 5M events") {
  graft.streaming.Streams.runToBatch(spark,
    graft.streaming.Streams.kmvDistinctSlidingStream(evStream, k = 64),
    "stress_slide", outputMode = "update").count()
}
println("[stress] done")
sys.exit(0)
