// Round-14 scale receipts for the new op families.
//  1. generalizeToK at 20M rows x 4 ladder levels: one bounded census
//     per level -- wall must scale with levels * scan, no state blowup,
//     and the chosen level is identical under a 7x repartition.
//  2. curriculumInterleave at 20M rows over SKEWED sources (one source
//     is half the corpus): the hash-top-bits chunking keeps every
//     window bounded -- receipt is wall + the max single-chunk size vs
//     the biggest source (the thing a naive per-source window funnels
//     through one task).
//  3. kmeansSeedsFarthest at 200k x 64-dim, k=32: k bounded scans; the
//     receipt is wall + the min pairwise seed distance vs the lowest-id
//     seeds' (the quality gap on an id-correlated corpus, at scale).
//  4. HeaderDecoder throughput over 2M synthesized blobs: pure
//     mapPartitions scan, no shuffle.
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_r14.scala
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
  println(f"[stress] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n%d")
}
import spark.implicits._

// ---- 1. generalizeToK at 20M rows ----------------------------------
// 5 segments, balances hash-derived in [-1000, 9000): the fine levels
// fail k, the coarse ones pass -- same shape as production release
// gates.
val big = spark.range(20000000L).select(
  col("id"),
  concat(lit("seg"), pmod(col("id"), lit(5))).as("seg"),
  ((pmod(col("id") * 2654435761L, lit(1000000L)) - lit(100000L)) / 100.0).as("bal"))
timed("generalizeToK 20M x4") {
  graft.ops.Validate.generalizeToK(big, Seq("seg"), "bal",
    ladder = Seq(100L, 1000L, 5000L, 20000L), k = 100).count()
}
val g1 = graft.ops.Validate.generalizeToK(big, Seq("seg"), "bal",
  Seq(100L, 1000L, 5000L, 20000L), k = 100)
  .orderBy("bucket_sz").collect().map(r => (r.getLong(0), r.getLong(5), r.getBoolean(7)))
val g2 = graft.ops.Validate.generalizeToK(big.repartition(224), Seq("seg"), "bal",
  Seq(100L, 1000L, 5000L, 20000L), k = 100)
  .orderBy("bucket_sz").collect().map(r => (r.getLong(0), r.getLong(5), r.getBoolean(7)))
println(s"[stress] generalizeToK partition-invariant: ${g1.sameElements(g2)}  levels=${g1.mkString(" ")}")

// ---- 2. curriculumInterleave at 20M rows, skewed sources -----------
// source s0 holds 50% of the corpus -- a naive per-source window rank
// would funnel 10M rows through one task; the chunked rank bounds every
// window at ~corpusSize/2^chunkBits.
val skewed = spark.range(20000000L).select(
  col("id"),
  when(pmod(col("id"), lit(2)) === 0, "s0")
    .otherwise(concat(lit("s"), pmod(col("id"), lit(10)))).as("source"))
val wts = spark.range(10).select(concat(lit("s"), col("id")).as("source"),
  (pmod(col("id"), lit(4)) + 1).as("weight"))
timed("curriculumInterleave 20M") {
  graft.ops.Corpus.curriculumInterleave(skewed, "id", "source", wts,
    chunkBits = 10).count()
}
// receipt: biggest (source, chunk) population vs the biggest source
val chunkMax = skewed
  .withColumn("hb", pmod(col("id") * 2654435761L, lit(4294967296L)))
  .withColumn("chunk", (col("hb") / (4294967296L >> 10)).cast("long"))
  .groupBy("source", "chunk").count().agg(max("count")).head.getLong(0)
println(s"[stress] max single-window rows = $chunkMax (vs 10000000 in the naive per-source window)")

// ---- 3. farthest-point seeding at 200k x 64-dim, k=32 --------------
// id-correlated embeddings: the first 10k ids share a dominant
// direction (the degenerate case for lowest-id seeding).
val dim = 64
val emb = spark.range(200000L).select(col("id"),
  transform(sequence(lit(0), lit(dim - 1)), j =>
    (when(col("id") < 10000L && j === 0, lit(10.0)).otherwise(lit(0.0)) +
      pmod(col("id") * (j + 1) * 2654435761L, lit(1000L)).cast("double") / 1000.0)
    .cast("float")).as("embedding"))
timed("kmeansSeedsFarthest k=32") {
  graft.ops.Similarity.kmeansSeedsFarthest(emb, "id", "embedding", 32).count()
}
def minPairDist(cents: Array[Array[Float]]): Double = {
  var best = Double.MaxValue
  for (i <- cents.indices; j <- (i + 1) until cents.length) {
    var s = 0.0; var t = 0
    while (t < cents(i).length) {
      val d = cents(i)(t).toDouble - cents(j)(t).toDouble; s += d * d; t += 1
    }
    if (s < best) best = s
  }
  best
}
val far = graft.ops.Similarity.kmeansSeedsFarthest(emb, "id", "embedding", 32)
  .collect().map(_.getSeq[Float](1).toArray)
val low = emb.orderBy("id").limit(32).collect().map(_.getSeq[Float](1).toArray)
println(f"[stress] min pairwise seed d2: farthest=${minPairDist(far)}%.3f lowest-id=${minPairDist(low)}%.3f")

// ---- 4. HeaderDecoder over 2M synthesized blobs ---------------------
val blobs = spark.range(2000000L).select(col("id"),
  lit("payload payload payload payload").as("text"))
timed("HeaderDecoder 2M blobs") {
  graft.ops.Multimodal.extractFeatures(spark,
    graft.ops.Multimodal.withMediaColumn(blobs, "id", "text"), "id")
    .filter(col("width") > 0).count()
}

// ---- 5. Features at 20M rows ----------------------------------------
// categorify over a 10k-cardinality column (vocabulary-bounded agg +
// broadcast encode); targetEncode over 1k categories x 4 folds (4k-cell
// partials + one broadcast join) -- both must be scan-dominated.
val feat = spark.range(20000000L).select(col("id"),
  concat(lit("c"), pmod(col("id") * 7919L, lit(10000L))).as("cat"),
  (pmod(col("id") * 2654435761L, lit(100000L)) / 100.0).as("y"))
timed("categorify 20M x 10k-card") {
  graft.ops.Features.categorify(feat, "cat", minCount = 100L)
    .filter(col("cat_id") >= 0).count()
}
val feat2 = feat.withColumn("cat",
  concat(lit("c"), pmod(col("id") * 7919L, lit(1000L))))
timed("targetEncode 20M x 1k x 4") {
  graft.ops.Features.targetEncode(feat2, "id", "cat", "y", k = 4)
    .filter(col("cat_te_micro") >= 0).count()
}

println("[stress] done")
sys.exit(0)
