// Round-10: accuracy/cost stress for the quantized ANN tiers at 100x
// embeddings (the FAISS-style tradeoff row the tier matrix was
// missing). Corpus = 100 disjoint copies of sf0.1 embeddings (200k
// vectors, dim 64), each copy deterministically perturbed (integer
// ladder, +-0.06 max -- ABOVE the SQ8 quantization step maxAbs/127
// ~ 2.4e-3; a first run with +-6e-4 perturbation showed recall
// collapse to 27.5% because sub-step differences code identically,
// the documented int8 resolution floor) so copies are resolvable and
// recall is well-defined. Measures wall + recall@10 vs exact for: SQ8
// exhaustive (index build split from search -- at 100 TB codes are
// stored, search reads 1 B/dim), IVF-SQ (nProbe/nClusters = 8/64),
// float IVF, on 20 queries.
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_annsq.scala
import org.apache.spark.sql.functions._

val sf = "/root/testdata/sf0.1"
val emb1 = spark.read.parquet(s"$sf/embeddings.parquet")
spark.range(100).select(col("id").as("copy")).crossJoin(emb1)
  .selectExpr("vec_id + copy * 1000000 AS vec_id",
    "CAST(transform(embedding, (x, i) -> " +
      "x + CAST(((copy * 7919 + i * 31) % 13) - 6 AS FLOAT) " +
      "* CAST(0.01 AS FLOAT)) AS ARRAY<FLOAT>) AS embedding")
  .repartition(64).write.mode("overwrite").parquet("/tmp/stress_sq/e100.parquet")
val corpus = spark.read.parquet("/tmp/stress_sq/e100.parquet")
println(s"[stress] corpus=${corpus.count()}")
val queries = corpus.filter(col("vec_id") < 20)

def timed(tag: String)(f: => org.apache.spark.sql.DataFrame):
    org.apache.spark.sql.DataFrame = {
  val t0 = System.nanoTime()
  val r = f
  val n = r.count() // force
  println(f"[stress] $tag%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  r
}
import graft.ops.Similarity
val exact = timed("exact") {
  Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 10)
    .localCheckpoint(true)
}
def recall(tag: String, approx: org.apache.spark.sql.DataFrame): Unit = {
  val r = Similarity.recallAtK(approx, exact, k = 10)
    .agg(avg(col("recall_bp"))).head.getDouble(0)
  println(f"[stress] recall@10 $tag%-10s ${r}%8.1f bp")
}
// SQ8 split into index build (store 1 B/dim codes) vs search (scan
// codes only) -- the production shape; sqTopKLearned fuses both
val t0 = System.nanoTime()
val scale = Similarity.sqMaxAbs(corpus, "embedding")
Similarity.sqAssign(corpus, "vec_id", "embedding", scale)
  .write.mode("overwrite").parquet("/tmp/stress_sq/codes.parquet")
println(f"[stress] sq8-index    ${(System.nanoTime() - t0) / 1e9}%8.2f s")
val codes = spark.read.parquet("/tmp/stress_sq/codes.parquet")
val qCodes = Similarity.sqAssign(queries, "vec_id", "embedding", scale)
val sq = timed("sq8-search") {
  Similarity.sqTopK(codes, qCodes, k = 10).localCheckpoint(true)
}
recall("sq8", sq)
val ivfsq = timed("ivf-sq") {
  Similarity.ivfSqTopKLearned(corpus, queries, "vec_id", "embedding",
    k = 10, nClusters = 64, nProbe = 8).localCheckpoint(true)
}
recall("ivf-sq", ivfsq)
val ivf = timed("ivf-flat") {
  Similarity.ivfTopKLearned(corpus, queries, "vec_id", "embedding",
    k = 10, nClusters = 64, nProbe = 8).localCheckpoint(true)
}
recall("ivf-flat", ivf)
sys.exit(0)
