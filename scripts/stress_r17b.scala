// Round-17 scale receipt #2: the two NEW operator families at 300k
// docs / ~20M tokens (synthetic md5-word corpus, 40k-word vocabulary,
// doc lengths 8..127 tokens so the 64-token budget splits ~half).
// What this pins down:
//
//   1. Stupid Backoff at corpus scale: wall cost of the string tier
//      vs the hashed-key tier (the join-key-width claim), and the
//      honest collision accounting — at ~19M distinct grams over a
//      1e9+7 hash space, collisions are EXPECTED (birthday ~ n²/2M);
//      row counts (n_tri) must be identical (pre-merged lookup tables
//      are grouped on their join keys, so a collision merges counts
//      but can never multiply rows) while sb_nano drifts by the
//      merged-count delta, reported as a fraction.
//   2. Partition invariance at scale for both ops (floor-nano integer
//      terms / deterministic per-shard fold).
//   3. The Ding et al. 2024 headline on real numbers: concat-and-chunk
//      (packSequences) truncates a document at almost every window
//      boundary, best-fit cuts ONLY over-budget docs, at a measured
//      fill rate — the truncation-vs-waste trade made visible.
//   4. Shard-count scaling for the packing fold (parallelism = shards,
//      per-shard O(n log n)).
//
// Run: /opt/spark/bin/spark-shell --master local[32] \
//   --driver-memory 24g --conf spark.sql.shuffle.partitions=32 \
//   --driver-class-path target/scala-2.13/classes \
//   --conf spark.ui.enabled=false -i scripts/stress_r17b.scala
import org.apache.spark.sql.functions._

def timed[T](tag: String)(body: => T): (Double, T) = {
  val t0 = System.nanoTime()
  val r = body
  val sec = (System.nanoTime() - t0) / 1e9
  println(f"[stress] $tag%-56s ${sec}%8.1f s")
  (sec, r)
}

// fresh plan PER CALL (the bench/verify pattern)
def docs300k = spark.range(300000L).select(col("id").as("doc_id"),
  array_join(transform(sequence(lit(0L), pmod(col("id"), lit(120L)) + 7L),
    j => substring(md5(pmod(col("id") * 31L + j * 17L + 11L, lit(40000L))
      .cast("string")), 1, 5)), " ").as("text"))

def train = docs300k.filter(col("doc_id") % 2 === 0)

// ---- 1. Stupid Backoff: string tier vs hashed tier -----------------
def sbAgg(df: org.apache.spark.sql.DataFrame) =
  df.agg(sum("sb_nano").as("nano"), sum("n_tri").as("tri"),
    count(lit(1)).as("docs")).collect().head

val (sStr, aStr) = timed("stupidBackoff STRING tier, 300k docs") {
  sbAgg(graft.ops.Corpus.stupidBackoffScore(docs300k, train, "doc_id", "text"))
}
val (sHash, aHash) = timed("stupidBackoff HASHED tier, 300k docs") {
  sbAgg(graft.ops.Corpus.stupidBackoffScoreHashed(docs300k, train, "doc_id", "text"))
}
println(s"[stress] string tier: nano=${aStr.getLong(0)} tri=${aStr.getLong(1)} docs=${aStr.getLong(2)}")
println(s"[stress] hashed tier: nano=${aHash.getLong(0)} tri=${aHash.getLong(1)} docs=${aHash.getLong(2)}")
println(s"[stress] n_tri identical (collisions merge counts, never rows): ${aStr.getLong(1) == aHash.getLong(1)}")
val drift = math.abs(aStr.getLong(0) - aHash.getLong(0)).toDouble /
  math.abs(aStr.getLong(0)).toDouble
println(f"[stress] sb_nano collision drift: ${drift}%.2e (expected > 0 at ~19M grams over 1e9+7)")

val (sInv, aInv) = timed("stupidBackoff STRING on repartition(97)") {
  sbAgg(graft.ops.Corpus.stupidBackoffScore(docs300k.repartition(97),
    train.repartition(13), "doc_id", "text"))
}
println(s"[stress] partition-invariant: ${aInv == aStr}")

// ---- 2. best-fit packing vs concat-and-chunk -----------------------
val (sPack, packStats) = timed("packBestFit 300k docs, budget=64, shards=256") {
  graft.ops.Corpus.packBestFitStats(
    graft.ops.Corpus.packBestFit(docs300k, "doc_id", "text", 64, 256), 64)
    .agg(sum("n_pieces").as("pieces"), sum("n_bins").as("bins"),
      sum("tokens").as("toks"), sum("lb_bins").as("lb")).collect().head
}
val bins = packStats.getLong(1); val toks = packStats.getLong(2)
println(s"[stress] pieces=${packStats.getLong(0)} bins=$bins tokens=$toks lb=${packStats.getLong(3)}")
println(f"[stress] best-fit fill: ${toks * 100.0 / (bins * 64.0)}%.2f%% (lower bound would be ${toks * 100.0 / (packStats.getLong(3) * 64.0)}%.2f%%)")

// truncation census: best-fit cuts ONLY over-budget docs; chunking
// cuts at (almost) every window boundary
val (sCut, cutRow) = timed("truncation census: best-fit vs concat-chunk") {
  val nTok = size(filter(split(graft.ops.Dedup.normText(col("text")), " "),
    w => length(w) > 0))
  val bf = graft.ops.Corpus.packBestFit(docs300k, "doc_id", "text", 64, 256)
    .filter(col("piece") > 0).select(countDistinct(col("doc_id"))).collect().head.getLong(0)
  val cc = graft.ops.Corpus.packSequences(docs300k.select(col("doc_id"), col("text")),
    "doc_id", nTok, budget = 64)
    .filter(col("spans_boundary")).count()
  (bf, cc)
}
println(s"[stress] docs cut: best-fit=${cutRow._1} (over-budget only) vs concat-chunk=${cutRow._2}")

val (sP97, fp97) = timed("packBestFit fingerprint on repartition(97)") {
  graft.ops.Corpus.packBestFit(docs300k.repartition(97), "doc_id", "text", 64, 256)
    .agg(sum(col("bin") * (col("doc_id") * 131L + col("piece") + 7L))).collect().head.getLong(0)
}
val (sP1, fp1) = timed("packBestFit fingerprint on repartition(3)") {
  graft.ops.Corpus.packBestFit(docs300k.repartition(3), "doc_id", "text", 64, 256)
    .agg(sum(col("bin") * (col("doc_id") * 131L + col("piece") + 7L))).collect().head.getLong(0)
}
println(s"[stress] packing fingerprint partition-invariant: ${fp97 == fp1}")

val (sPack64, _) = timed("packBestFit shards=64 (4x fewer folds)") {
  graft.ops.Corpus.packBestFit(docs300k, "doc_id", "text", 64, 64)
    .agg(count(lit(1))).collect()
}
println(f"[stress] shards 256 -> 64: ${sPack}%.1f s -> ${sPack64}%.1f s")
println("[stress] DONE")
sys.exit(0)
