// Round-14 wave-2 scale receipts: the feature-transform layer
// (q280-q284) and windowed co-occurrence PMI (q282) at 20M rows.
//  1. standardScale at 20M: ONE 3-number bounded agg over the train
//     folds + a broadcast map stage -- wall must read like a scan, and
//     the z of a train row must be invariant under a 7x repartition
//     AND under perturbing serve-fold values (the leakage receipt at
//     scale).
//  2. robustScale at 20M: the quantileLadder prefix-scan fit (range
//     partition + local ranks + broadcast offsets) -- wall vs
//     standardScale shows the order-statistics premium; same
//     invariance receipts.
//  3. cdfTransform at 20M: one searchSortedLarge union scan ranking
//     20M probes against a 15M-row train distribution -- the receipt
//     is wall + spot-checked ranks on known quantile points (the
//     naive correlated-count replay is O(n^2) = 3e14 comparisons,
//     unrunnable; the scan does it in one pass).
//  4. hashBucketCensus at 20M rows x 1M distinct categories into 4096
//     buckets: census bounded by cardinality, max load ~ n/buckets.
//  5. cooccurrencePmi at 2M docs x ~30 tokens (60M positions, w=3 ->
//     ~170M map-side pairs, zero pair-gen shuffle): wall + vocab-cut
//     invariance (minCount changes WHICH rows ship, never values --
//     checked on the surviving intersection).
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_r14b.scala
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

// 20M rows, heavy-tailed values with a few huge spikes (the shape that
// separates robust from standard scaling), ~25% serve fold
val feat = spark.range(20000000L).select(
  col("id"),
  (when(pmod(col("id"), lit(100000)) === 0, lit(5000000.0))
    .otherwise(pmod(col("id") * 2654435761L, lit(100000L)) / 10.0)).as("v"))

timed("standardScale 20M") {
  graft.ops.Features.standardScale(feat, "id", "v").count()
}
timed("robustScale 20M") {
  graft.ops.Features.robustScale(feat, "id", "v").count()
}
timed("cdfTransform 20M") {
  graft.ops.Features.cdfTransform(feat, "id", "v").count()
}

// invariance receipts on a fixed probe set (first 5 train ids)
def probe(df: org.apache.spark.sql.DataFrame): Seq[(Long, Any)] =
  df.filter(col("fold") =!= 0 && col("id") < 20).orderBy("id")
    .collect().map(r => (r.getLong(0), r.get(r.length - 1))).toSeq
val s1 = probe(graft.ops.Features.standardScale(feat, "id", "v"))
val s2 = probe(graft.ops.Features.standardScale(feat.repartition(224), "id", "v"))
// perturb ONLY serve-fold (fold 0) values 100x: train stats untouched
val perturbed = feat.select(col("id"),
  when(expr("(pmod(CAST(id AS BIGINT) * 2654435761L, 4294967296L) * 4)" +
      " div 4294967296L") === 0,
    col("v") * 100).otherwise(col("v")).as("v"))
val s3 = probe(graft.ops.Features.standardScale(perturbed, "id", "v"))
println(s"[stress] standardScale partition-invariant: ${s1 == s2}  leakage-free: ${s1 == s3}")
val r1 = probe(graft.ops.Features.robustScale(feat, "id", "v"))
val r2 = probe(graft.ops.Features.robustScale(feat.repartition(224), "id", "v"))
val r3 = probe(graft.ops.Features.robustScale(perturbed, "id", "v"))
println(s"[stress] robustScale   partition-invariant: ${r1 == r2}  leakage-free: ${r1 == r3}")
// spikes: standard z of the spike rows is pulled down by the inflated
// std; robust z is not (the reason RobustScaler exists)
val spikeS = graft.ops.Features.standardScale(feat, "id", "v")
  .filter(pmod(col("id"), lit(100000)) === 0).agg(min("z_bp")).head.getLong(0)
val spikeR = graft.ops.Features.robustScale(feat, "id", "v")
  .filter(pmod(col("id"), lit(100000)) === 0).agg(min("z_bp")).head.getLong(0)
println(s"[stress] spike z: standard=$spikeS robust=$spikeR (robust >> standard)")

// cdf spot-check: the empirical rank of the median-ish value ~ 5000 bp
val cdf = graft.ops.Features.cdfTransform(feat, "id", "v")
val medBp = cdf.filter(col("id") === 1000001L).select("cdf_bp").head.getLong(0)
println(s"[stress] cdfTransform rank spot-check id=1000001 -> $medBp bp")

// ---- 4. hashBucketCensus at 20M x 1M categories ---------------------
val cats = spark.range(20000000L).select(col("id"),
  concat(lit("cat"), pmod(col("id") * 961748927L, lit(1000000L))).as("c"))
timed("hashBucketCensus 20M/1M/4096") {
  graft.ops.Features.hashBucketCensus(cats, "c", 4096).count()
}
val cen = graft.ops.Features.hashBucketCensus(cats, "c", 4096)
  .agg(sum("n_rows").as("mass"), max("n_cats").as("maxc"),
    max("max_cat_rows").as("maxl")).head
println(s"[stress] census mass=${cen.getLong(0)} maxCatsPerBucket=${cen.getLong(1)} maxLoad=${cen.getLong(2)}")

// ---- 5. cooccurrencePmi at 2M docs ----------------------------------
// ~30-token docs over a ~3k-word Zipf-ish vocabulary: 60M positions,
// w=3 -> ~174M pairs, all generated map-side
val docs = spark.range(2000000L).select(col("id").as("doc_id"),
  array_join(transform(sequence(lit(1), lit(30)),
    i => concat(lit("w"),
      pmod(col("id") * 31L + i * i * 2654435761L, lit(3000L)))), " ")
    .as("text"))
timed("cooccurrencePmi 2M docs w=3") {
  graft.ops.Corpus.cooccurrencePmi(docs, "text", window = 3,
    minCount = 100L, minPair = 50L).count()
}
// cut-invariance at scale: tighter cuts drop rows, never move values
val loose = graft.ops.Corpus.cooccurrencePmi(docs, "text", 3, 100L, 50L)
  .select("term_a", "term_b", "pmi")
val tight = graft.ops.Corpus.cooccurrencePmi(docs, "text", 3, 1000L, 500L)
  .select("term_a", "term_b", "pmi")
val moved = tight.as("t").join(loose.as("l"), Seq("term_a", "term_b"))
  .filter(col("t.pmi") =!= col("l.pmi")).count()
println(s"[stress] cooccurrencePmi cut-invariant: ${moved == 0} (moved=$moved)")

println("[stress] r14b receipts complete")
sys.exit(0)
