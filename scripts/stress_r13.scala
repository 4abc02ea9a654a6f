// Round-13 scale receipts for the new op families.
//  1. marginMinedPairsIvf vs the quadratic exact tier: the IVF
//     candidate cut is the whole 100 TB story for bitext mining --
//     measure the scored-pair count and wall at a corpus size where
//     the exact tier's |A|*|B| matrix is already painful.
//  2. kTruss fixpoint on a layered cascade at 100x the q251b fixture:
//     per-round cost stays |E|-bounded and the round count is the
//     structure's peel depth, not the edge count.
//  3. auditFingerprint at 20M rows: ONE scan, bounded agg, and the
//     fingerprint is bit-identical under a 7x repartition (the
//     order-free claim at scale, not just in the unit test).
//  4. seasonalNaiveBacktest at 20M events: daily rollup + one
//     equi-join -- wall dominated by the scan, as a backtest must be.
// Run:  /opt/spark/bin/spark-shell --master "local[32]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 100g \
//         --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.sql.adaptive.enabled=true \
//         --conf spark.ui.enabled=false \
//         -i /root/repo/scripts/stress_r13.scala
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
  println(f"[stress] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n%d")
}
import spark.implicits._

// ---- 1. IVF margin mining vs the exact quadratic tier --------------
// 40k x 40k synthetic 64-dim embeddings (deterministic hash floats).
// The exact tier would score 1.6e9 pairs; IVF at 64 clusters / 2
// probes scores ~2/64 of that. We also count the candidate pairs the
// IVF tier actually scored (the receipt the quadratic form can't give).
val dim = 64
def synth(n: Long, off: Long) = spark.range(n)
  .select((col("id") * 2 + off).as("vec_id"),
    transform(sequence(lit(0), lit(dim - 1)),
      j => (pmod(col("id") * lit(37) + j * lit(101) + lit(off), lit(997))
        / lit(997.0)).cast("float")).as("embedding"))
val a40 = synth(40000, 0)
val b40 = synth(40000, 1)
timed("margin-ivf-40kx40k") {
  graft.ops.Similarity.marginMinedPairsIvf(a40, b40, "vec_id", "embedding",
    k = 4, minMarginPpm = 1000000L, nClusters = 64, nProbe = 2,
    itersCoarse = 2).count()
}
// exact tier at 8k x 8k (64M pairs) for the per-pair cost slope --
// running it at 40k would be the point of the receipt, so don't.
val a8 = synth(8000, 0)
val b8 = synth(8000, 1)
timed("margin-exact-8kx8k") {
  graft.ops.Similarity.marginMinedPairs(a8, b8, "vec_id", "embedding",
    k = 4, minMarginPpm = 1000000L).count()
}

// ---- 2. kTruss fixpoint on a 100x layered cascade ------------------
// 800-cycle + chords + apexes (the q251b structure at 100 nodes ->
// 800) welded to 40 disjoint K5s: fixpoint peels the same 3 layers
// regardless of size; per-round work is |E|-bounded.
val m = 800
val cyc = (0 until m).map(i => (i.toLong, ((i + 1) % m).toLong))
val chd = (0 until m).map(i => (i.toLong, ((i + 2) % m).toLong))
val apx = (0 until m).flatMap(i => Seq((i.toLong, (10000 + i).toLong),
  ((10000 + i).toLong, ((i + 2) % m).toLong)))
val k5s = (0 until 40).flatMap { c =>
  val base = 20000 + c * 10
  for { x <- 0 to 4; y <- (x + 1) to 4 }
    yield ((base + x).toLong, (base + y).toLong)
}
val bigTruss = (cyc ++ chd ++ apx ++ k5s).toDF("src", "dst")
timed("ktruss-fixpoint-100x") {
  graft.ops.Graph.kTruss(bigTruss, "src", "dst", k = 4, rounds = -1).count()
}

// ---- 3. auditFingerprint at 20M rows, partition invariance ---------
val big = spark.range(20000000L)
  .select(col("id"), pmod(col("id"), lit(16)).cast("string").as("grp"),
    concat(lit("payload-"), col("id")).as("v"))
var fpA: Array[org.apache.spark.sql.Row] = null
timed("fingerprint-20M") {
  fpA = graft.ops.Validate.auditFingerprint(big, "grp", Seq("id", "v"))
    .orderBy("grp").collect()
  fpA.length.toLong
}
timed("fingerprint-20M-repart7") {
  val fpB = graft.ops.Validate
    .auditFingerprint(big.repartition(7), "grp", Seq("id", "v"))
    .orderBy("grp").collect()
  assert(fpA.map(_.toSeq).toSeq == fpB.map(_.toSeq).toSeq,
    "fingerprint must be partitioning-invariant")
  fpB.length.toLong
}

// ---- 4. seasonalNaiveBacktest at 20M events ------------------------
val ev20 = spark.range(20000000L)
  .select(pmod(col("id"), lit(1000)).as("k"),
    timestamp_micros(lit(1704067200000000L) +
      pmod(col("id") * 777767777L, lit(90L * 86400000000L))).as("ts"),
    (pmod(col("id") * 31, lit(10000)) / 100.0).as("v"))
timed("seasonal-backtest-20M") {
  graft.ops.FrameOps.seasonalNaiveBacktest(ev20, "k", "ts", "v",
    season = 7).count()
}

println("[stress] done")
sys.exit(0)
