// Round-17 scale receipt: the SuffixRankMemo at the r16 100k-doc /
// ~18M-position suffix fixture (same corpus construction as
// stress_r16 part 2, plant + 24 md5 words). What this pins down:
//
//   1. The memo HITS across FRESH plan constructions at scale -- the
//      bench/verify pattern (each query rebuilds its input DataFrame)
//      shares ONE kernel build: consumers pay only their own joins.
//   2. Marginal consumer cost at 100k docs: rewrite (char posexplode +
//      anti-join + rebuild) and attribution (class agg + join-back)
//      WITHOUT re-paying the ~100 s kernel the r16 receipt measured
//      three times over (one per public op).
//   3. Self-heal at scale: an unpersist-everything purge after the
//      kernel build must make the next consumer RECOMPUTE (slow but
//      correct), never throw CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
//
// Run: /opt/spark/bin/spark-shell --master local[32] \
//   --driver-memory 24g --conf spark.sql.shuffle.partitions=32 \
//   --driver-class-path target/scala-2.13/classes \
//   --conf spark.ui.enabled=false -i scripts/stress_r17.scala
import org.apache.spark.sql.functions._

def timed[T](tag: String)(body: => T): (Double, T) = {
  val t0 = System.nanoTime()
  val r = body
  val sec = (System.nanoTime() - t0) / 1e9
  println(f"[stress] $tag%-52s ${sec}%8.1f s")
  (sec, r)
}

val plant = "all work and no play makes jack a dull boy every single day.."
// fresh plan PER CALL, like the bench/verify pattern -- the memo must
// hit on sameResult, not on object identity
def docs100k = {
  val w6 = (0 until 24).map(j =>
    substring(md5(pmod(col("id") * (j * 17 + 11), lit(40000))
      .cast("string")), 1, 5))
  spark.range(100000L).select(col("id").as("doc_id"),
    when(pmod(col("id"), lit(10L)) === 0,
        concat_ws(" ", (w6.take(8) :+ lit(plant)) ++ w6.drop(8): _*))
      .otherwise(concat_ws(" ", w6: _*)).as("text"))
}

graft.ops.Corpus.suffixMemoClear()
val c0 = graft.ops.Corpus.suffixMemoStats._1

val (secSpans, nSpans) = timed("spans COLD (kernel build, L=30)") {
  graft.ops.Corpus.suffixRankSpans(docs100k, "doc_id", "text", 30)
    .agg(sum("span_len"), count(lit(1))).collect().head.getLong(1)
}
val builds1 = graft.ops.Corpus.suffixMemoStats._1 - c0
val (secRw, nRw) = timed("rewrite WARM (memo hit, fresh plan)") {
  graft.ops.Corpus.suffixRankRewrite(docs100k, "doc_id", "text", 30)
    .agg(sum("n_removed"), count(lit(1))).collect().head.getLong(0)
}
val (secAttr, nAttr) = timed("attribution WARM (memo hit, fresh plan)") {
  graft.ops.Corpus.dupAttribution(docs100k, "doc_id", "text", 30, 1000)
    .agg(sum("n_windows")).collect().head.getLong(0)
}
val builds3 = graft.ops.Corpus.suffixMemoStats._1 - c0
println(s"[stress] kernel builds across the 3 ops: $builds3 (must be 1; " +
  s"cold build was $builds1)")
println(f"[stress] family total = ${secSpans + secRw + secAttr}%.1f s " +
  f"(vs ~3x kernel without the memo; r16 receipt: one spans pass 101 s)")
println(s"[stress] outputs non-trivial: spans=$nSpans removedChars=$nRw " +
  s"attrWindows=$nAttr (all must be > 0)")

// ---- self-heal under an unpersist-everything purge ----------------
spark.catalog.clearCache()
spark.sparkContext.getPersistentRDDs.values
  .foreach(_.unpersist(blocking = true))
val (secHeal, healed) = timed("attribution after purge (self-heal rebuild)") {
  try {
    graft.ops.Corpus.dupAttribution(docs100k, "doc_id", "text", 30, 1000)
      .agg(sum("n_windows")).collect().head.getLong(0)
  } catch { case e: Throwable => println("[stress] SELF-HEAL FAILED: " +
    e.getClass.getName + ": " + e.getMessage.take(150)); -1L }
}
val healBuilds = graft.ops.Corpus.suffixMemoStats._1 - c0
println(s"[stress] self-heal: result=${healed == nAttr} (must match), " +
  s"builds now $healBuilds (must be 2 -- the purged entry recomputed)")
graft.ops.Corpus.suffixMemoClear()
System.exit(0)
