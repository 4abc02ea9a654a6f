// 100x stress, part 2: the DOCUMENTED pipeline order for a massively
// duplicated corpus -- exact dedup FIRST, capped fuzzy jaccard on the
// survivors -- plus q145 and its nClusters scale knob.
// (Part 1, scripts/stress100.scala, showed raw q95b on the 100x corpus
// degenerates by design: 100 exact copies make EVERY doc "unsafe" under
// the cap's exactness bound, so hot postings are kept and pair
// generation reverts to the uncapped quadratic -- the corpus shape the
// exact-first ordering exists for.)
// Run as in stress100.scala (expects /tmp/stress100 already written).
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

val sf = "/root/testdata/sf0.1"
val out = "/tmp/stress100"

object M {
  @volatile var shuffleWrite = 0L
  @volatile var peakExecMem = 0L
}
spark.sparkContext.addSparkListener(new SparkListener {
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      M.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
      M.peakExecMem = math.max(M.peakExecMem, m.peakExecutionMemory)
    }
  }
})
def timed(tag: String)(f: => Unit): Unit = {
  M.shuffleWrite = 0L; M.peakExecMem = 0L
  val t0 = System.nanoTime()
  f
  val sec = (System.nanoTime() - t0) / 1e9
  println(f"[stress] $tag%-40s $sec%8.2f s  " +
    f"shuffleWrite=${M.shuffleWrite / 1048576.0}%9.1f MiB  " +
    f"peakTaskMem=${M.peakExecMem / 1048576.0}%7.1f MiB")
}
def drain(df: org.apache.spark.sql.DataFrame): Unit =
  df.queryExecution.toRdd.foreach(_ => ())

// warmup (JIT) on the small corpus, untimed
drain(graft.SparkEntry.queries("q95b_ngram_jaccard_capped")(spark, sf))

// documented order at 100x: exact dedup -> capped jaccard on the reps
def dedupThenJaccard(dir: String): org.apache.spark.sql.DataFrame = {
  val docs = graft.Tables.documents(spark, dir)
  val reps = graft.ops.Dedup.exactDuplicateGroups(docs, "doc_id", "text")
    .select(col("keep_id").as("doc_id"))
  val surv = docs.join(reps, "doc_id")
    .withColumn("blk", pmod(col("doc_id"), lit(4)))
  // maxUnsafeFrac=1.0: this harness deliberately measures the cap on a
  // 100%-hot-heavy survivor set (the round-7 guard would refuse it)
  graft.ops.Dedup.ngramJaccardPairs(surv, "doc_id", "text", "blk",
    ngram = 3, minJaccard = 0.3, maxDf = 8, maxUnsafeFrac = 1.0)
}
timed("exact+capped-jaccard @ sf0.1")(drain(dedupThenJaccard(sf)))
timed("exact+capped-jaccard @ 100x")(drain(dedupThenJaccard(out)))

// q145 semantic dedup, round-7 state: the size-derived overload is the
// default path (q145 itself now routes through it) and kmeansAssign is
// the map-side argmax (N shuffled rows regardless of k). Rows:
//   fixed k=8 at 100x   -- the documented misuse, for reference
//   fixed k=64 at 100x  -- round-6's measured-good manual setting
//   derived (tcs=63)    -- the new default, both scales: cluster size
//                          (and the quadratic pair term) held constant
// fixed k=8 (the r6 misuse row) is NOT rerun here — it was measured at
// 825.6 s (r6, window assign) and 353.7 s (r7, argmax assign); paying
// ~6 min per rerun to reconfirm a documented anti-pattern is waste.
timed("q145 fixed k=64 @ 100x")(drain(
  graft.ops.Corpus.semanticDupPairs(
    graft.Tables.embeddings(spark, out), "vec_id", "embedding",
    nClusters = 64, threshold = 0.4, iters = 2)))
// constant cluster size (SemDeDup paper recipe): pair work linear but
// the exact assign is O(N*k) = O(N^2/tcs) -- measured 285.7 s @ 100x
timed("q145 derived tcs=63 @ 100x")(drain(
  graft.ops.Corpus.semanticDupPairs(
    graft.Tables.embeddings(spark, out), "vec_id", "embedding",
    threshold = 0.4, targetClusterSize = 63, iters = 2)))
// balanced sqrt(N) default: assign and pair work equalized at N^1.5
timed("q145 derived sqrt @ sf0.1")(drain(
  graft.SparkEntry.queries("q145_semantic_dedup")(spark, sf)))
timed("q145 derived sqrt @ 100x")(drain(
  graft.SparkEntry.queries("q145_semantic_dedup")(spark, out)))
System.exit(0)
