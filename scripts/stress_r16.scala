// Round-16 scale receipts, wave 1: the gopherRepetition HASH-KEYED
// census tier (q297b, r15 verdict item 2).
//   TWO findings this receipt pins down (both contradict the r15
//   prose that motivated the tier -- measurement beats guessing):
//   1. The gram census never shuffles strings in EITHER tier: the
//      window sort already hash-partitions on doc_id, which satisfies
//      the census aggregation's ClusteredDistribution
//      (subset-of-keys rule), so no Exchange carries a gram key
//      (asserted below; total shuffle write ~10 MB in both tiers --
//      just the 12M word rows for the window sort).
//   2. Where the key type DOES matter is the census HashAggregate
//      itself. Across THREE receipt runs (min-of-2 interleaved, ~4M
//      groups/partition) the hashed tier is stably 0.59-0.63x the
//      string tier (final build: hashed 12.1/12.8 s vs string
//      20.4/21.6 s, BOTH fast-map configs -- fixed 8-byte keys
//      hash/compare in constant time, agg map + spill free of
//      20-100-byte gram strings). Secondary: the codegen two-level
//      fast map (2^16 entries) never beat OFF in any run and degraded
//      cells up to 2x inside the two heat-affected runs (string+ON
//      47 s vs OFF 19-22 s) -- prefer twolevel OFF at census
//      cardinality (gopherRepetitionHashed scaladoc).
//   Receipt: [string, hashed] x [twolevel on, off], 2 interleaved
//   passes each, per-cell MIN (this host shows 1.5x heat windows);
//   dup/line share sums bit-equal between tiers.
//   Also covered here: HashSpec.polyHash is Horner-unrolled 6-wide
//   (one `%` per 6 bytes, bit-identical) -- the per-byte modulo was
//   half the hashed tier's census cost before the unroll.
// Run:  /opt/spark/bin/spark-shell --master "local[16]" \
//         --driver-class-path /root/repo/target/scala-2.13/classes \
//         --driver-memory 60g --conf spark.sql.shuffle.partitions=32 \
//         --conf spark.ui.enabled=false -i scripts/stress_r16.scala
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  System.gc()
}

val shuffleW = new AtomicLong(0L)
spark.sparkContext.addSparkListener(
  new org.apache.spark.scheduler.SparkListener {
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      shuffleW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  })

def timedShuffle(tag: String)(f: => Long): (Double, Long) = {
  purge()
  Thread.sleep(2000) // drain listener events from the previous run
  shuffleW.set(0L)
  val t0 = System.nanoTime()
  val n = f
  val sec = (System.nanoTime() - t0) / 1e9
  Thread.sleep(2000) // let the async listener bus catch up
  val bytes = shuffleW.get()
  println(f"[stress] $tag%-34s $sec%8.2f s  rows=$n%d  shuffleMB=${bytes / 1e6}%10.1f")
  (sec, bytes)
}
import spark.implicits._

// corpus shape of stress_r15b receipt 2 (1M docs x 12 words, 500-token
// vocab -> ~100M (doc, n, gram) rows, heavy within-doc dup census) but
// with HIGH-ENTROPY 9-char md5-derived words: real text does not
// LZ4-compress like "tokNNN" does, so string-key costs are honest
val words12 = array((0 until 12).map(j =>
  substring(md5(pmod(col("id") * (j * 13 + 7), lit(500))
    .cast("string")), 1, 9)): _*)
val docs1m = spark.range(1000000L).select(
  col("id").as("doc_id"), array_join(words12, " ").as("text"))

// structural assert: the gram census key (g / gh) appears in NO
// Exchange's partitioning -- the doc-partitioned window feeds the
// census co-partitioned, so gram strings/hashes never shuffle
for ((tag, frame) <- Seq(
    "string" -> graft.ops.TextAnalysis.gopherRepetition(docs1m, "doc_id", "text"),
    "hashed" -> graft.ops.TextAnalysis.gopherRepetitionHashed(docs1m, "doc_id", "text"))) {
  val plan = frame.queryExecution.executedPlan.toString
  val gramKeyShuffled = plan.split("\n")
    .filter(_.contains("Exchange hashpartitioning"))
    .exists(l => l.contains(" g#") || l.contains(" gh#") ||
      l.contains("(g#") || l.contains("(gh#"))
  println(s"[stress] $tag tier: gram key in an Exchange = $gramKeyShuffled (must be false)")
}

// sum right-side columns: bare count() lets Catalyst eliminate the
// unique-key left joins and measure only the base scan. 2 interleaved
// passes per cell, per-cell MIN: a single A/B is not a measurement on
// this host. One warmup pass absorbs codegen/JIT (r1 of the first
// profile read 89 s vs 14 s warm).
val TWOLEVEL = "spark.sql.codegen.aggregate.map.twolevel.enabled"
def runTier(tag: String, twolevel: Boolean, hashed: Boolean) = {
  spark.conf.set(TWOLEVEL, twolevel.toString)
  val r = timedShuffle(f"$tag twolevel=$twolevel") {
    val frame = if (hashed)
      graft.ops.TextAnalysis.gopherRepetitionHashed(docs1m, "doc_id", "text")
    else graft.ops.TextAnalysis.gopherRepetition(docs1m, "doc_id", "text")
    frame.agg(sum("dup5_bp"), sum("top2_bp"), count(lit(1)))
      .collect().head.getLong(2)
  }
  spark.conf.set(TWOLEVEL, "true")
  r
}
runTier("warmup (string)", twolevel = true, hashed = false)
val cells = for {
  pass <- 1 to 2
  (tag, tl, h) <- Seq(("string", true, false), ("hashed", true, true),
    ("string", false, false), ("hashed", false, true))
} yield ((tag, tl), runTier(s"p$pass $tag", tl, h)._1)
val mins = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
for (((tag, tl), sec) <- mins.toSeq.sortBy(_._1.toString))
  println(f"[stress] MIN-OF-2 $tag%-7s twolevel=$tl%-5s $sec%8.2f s")
println(f"[stress] hashed/string wall ratio: twolevel-on=${mins(("hashed", true)) / mins(("string", true))}%.3f  twolevel-off=${mins(("hashed", false)) / mins(("string", false))}%.3f")

// ---- 2. suffixRankSpans: the exact suffix-ranking substring-dedup
// tier (q321, r15 verdict item 4) at 100k docs / ~18M char positions.
// 10% of docs carry a planted 62-char boilerplate; the receipt checks
// wall time (vs the token-window dupSpans approximation on the same
// corpus for context), that every planted doc is covered by a span at
// least as long as the plant, and bit-identical spans under a 97-way
// input repartition (partition invariance of the distributed dense
// rank + its localCheckpoint pid pinning).
val plant = "all work and no play makes jack a dull boy every single day.."
val w6 = (0 until 24).map(j =>
  substring(md5(pmod(col("id") * (j * 17 + 11), lit(40000))
    .cast("string")), 1, 5))
val docs100k = spark.range(100000L).select(col("id").as("doc_id"),
  when(pmod(col("id"), lit(10L)) === 0,
      concat_ws(" ", (w6.take(8) :+ lit(plant)) ++ w6.drop(8): _*))
    .otherwise(concat_ws(" ", w6: _*)).as("text"))
val (secSuf, _) = timedShuffle("suffixRankSpans 100k docs L=30") {
  graft.ops.Corpus.suffixRankSpans(docs100k, "doc_id", "text", 30)
    .agg(sum("span_len"), count(lit(1))).collect().head.getLong(1)
}
val (secDup, _) = timedShuffle("dupSpans (token windows) 100k docs") {
  graft.ops.Corpus.dupSpans(docs100k, "doc_id", "text", 5)
    .agg(sum("n_dup"), count(lit(1))).collect().head.getLong(1)
}
println(f"[stress] suffix exact tier = ${secSuf}%.1f s vs token-window approx = ${secDup}%.1f s at 100k docs")
val spans = graft.ops.Corpus.suffixRankSpans(docs100k, "doc_id", "text", 30)
val planted = spans.filter(pmod(col("doc_id"), lit(10L)) === 0 &&
  col("span_len") >= plant.length)
  .select(countDistinct(col("doc_id"))).collect().head.getLong(0)
println(s"[stress] planted docs covered by a >=62-char span: $planted / 10000 (must be 10000)")
val a = spans.orderBy("doc_id", "span_start").collect().mkString("|").hashCode
val b = graft.ops.Corpus.suffixRankSpans(docs100k.repartition(97),
    "doc_id", "text", 30)
  .orderBy("doc_id", "span_start").collect().mkString("|").hashCode
println(s"[stress] suffix spans partition-invariant: ${a == b}")

// dup-share equality between the tiers at this scale (order-free
// columns; top*_bp can differ under count ties -- scaladoc)
val sCols = graft.ops.TextAnalysis.gopherRepetition(docs1m, "doc_id", "text")
  .agg(sum("dup5_bp"), sum("dup10_bp"), sum("dup_line_bp")).collect().head
val hCols = graft.ops.TextAnalysis.gopherRepetitionHashed(docs1m, "doc_id", "text")
  .agg(sum("dup5_bp"), sum("dup10_bp"), sum("dup_line_bp")).collect().head
println(s"[stress] dup-share sums equal: ${sCols == hCols}  $sCols vs $hCols")
System.exit(0)
