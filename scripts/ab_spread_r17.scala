// A/B: heavy text/dedup pipelines on the single-row-group documents
// scan (spread disengaged, status quo) vs a pre-repartitioned input
// (equivalent to spread engaging). Interleaved, min-of-N, identity
// asserted. Tooling only.
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

val sfDir = sys.props.getOrElse("graft.ab.sf", "/root/testdata/sf0.1")
val rounds = sys.props.getOrElse("graft.ab.rounds", "4").toInt
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (16L * 1024 * 1024).toString)
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")

def docs(): DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
  .withColumn("n_toks",
    size(filter(split(graft.ops.Dedup.normText(col("text")), " "),
      t => length(t) > 0)))
def docsSpread(): DataFrame = docs().repartition(32, col("doc_id"))

def purge(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.foreach(_._2.unpersist(blocking = false))
}

def kb(d: DataFrame): DataFrame =
  graft.ops.Dedup.dedupCorpusKeepBest(d, "doc_id", "text", "n_toks")
    .orderBy(col("doc_id"))

val r1 = kb(docs()).collect().toSeq
purge()
val r2 = kb(docsSpread()).collect().toSeq
purge()
println(s"[ab] identical=${r1 == r2} rows=${r1.size}")

def time(f: => DataFrame): Double = {
  val t0 = System.nanoTime()
  f.queryExecution.toRdd.foreach(_ => ())
  val s = (System.nanoTime() - t0) / 1e9
  purge(); s
}
val t1s = scala.collection.mutable.ArrayBuffer.empty[Double]
val t2s = scala.collection.mutable.ArrayBuffer.empty[Double]
(1 to rounds).foreach { r =>
  val a = time(kb(docs()))
  val b = time(kb(docsSpread()))
  t1s += a; t2s += b
  println(f"[ab] round $r asis ${a}%7.3f s   spread ${b}%7.3f s")
}
println(f"[ab] MIN asis ${t1s.min}%7.3f   spread ${t2s.min}%7.3f  ratio ${t1s.min / t2s.min}%5.2f")
sys.exit(0)
