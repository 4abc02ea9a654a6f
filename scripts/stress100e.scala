// Containment-decon at 100x with exact-dedup-first ordering (the q95b
// guard applied to q140c): dedup corpus AND benchmark to text-distinct
// representatives before the gram join. On the wholesale-replicated
// fixture this collapses the per-gram df product from 100x100 back to
// 1x1 -- the measured fix for the raw path's quadratic pair blowup.
// Run like stress100d.scala (spark-shell -i).
import org.apache.spark.sql.functions._

val big = "/tmp/stress100"

def dedupReps(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
  import graft.ops.Dedup
  df.withColumn("fp", md5(Dedup.normText(col("text"))))
    .withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
    .filter(col("rn") === 1).drop("fp", "rn")
}

val docs = spark.read.parquet(s"$big/documents.parquet")
val t0 = System.nanoTime()
val corpus = dedupReps(docs.filter(pmod(col("doc_id"), lit(97)) =!= 0))
val bench = dedupReps(docs.filter(pmod(col("doc_id"), lit(97)) === 0))
val n = graft.ops.Corpus.containmentPairs(corpus, bench, "doc_id", "text",
  3, 0.5).count()
println(f"[stress] 100x-dedup-first q140c_containment ${(System.nanoTime() - t0) / 1e9}%8.2f s  pairs=$n")
System.exit(0)
