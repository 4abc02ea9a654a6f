package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tabular feature engineering — the NVTabular-shaped layer of the
  * dask-cudf ecosystem (NVTabular's `Categorify` and `TargetEncoding`
  * ops run exactly this computation over dask-cudf frames; reference
  * anchors `[NVTabular/nvtabular/ops/categorify.py :: class
  * Categorify]`, `[ops/target_encoding.py :: class TargetEncoding]`).
  * Re-expressed Spark-first: vocabularies are bounded aggregations,
  * encoding is a broadcast join, and the out-of-fold trick is pure
  * arithmetic over per-(category, fold) partial sums — no RNG, no
  * driver loops, integer-deterministic outputs that hash-gate.
  */
object Features {

  /** Categorify: map a categorical column to contiguous integer ids.
    * Vocabulary = values seen at least `minCount` times, id = dense
    * 1-based rank by (frequency DESC, value ASC) — the
    * frequency-ordered layout embedding tables want (hot categories
    * get small ids). Everything else — rare values, unseen values,
    * NULL — encodes to the reserved OOV id 0, the standard
    * hashing-free fallback bucket.
    *
    * 100 TB posture: the vocabulary is one groupBy over the column
    * (bounded by the column's cardinality — categorical by
    * assumption; the rank window runs over the VOCABULARY, not the
    * corpus) and the encode is a broadcast join against it. For
    * columns whose cardinality rivals the row count, categorify is
    * the wrong op — use a hash bucket instead.
    *
    * @return the input plus `<col>_id` (long, 0 = OOV/rare/null)
    */
  def categorify(df: DataFrame, c: String, minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val vocab = df.filter(col(c).isNotNull)
      .groupBy(col(c).as("__v"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount)
      .withColumn(s"${c}_id",
        row_number().over(Window.orderBy(col("__n").desc, col("__v").asc))
          .cast("long"))
      .select(col("__v"), col(s"${c}_id"))
    df.join(broadcast(vocab), df(c) === vocab("__v"), "left")
      .drop("__v")
      .withColumn(s"${c}_id", coalesce(col(s"${c}_id"), lit(0L)))
  }

  /** Leakage-safe target encoding: replace a categorical column with
    * the smoothed mean of the target over OTHER folds (the K-fold
    * out-of-fold scheme every gradient-boosting pipeline uses —
    * encoding a row with statistics that include its own target leaks
    * the label). Folds are hash-derived from the id (Knuth
    * multiplicative, no RNG), so the encoding is reproducible across
    * runs and engines.
    *
    * Arithmetic is integer end-to-end: the target quantizes to cents,
    * the global prior is floor micro-cents, and the encoding is
    *   enc_micro = (sumOther_cents·1e6 + alpha·prior_micro)
    *               div (cntOther + alpha)
    * — a deterministic smoothed mean in micro-cents. A (category,
    * fold) cell whose complement is empty (category seen ONLY in this
    * fold) falls back to the prior, as does an unseen/null category.
    *
    * 100 TB posture: one groupBy to (category, fold) partials —
    * |categories|·k rows — one category rollup, one broadcast join
    * back. The corpus is scanned once.
    *
    * @return input plus `fold` and `<cat>_te_micro` (long micro-cents)
    */
  def targetEncode(df: DataFrame, id: String, cat: String, target: String,
      k: Int = 4, alpha: Long = 10L): DataFrame = {
    require(k >= 2, s"need at least 2 folds, got $k")
    require(alpha >= 1, s"alpha must be >= 1, got $alpha")
    val cents = round(col(target) * 100).cast("long")
    val base = df.withColumn("fold",
      pmod(pmod(col(id).cast("long") * 2654435761L, lit(4294967296L)),
        lit(k.toLong)))
    val cells = base
      .groupBy(col(cat).as("__c"), col("fold").as("__f"))
      .agg(sum(cents).as("__s"), count(lit(1)).as("__n"))
    val totals = cells.groupBy(col("__c"))
      .agg(sum(col("__s")).as("__st"), sum(col("__n")).as("__nt"))
    // integer div end-to-end: the 1e6-scaled sums exceed 2^53 at large
    // SF, where double division would silently round — div stays exact
    // anywhere inside int64
    val prior = base.agg(sum(cents).as("__s0"), count(lit(1)).as("__n0"))
      .select(expr("(__s0 * 1000000) div __n0").as("__prior_micro"))
    val enc = cells.join(totals, "__c")
      .crossJoin(broadcast(prior))
      .select(col("__c"), col("__f"),
        expr(s"((__st - __s) * 1000000 + $alpha * __prior_micro) div " +
          s"(__nt - __n + $alpha)").as("__te"))
    base.join(broadcast(enc),
        base(cat) === enc("__c") && base("fold") === enc("__f"), "left")
      .drop("__c", "__f")
      .crossJoin(broadcast(prior))
      .withColumn(s"${cat}_te_micro",
        coalesce(col("__te"), col("__prior_micro")))
      .drop("__te", "__prior_micro")
  }
}
