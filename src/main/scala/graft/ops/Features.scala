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

  /** Knuth multiplicative fold hash — TOP bits, not low. The naive
    * `(id·A mod 2³²) mod k` is WRONG for this constant: A ≡ 1 (mod 4),
    * so its low two bits pass the id's own low bits straight through —
    * fold was literally `id mod 4`, and any id-periodic structure
    * (striped spikes, sharded id ranges) lands whole in one fold (the
    * r14b stress receipt caught exactly this: every id ≡ 0 (mod 10⁵)
    * spike fell in the serve fold). Knuth's construction takes the HIGH
    * bits: fold = (h·k) div 2³², the multiply-shift range mapping.
    *
    * h·A is computed in SPLIT 16-bit halves — h·A mod 2³² =
    * ((h₁·A mod 2¹⁶)·2¹⁶ + h₀·A) mod 2³² where h = h₁·2¹⁶ + h₀ — so
    * every intermediate stays below 2⁴⁸: exact over the WHOLE BIGINT
    * id domain, safe under spark.sql.ansi.enabled, and the identical
    * arithmetic fits DuckDB's int64 (the r14 ADVICE noted the old
    * one-multiply spellings diverged per-engine above id ≈ 3.47e9).
    */
  def foldCol(id: String, k: Int): Column = {
    val h = s"pmod(CAST($id AS BIGINT), 4294967296L)"
    expr(s"(pmod(pmod(($h div 65536L) * 2654435761L, 65536L) * 65536L" +
      s" + pmod($h, 65536L) * 2654435761L, 4294967296L) * $k)" +
      " div 4294967296L")
  }

  /** DuckDB replay of [[foldCol]] — one spelling, both engines, the
    * same split-multiply construction (every intermediate < 2⁴⁸), with
    * the positive-mod idiom standing in for Spark's pmod. Interpolated
    * into the q278/q280/q283/q284/q284b oracle SQL so the two engines
    * cannot drift. */
  def foldSql(id: String, k: Int): String = {
    val h = s"((($id) % 4294967296 + 4294967296) % 4294967296)"
    s"(((((($h // 65536) * 2654435761) % 65536) * 65536" +
      s" + ($h % 65536) * 2654435761) % 4294967296) * $k) // 4294967296"
  }

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

  /** Leakage-safe standard scaler — NVTabular's `Normalize` with the
    * fit/transform split made explicit (reference anchor
    * `[NVTabular/nvtabular/ops/normalize.py :: class Normalize]`):
    * mean/std are FIT on the hash-derived train folds only (fold 0 is
    * the held-out serve slice, folds 1..k-1 train — same Knuth
    * multiplicative fold hash as [[targetEncode]], no RNG) and applied
    * to every row, so the serve slice is scored with statistics it
    * never contributed to — the posture a real feature store needs
    * (serve-time rows arrive AFTER the stats were frozen).
    *
    * Arithmetic is engine-exact end-to-end:
    *   - values quantize to cents (long);
    *   - train sums go through DECIMAL(38,0) (at 100 TB the plain
    *     int64 sum of squares overflows around 1e12 rows);
    *   - mean = floor(s1 / n) in cents via the positive-mod spelling
    *     (s1 − pmod(s1, n)) / n — `div`-truncation vs floor diverges
    *     on negative sums, pmod does not (the q190b construction);
    *   - variance is computed AROUND THE FLOORED MEAN:
    *     var* = (Σx² − 2·m·Σx + n·m²) div n — all operands exact in
    *     decimal, numerator a non-negative sum of squares so
    *     truncation == floor; within 1 cent² of the true population
    *     variance (documented bias of the integer contract);
    *   - std = isqrt(var*): floor of the IEEE sqrt with a one-step
    *     correction in BOTH directions (std² > var* → std −= 1;
    *     (std+1)² ≤ var* → std += 1) — above ~2^52 the double path can
    *     err either way (sqrt(k²−1) rounds up to k; the BIGINT→DOUBLE
    *     cast of var* can round below k² so the raw floor lands at
    *     k−1), and ±1 covers the whole error range, so the integer
    *     sqrt is exact for every BIGINT var* (both engines run the
    *     identical corrections);
    *   - z_bp = floor(dev·10⁴ / std) via the same positive-mod
    *     spelling (dev is signed). Constant train column (std = 0)
    *     emits NULL z — a scaler with no scale has no answer.
    *
    * 100 TB posture: one bounded aggregation over the train folds
    * (3 numbers) broadcast back over the corpus — the corpus is
    * scanned once and never shuffles.
    *
    * @return id, fold, dev_c (signed cents from train mean), z_bp
    */
  def standardScale(df: DataFrame, id: String, value: String,
      k: Int = 4): DataFrame = {
    require(k >= 2, s"need at least 2 folds, got $k")
    val base = df.select(
      col(id),
      round(col(value) * 100).cast("long").as("__cents"),
      foldCol(id, k).as("fold"))
    val fit = base.filter(col("fold") =!= 0)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__cents").cast("decimal(38,0)")).as("s1"),
        sum(col("__cents").cast("decimal(19,0)")
          * col("__cents").cast("decimal(19,0)")).as("s2"))
      .select(col("n"), col("s1"), col("s2"),
        expr("CAST((s1 - pmod(s1, n)) div n AS BIGINT)").as("m"))
      .select(col("m"),
        expr("""CAST((s2 - 2 * CAST(m AS DECIMAL(19,0)) * s1
              |     + CAST(n AS DECIMAL(19,0)) * CAST(m AS DECIMAL(19,0)) * m)
              |  div n AS BIGINT)""".stripMargin).as("__vr"))
      .select(col("m"), col("__vr"),
        floor(sqrt(col("__vr").cast("double"))).cast("long").as("__s0"))
      // exact integer sqrt: sqrt(k²−1) can round up to k above ~2^52,
      // so correct one step down. The symmetric UPWARD step (r15
      // ADVICE item 2) is a platform guard: under correctly-rounded
      // IEEE sqrt the downward miss is impossible for exact squares
      // (cast error ≤ half-ulp(k²) = k²·2⁻⁵³ pulls sqrt down by at
      // most k·2⁻⁵⁴ < half-ulp(k), so RN(sqrt(RN(k²))) = k), but a
      // non-correctly-rounded libm breaks that argument and ±1 covers
      // the whole ≤1-ulp error range either way. Decimal squares —
      // s0² brushes the int64 edge when var* does
      .select(col("m"),
        expr("""CASE
              |  WHEN CAST(__s0 AS DECIMAL(38,0)) * __s0 > __vr
              |    THEN __s0 - 1
              |  WHEN CAST(__s0 + 1 AS DECIMAL(38,0)) * (__s0 + 1) <= __vr
              |    THEN __s0 + 1
              |  ELSE __s0 END""".stripMargin).as("std_c"))
    base.crossJoin(broadcast(fit))
      .withColumn("dev_c", col("__cents") - col("m"))
      .withColumn("z_bp",
        expr("""CASE WHEN std_c = 0 THEN NULL ELSE
                |  (dev_c * 10000 - pmod(dev_c * 10000, std_c)) div std_c
                |END""".stripMargin))
      .select(col(id), col("fold"), col("dev_c"), col("z_bp"))
  }

  /** Leakage-safe ROBUST scaler — sklearn's `RobustScaler` with the
    * same fit/transform split as [[standardScale]] (reference anchor
    * `[scikit-learn/sklearn/preprocessing/_data.py :: class
    * RobustScaler]`): center = train median, scale = train IQR, both
    * EXACT type-1 order statistics (values at global sort ranks
    * floor(q·(n−1)/4) — real data values, no interpolation), so a
    * heavy-tailed or spike-polluted column gets a scale outliers
    * cannot move (the q259 trimmed-mean rationale, applied to
    * scaling). Ranks are computed by [[Validate.quantileLadder]]'s
    * distributed prefix-scan — range partition + per-partition
    * row_number + broadcast offsets, never a single-partition global
    * window. z_bp = floor(dev·10⁴ / iqr) via the positive-mod
    * spelling; zero IQR (≥50% of train mass on one value) emits NULL.
    *
    * @return id, fold, dev_c (signed cents from train median), z_bp
    */
  def robustScale(df: DataFrame, id: String, value: String,
      k: Int = 4): DataFrame = {
    require(k >= 2, s"need at least 2 folds, got $k")
    val base = df.select(
      col(id),
      round(col(value) * 100).cast("long").as("__cents"),
      foldCol(id, k).as("fold"))
    val ladder = Validate.quantileLadder(
      base.filter(col("fold") =!= 0), "__cents", 4)
    val med = ladder(2).toLong
    val iqr = ladder(3).toLong - ladder(1).toLong
    base
      .withColumn("dev_c", col("__cents") - lit(med))
      .withColumn("z_bp",
        if (iqr == 0) lit(null).cast("long")
        else expr(s"(dev_c * 10000 - pmod(dev_c * 10000, ${iqr}L))" +
          s" div ${iqr}L"))
      .select(col(id), col("fold"), col("dev_c"), col("z_bp"))
  }

  /** Leakage-safe empirical-CDF transform — sklearn's
    * `QuantileTransformer` at FULL resolution (reference anchor
    * `[scikit-learn/sklearn/preprocessing/_data.py :: class
    * QuantileTransformer]`; [[Validate.quantileMap]] / q216 is the
    * discrete nQ-bucket histogram-matching tier of the same idea):
    * every row's value becomes its rank in the TRAIN distribution,
    * cdf_bp = floor(10⁴ · |{train ≤ x}| / n_train) — the rank-uniform
    * feature a gradient-boosted or neural tabular model wants when
    * the raw scale is meaningless. Fit/transform split as in
    * [[standardScale]]: ranks come from the train folds only.
    *
    * 100 TB posture: |{train ≤ x}| for every row via
    * [[FrameOps.searchSortedLarge]]'s distributed prefix-scan (probe
    * x+1 converts its strictly-less count to ≤ on integer cents) —
    * ONE range-partitioned union scan, no broadcast of the train
    * distribution (which is as big as the train split; the q216
    * ladder broadcast is the bounded-resolution alternative), no
    * correlated subquery, no global window.
    *
    * @return id, fold, cdf_bp (0 for values below all of train)
    */
  def cdfTransform(df: DataFrame, id: String, value: String,
      k: Int = 4): DataFrame = {
    require(k >= 2, s"need at least 2 folds, got $k")
    val base = df.select(
      col(id),
      round(col(value) * 100).cast("long").as("__cents"),
      foldCol(id, k).as("fold"))
    val train = base.filter(col("fold") =!= 0)
    val nTrain = train.agg(count(lit(1)).as("__nt"))
    val counted = FrameOps.searchSortedLarge(
      train.select(col("__cents").as("__tv")), "__tv",
      base.withColumn("__probe", col("__cents") + 1), "__probe",
      id, "n_le")
    counted
      .withColumn("fold", foldCol(id, k))
      .crossJoin(broadcast(nTrain))
      .select(col(id), col("fold"),
        expr("(n_le * 10000) div __nt").as("cdf_bp"))
  }

  /** Per-group [[cdfTransform]] — percentile rank against the row's
    * OWN segment's train distribution (a global CDF is meaningless
    * when segments live on different scales — the q289 rationale
    * applied to ranking). Same leakage-safe fit/transform split;
    * |{train in grp ≤ x}| for every row via a GROUP-AWARE prefix scan:
    * range-partition the elem/probe union on (grp, value), per-
    * partition cumulative counts per group, plus exclusive per-(grp,
    * partition) offsets from a bounded parts·groups frame — the
    * [[FrameOps.searchSortedLarge]] discipline with the group woven
    * into the partitioning key, so a group spanning partitions still
    * ranks exactly and NO group ever funnels through one task.
    *
    * @return grp, id, fold, cdf_bp (0 for values below all of the
    *         group's train; groups with an empty train slice are
    *         dropped — there is no distribution to rank against)
    */
  def cdfTransformBy(df: DataFrame, group: String, id: String,
      value: String, k: Int = 4): DataFrame = {
    require(k >= 2, s"need at least 2 folds, got $k")
    val base = df.select(col(group).as("grp"), col(id),
        round(col(value) * 100).cast("long").as("__c"),
        foldCol(id, k).as("fold"))
      .filter(col("grp").isNotNull && col("__c").isNotNull)
    val idType = base.schema(id).dataType
    val e = base.filter(col("fold") =!= 0)
      .select(col("grp"), (col("__c") * 2).as("__v"), lit(1).as("__is_elem"),
        lit(null).cast(idType).as(id), lit(0L).as("fold"))
    // probe key 2c+1 sits strictly after every elem key 2c of the same
    // cent value — the x+1 trick without colliding with elem keys
    val p = base.select(col("grp"), (col("__c") * 2 + 1).as("__v"),
      lit(0).as("__is_elem"), col(id), col("fold"))
    // localCheckpoint pins __pid across the local-scan and offsets
    // branches (the searchSortedLarge two-branch hazard — see the
    // comment there; this op's own r14c receipt caught it live)
    val parted = e.unionByName(p)
      .repartitionByRange(col("grp"), col("__v"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val localScan = Window.partitionBy(col("__pid"), col("grp"))
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val offsets = parted.groupBy(col("__pid"), col("grp"))
      .agg(sum(col("__is_elem")).as("__cnt"))
      .withColumn("__offset", coalesce(sum(col("__cnt")).over(
        Window.partitionBy(col("grp")).orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("grp"), col("__offset"))
    val nTrain = e.groupBy(col("grp")).agg(count(lit(1)).as("__nt"))
    parted
      .withColumn("__local", sum(col("__is_elem")).over(localScan))
      .join(broadcast(offsets), Seq("__pid", "grp"))
      .filter(col("__is_elem") === 0)
      .join(broadcast(nTrain), "grp")
      .select(col("grp"), col(id), col("fold"),
        expr("((__local + __offset) * 10000) div __nt").as("cdf_bp"))
  }

  /** Hash bucketing for high-cardinality categoricals — NVTabular's
    * `HashBucket` (reference anchor `[NVTabular/nvtabular/ops/
    * hash_bucket.py :: class HashBucket]`), the embedding-table trick
    * for columns whose cardinality rivals the row count (where
    * [[categorify]]'s vocabulary is the wrong op). Bucket = the KMV
    * scrambled poly hash mod nBuckets — the one hash spelling the
    * whole repo replays in DuckDB ([[graft.ops.Sketches.polyHashSql]]
    * / kmvScrambleSql), RNG-free, engine- and partitioning-invariant.
    * NULL categories stay NULL (the embedding layer's own null path).
    * Zero shuffles — a pure map-stage projection.
    *
    * @return the input plus `<col>_bucket` (long in [0, nBuckets))
    */
  def hashBucketize(df: DataFrame, c: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val p = graft.expressions.HashSpec.P
    val scrambled = (graft.expressions.TextHashes.poly_hash(col(c))
      * lit(graft.ops.Sketches.kmvMixA)
      + lit(graft.ops.Sketches.kmvMixB)) % lit(p)
    df.withColumn(s"${c}_bucket", pmod(scrambled, lit(nBuckets.toLong)))
  }

  /** The health check [[hashBucketize]] ships with: per-bucket load
    * and collision census. A bucket whose `n_cats` > 1 aliases
    * categories into one embedding row (the accepted trade); a bucket
    * whose `max_cat_rows`/`n_rows` is lopsided says one hot category
    * dominates its bucket and the aliasing is nearly free. Two bounded
    * aggregations: (bucket, category) partials — capped by the
    * column's observed cardinality — then an nBuckets-row rollup.
    *
    * @return bucket, n_rows, n_cats, max_cat_rows (sorted by bucket)
    */
  def hashBucketCensus(df: DataFrame, c: String, nBuckets: Int): DataFrame =
    hashBucketize(df, c, nBuckets)
      .filter(col(c).isNotNull)
      .groupBy(col(s"${c}_bucket").as("bucket"), col(c))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("bucket"))
      .agg(sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_cats"),
        max(col("__n")).as("max_cat_rows"))

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
    val base = df.withColumn("fold", foldCol(id, k))
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
