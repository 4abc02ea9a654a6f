package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.TextHashes._

/** Per-document WordPiece result for [[TextAnalysis.wordpieceTokenize]].
  * Top-level (NOT nested in the object): Spark's expression codegen
  * cannot compile a serializer for a case class nested inside an
  * object — it resolves members as zero-arg methods on the outer
  * instance and fails with "No applicable constructor", silently
  * falling back to interpreted serialization on every row.
  */
case class WpDoc(n_words: Int, n_tokens: Int, n_unk: Int,
    token_ids: String)

/** Text analysis for training-data pipelines (M6d): tokenization,
  * quality scoring, language-ID heuristic, fingerprinting.
  * Reference kernels: nvtext tokenize/token_count/ngrams
  * [cpp/src/text/], exposed via [python/cudf/cudf/core/column/
  * string.py (nvtext section)].
  *
  * All columns are built-in-function expressions (whole-stage codegen;
  * no UDFs) except the fingerprint, which is the codegen'd PolyHash
  * expression — a pipeline over these scans 100 TB in one pass with
  * nothing but a parquet scan + project in the plan.
  */
object TextAnalysis {

  def norm(c: Column): Column = Dedup.normText(c)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(split(norm(c), " "))

  /** BPE-ish regex token count: letter runs, digit runs, single other. */
  def regexTokenCount(c: Column): Column =
    size(regexp_extract_all(norm(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Distinct-token / token ratio (lexical diversity). */
  def typeTokenRatio(c: Column): Column = {
    val toks = split(norm(c), " ")
    round(size(array_distinct(toks)).cast("double") / size(toks), 4)
  }

  /** Mean token length. */
  def avgTokenLen(c: Column): Column = {
    val toks = split(norm(c), " ")
    round(aggregate(transform(toks, t => length(t).cast("double")),
      lit(0.0), (a, x) => a + x) / size(toks), 4)
  }

  /** Marker tokens per language for the language-ID heuristic. The
    * fixture corpus shares one vocabulary across langs, so this is a
    * semantics demonstration (deterministic scoring + argmax), not a
    * fitted model; swap the marker lists for real stopword tables in
    * production.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "query", "sort"),
    "de" -> Seq("agg", "hash", "vector"),
    "fr" -> Seq("window", "line", "big"),
    "zh" -> Seq("merge", "join", "batch"))

  /** Per-language marker hit count (number of tokens in the marker set). */
  def langScore(c: Column, markers: Seq[String]): Column = {
    val toks = split(norm(c), " ")
    size(filter(toks, t => t.isin(markers.map(lit(_)): _*)))
  }

  /** argmax over language scores, ties broken by list order. One pass
    * over the token array in a UDF: the expression formulations (a
    * when-fold, or a scores array + array_position) re-evaluate the
    * interpreted filter() HOF 10–30× per row — measured 5–6 s at sf0.1
    * vs <1 s here. Same scoring as `langScore`, so the DuckDB oracle is
    * unchanged.
    */
  private val langIdUdf = {
    val markers = langMarkers.map { case (lang, m) => (lang, m.toSet) }
    udf { (toks: Seq[String]) =>
      if (toks == null) markers.head._1
      else {
        val counts = markers.map { case (lang, set) => (lang, toks.count(set)) }
        counts.maxBy(_._2)._1 // stable: first max in marker-list order
      }
    }
  }

  def langIdCol(c: Column): Column = langIdUdf(split(norm(c), " "))

  /** Quality facets: length, token stats, stopword ratio, digit ratio. */
  def qualityColumns(df: DataFrame, text: String): DataFrame = {
    val c = col(text)
    val toks = split(norm(c), " ")
    df.withColumn("n_chars_m", length(norm(c)))
      .withColumn("n_tokens", tokenCount(c))
      .withColumn("ttr", typeTokenRatio(c))
      .withColumn("avg_tok_len", avgTokenLen(c))
      .withColumn("stop_ratio",
        round(size(filter(toks, t => t.isin("the", "a", "of", "and", "to")))
          .cast("double") / size(toks), 4))
      .withColumn("digit_ratio",
        round((length(norm(c)) - length(regexp_replace(norm(c), "[0-9]", "")))
          .cast("double") / length(norm(c)), 4))
  }

  /** Gopher/MassiveText quality-filter ruleset (Rae et al. 2021 §A1.1,
    * public): per-rule boolean verdicts plus the combined pass flag.
    * Every rule is a pure expression over integer token/char counts —
    * each emitted comparison divides two exact integers at most once,
    * so the booleans are bit-stable across engines (no rounded-double
    * thresholds). Line-based rules (bullet/ellipsis) operate on
    * newline-split lines and pass vacuously on single-line docs.
    *
    * Scan-only: no shuffle, no UDF — at 100 TB this is a projection
    * fused into the parquet scan, the cheapest possible filter pass.
    */
  /** One pass over the token array for the four token-level Gopher
    * stats; the interpreted-HOF formulation (aggregate/filter ×4, each
    * re-splitting) is the repo's measured 10× trap. Alpha check matches
    * rlike("[a-z]") on normalized (lowercased) tokens; stop_hits counts
    * DISTINCT stopwords present.
    */
  private val gopherStatsUdf = {
    val stops = Set("the", "be", "to", "of", "and", "that", "have", "with")
    udf { (toks: Seq[String]) =>
      var totLen = 0L; var nAlpha = 0
      val seen = scala.collection.mutable.Set.empty[String]
      toks.foreach { t =>
        totLen += t.length
        var i = 0; var hasAlpha = false
        while (i < t.length && !hasAlpha) {
          val ch = t.charAt(i)
          if (ch >= 'a' && ch <= 'z') hasAlpha = true
          i += 1
        }
        if (hasAlpha) nAlpha += 1
        if (stops(t)) seen += t
      }
      (toks.length, totLen, nAlpha, seen.size)
    }
  }

  def gopherRules(df: DataFrame, id: String, text: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minAvgLen: Double = 3.0, maxAvgLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
      minStopwords: Int = 2): DataFrame = {
    val c = col(text)
    // '#' and '...' occurrences (Gopher's symbol set), counted on the
    // RAW text — normalization strips nothing relevant but rule fidelity
    // says count before reshaping
    val nHash = (length(c) - length(regexp_replace(c, "#", ""))).cast("long")
    val nEllipsis = ((length(c) - length(regexp_replace(c, "\\.\\.\\.", ""))) / 3).cast("long")
    val lines = split(c, "\n")
    val nLines = size(lines)
    val nBullet = size(filter(lines, l => trim(l).startsWith("-") || trim(l).startsWith("*")))
    val nEllLine = size(filter(lines, l => l.endsWith("...")))
    val g = df.withColumn("__g", gopherStatsUdf(split(norm(c), " ")))
    val nWords = col("__g._1")
    val totalLen = col("__g._2")
    val nAlphaWords = col("__g._3")
    val stopHits = col("__g._4")
    g.select(col(id),
      nWords.as("n_words"),
      (nWords >= minWords && nWords <= maxWords).as("ok_words"),
      (totalLen.cast("double") / nWords >= minAvgLen &&
        totalLen.cast("double") / nWords <= maxAvgLen).as("ok_avg_len"),
      ((nHash + nEllipsis).cast("double") / nWords <= maxSymbolRatio).as("ok_symbol"),
      (nAlphaWords.cast("double") / nWords >= minAlphaRatio).as("ok_alpha"),
      (stopHits >= minStopwords).as("ok_stop"),
      (nBullet.cast("double") / nLines <= 0.9).as("ok_bullet"),
      (nEllLine.cast("double") / nLines <= 0.3).as("ok_ellipsis"))
      .withColumn("gopher_pass",
        col("ok_words") && col("ok_avg_len") && col("ok_symbol") &&
          col("ok_alpha") && col("ok_stop") && col("ok_bullet") && col("ok_ellipsis"))
  }

  /** Gopher/MassiveText REPETITION rules (Rae et al. 2021 §A1.1, the
    * half of the published filter table [[gopherRules]] does not
    * cover): repetitive documents — boilerplate, templated spam, SEO
    * keyword stuffing — are the dominant failure mode the
    * MassiveText pipeline removes by measuring self-repetition at
    * three granularities:
    *
    *   - duplicate LINES: share of lines (and of line characters)
    *     belonging to a line that occurs more than once in the doc;
    *   - TOP word n-gram (n = 2, 3, 4): share of word characters
    *     covered by the single most frequent n-gram
    *     (occurrences × n-gram chars ÷ total word chars); ties break
    *     (count DESC, gram ASC) so the winner is unique;
    *   - DUPLICATED word n-grams (n = 5…10): share of word characters
    *     covered by all n-grams occurring at least twice
    *     (Σ count·chars ÷ total chars — the standard overlap-counting
    *     reimplementation of the paper's definition, deterministic;
    *     heavily stuffed docs can exceed 10000 bp because overlapping
    *     occurrences each count — the share stays monotone in
    *     repetition, which is all the threshold uses).
    *
    * All shares are floor BASIS POINTS of exact integer counts — no
    * doubles anywhere — and the pass thresholds are the paper's
    * published table (0.30/0.20 lines, 0.20/0.18/0.16 top-grams,
    * 0.15…0.10 dup-grams). rep_pass = every rule passes.
    *
    * 100 TB posture: ONE explode of (doc, n, gram) rows — fan-out is
    * Σ_{n=2..10}(words−n+1) ≈ 9× the token count, bounded per doc —
    * into a (doc, n, gram)-keyed partial-aggregated count; the
    * per-(doc, n) argmax rides a window PARTITIONED by doc (never
    * global); lines are a second bounded explode. Nothing collects.
    * Receipt: 1M docs ≈ 108M gram rows in 51 s on one 16-core box
    * (stress_r15b) — census-bound and embarrassingly horizontal.
    * The 100 TB tier is [[gopherRepetitionHashed]]: group on the
    * shared polynomial HASH of the gram instead of the string
    * (tie-break moves to (cnt, hash); a collision merges the same
    * pair of grams in any engine using the same hash, so the
    * hash-replaying oracle still gates bit-for-bit; 2.4× wall at 1M
    * docs — see its scaladoc for where the cost actually sits).
    *
    * @return (id, n_words, dup_line_bp, dup_line_char_bp, top2_bp,
    *         top3_bp, top4_bp, dup5_bp…dup10_bp, rep_pass)
    */
  def gopherRepetition(df: DataFrame, id: String, text: String): DataFrame =
    gopherRepetitionImpl(df, id, text, hashed = false)

  /** The hash-keyed census tier of [[gopherRepetition]] (r15 verdict
    * item 2 — the gram census is the operator's whole cost at scale).
    * The (doc, n, gram-STRING) group key becomes (doc, n,
    * polyHash(gram)) with the hash and the gram's char count projected
    * before the aggregation. Where the cost actually sits (measured,
    * scripts/stress_r16.scala — two findings that CORRECT the r15
    * prose): (1) the census is CO-PARTITIONED by doc — the window sort
    * already hash-partitioned on doc_id, which satisfies the census's
    * ClusteredDistribution, so gram strings never enter an exchange in
    * EITHER tier (receipt asserts no Exchange carries a gram key; the
    * win is NOT shuffle bytes). (2) The swap shrinks the census
    * HashAggregate: fixed 8-byte keys hash/compare in constant time
    * and the agg map (and any spill) drops the 20–100-byte gram
    * strings — 0.59–0.63× wall vs the string tier at 1M docs/~63M
    * gram rows (hashed 12–14 s vs string 20–22 s, min-of-2
    * interleaved, STABLE across three receipt runs and both fast-map
    * configs). Secondary finding on the codegen TWO-LEVEL FAST MAP
    * (2^16 entries): at census cardinality (millions of groups per
    * partition) twolevel=ON never beat OFF in any receipt run and
    * degraded up to 2× inside the two heat-affected runs — prefer
    * spark.sql.codegen.aggregate.map.twolevel.enabled=false for jobs
    * dominated by multi-million-group partial aggs. The
    * duplicate-line census gets the same hash
    * treatment ((doc, polyHash(line)) + max(len)). The
    * top-gram tie-break moves from (cnt DESC, gram ASC) to (cnt DESC,
    * hash ASC); a hash collision merges the same pair of grams in any
    * engine computing the same hash, so the DuckDB oracle (which
    * replays polyHash in SQL) still gates bit-for-bit.
    *
    * Equivalence to [[gopherRepetition]]: all dup-share and line-share
    * columns are value-identical absent collisions (they sum over the
    * census, order-free). The top*_bp columns are identical whenever
    * the per-(doc, n) most-frequent gram is UNIQUE by count; under a
    * count tie the two tie-breaks may crown different winners whose
    * char lengths differ (Rae et al. define only "the most frequent
    * n-gram" — any tie winner is faithful). TextAnalysisSpec pins both
    * facts on the fixtures.
    */
  def gopherRepetitionHashed(df: DataFrame, id: String,
      text: String): DataFrame =
    gopherRepetitionImpl(df, id, text, hashed = true)

  private def gopherRepetitionImpl(df: DataFrame, id: String, text: String,
      hashed: Boolean): DataFrame = {
    val base = graft.Tables.spread(df.select(col(id), col(text)), id)
      .select(col(id),
        expr(s"filter(split(${normSql(text)}, ' '), w -> length(w) > 0)")
          .as("ws"),
        split(col(text), "\n").as("lines"))
      .withColumn("total_chars",
        expr("aggregate(ws, 0L, (a, w) -> a + length(w))"))
      .withColumn("n_words", size(col("ws")))
    // ---- word n-grams: ONE posexplode + ONE doc-partitioned window
    // of lead()s + stack — no HOF-built array ever feeds explode (the
    // PLANS.md lambda-re-evaluation trap) and no word array rides the
    // Generate output
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("pos"))
    val leads = (1 to 9).map(k => lead(col("w"), k).over(wd).as(s"w$k"))
    val gramCandidates = base
      .select(col(id), col("total_chars"),
        posexplode(col("ws")).as(Seq("pos", "w")))
      .select(Seq(col(id), col("total_chars"), col("w")) ++ leads: _*)
      .select(col(id), col("total_chars"), expr(
        "stack(9, " + (2 to 10).map { n =>
          val parts = ("w" +: (1 until n).map(k => s"w$k")).mkString(", ")
          s"$n, CASE WHEN w${n - 1} IS NOT NULL" +
            s" THEN concat_ws(' ', $parts) END"
        }.mkString(", ") + ") AS (n, g)"))
    val grams = gramCandidates.filter(col("g").isNotNull)
    // string tier: the gram IS the shuffle key (gchars derived after the
    // agg — the string rides the exchange anyway). hashed tier: hash +
    // char count projected map-side, string dropped before the exchange.
    // gram word chars = length - (n-1): grams are single-space
    // concat_ws joins of space-free words, so the n-1 separators are
    // the only spaces — same value as stripping them, no regex on the
    // ~9x-token-count census rows
    val (gcnt, topTieBreak) = if (!hashed) {
      (grams.groupBy(col(id), col("total_chars"), col("n"), col("g"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("gchars", length(col("g")) - (col("n") - 1)),
        col("g").asc)
    } else {
      (grams
        .select(col(id), col("total_chars"), col("n"),
          poly_hash(col("g")).as("gh"),
          (length(col("g")) - (col("n") - 1)).as("gc0"))
        .groupBy(col(id), col("total_chars"), col("n"), col("gh"))
        .agg(count(lit(1)).as("cnt"), max(col("gc0")).as("gchars")),
        col("gh").asc)
    }
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id), col("n"))
      .orderBy(col("cnt").desc, topTieBreak)
    val perN = gcnt
      .withColumn("rk", row_number().over(wTop))
      .groupBy(col(id), col("n"))
      .agg(
        max(when(col("rk") === 1,
          expr("(cnt * gchars * 10000) div greatest(total_chars, 1)")))
          .as("top_bp"),
        coalesce(sum(when(col("cnt") >= 2, col("cnt") * col("gchars"))),
          lit(0L)).as("dup_chars"),
        max(col("total_chars")).as("tc"))
      .withColumn("dup_bp",
        expr("(dup_chars * 10000) div greatest(tc, 1)"))
    val gramCols = perN.groupBy(col(id)).agg(
      max(when(col("n") === 2, col("top_bp"))).as("top2_bp"),
      max(when(col("n") === 3, col("top_bp"))).as("top3_bp"),
      max(when(col("n") === 4, col("top_bp"))).as("top4_bp"),
      max(when(col("n") === 5, col("dup_bp"))).as("dup5_bp"),
      max(when(col("n") === 6, col("dup_bp"))).as("dup6_bp"),
      max(when(col("n") === 7, col("dup_bp"))).as("dup7_bp"),
      max(when(col("n") === 8, col("dup_bp"))).as("dup8_bp"),
      max(when(col("n") === 9, col("dup_bp"))).as("dup9_bp"),
      max(when(col("n") === 10, col("dup_bp"))).as("dup10_bp"))
    // ---- duplicate lines --------------------------------------------
    val lrows = base
      .select(col(id), explode(col("lines")).as("l"))
      .filter(length(col("l")) > 0)
    val lcnt = if (!hashed) {
      lrows.groupBy(col(id), col("l")).agg(count(lit(1)).as("cnt"))
        .withColumn("lchars", length(col("l")))
    } else {
      lrows.select(col(id), poly_hash(col("l")).as("lh"),
          length(col("l")).as("lc0"))
        .groupBy(col(id), col("lh"))
        .agg(count(lit(1)).as("cnt"), max(col("lc0")).as("lchars"))
    }
    val lineCols = lcnt.groupBy(col(id)).agg(
      sum(col("cnt")).as("n_lines"),
      sum(col("cnt") * col("lchars")).as("line_chars"),
      coalesce(sum(when(col("cnt") >= 2, col("cnt"))), lit(0L))
        .as("dup_lines"),
      coalesce(sum(when(col("cnt") >= 2, col("cnt") * col("lchars"))),
        lit(0L)).as("dup_line_chars"))
      .select(col(id),
        expr("(dup_lines * 10000) div greatest(n_lines, 1)")
          .as("dup_line_bp"),
        expr("(dup_line_chars * 10000) div greatest(line_chars, 1)")
          .as("dup_line_char_bp"))
    base.select(col(id), col("n_words"))
      .join(lineCols, Seq(id), "left")
      .join(gramCols, Seq(id), "left")
      .na.fill(0L, Seq("dup_line_bp", "dup_line_char_bp") ++
        Seq(2, 3, 4).map(n => s"top${n}_bp") ++
        (5 to 10).map(n => s"dup${n}_bp"))
      .withColumn("rep_pass",
        col("dup_line_bp") <= 3000 && col("dup_line_char_bp") <= 2000 &&
          col("top2_bp") <= 2000 && col("top3_bp") <= 1800 &&
          col("top4_bp") <= 1600 && col("dup5_bp") <= 1500 &&
          col("dup6_bp") <= 1400 && col("dup7_bp") <= 1300 &&
          col("dup8_bp") <= 1200 && col("dup9_bp") <= 1100 &&
          col("dup10_bp") <= 1000)
  }

  /** [[Dedup.normText]] as a SQL fragment over a named column — the
    * one-spelling-both-engines normalizer used by
    * [[gopherRepetition]]'s expression pipeline.
    */
  private def normSql(c: String): String =
    s"lower(trim(regexp_replace($c, '\\\\s+', ' ')))"

  /** Distinct-n diversity ratios (dist-1/2/3, Li et al. 2016 — the
    * standard LEXICAL DIVERSITY report for generated or crawled text;
    * low dist-n = repetitive/templated output, the generation-side
    * mirror of [[gopherRepetition]]'s filter-side shares). Per doc and
    * n ∈ {1, 2, 3}: distinct word n-grams ÷ total n-grams in floor
    * basis points — exact integer counts, no doubles.
    *
    * Same single-pass kernel as [[gopherRepetition]]: one posexplode +
    * one doc-partitioned window of lead()s + stack — no HOF-built
    * array ever feeds explode.
    *
    * @return (id, n_words, dist1_bp, dist2_bp, dist3_bp — NULL when a
    *         doc has no n-gram of that order)
    */
  def distinctNgramRatios(df: DataFrame, id: String,
      text: String): DataFrame = {
    val base = graft.Tables.spread(df.select(col(id), col(text)), id)
      .select(col(id),
        expr(s"filter(split(${normSql(text)}, ' '), w -> length(w) > 0)")
          .as("ws"))
      .withColumn("n_words", size(col("ws")))
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("pos"))
    val grams = base
      .select(col(id), posexplode(col("ws")).as(Seq("pos", "w")))
      .select(col(id), col("w"),
        lead(col("w"), 1).over(wd).as("w1"),
        lead(col("w"), 2).over(wd).as("w2"))
      .select(col(id), expr(
        """stack(3,
          |  1, w,
          |  2, CASE WHEN w1 IS NOT NULL THEN concat_ws(' ', w, w1) END,
          |  3, CASE WHEN w2 IS NOT NULL THEN concat_ws(' ', w, w1, w2)
          |     END) AS (n, g)""".stripMargin))
      .filter(col("g").isNotNull)
    val perN = grams.groupBy(col(id), col("n"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(id), col("n"))
      .agg(sum(col("cnt")).as("total"), count(lit(1)).as("uniq"))
      .withColumn("bp", expr("(uniq * 10000) div total"))
    base.select(col(id), col("n_words"))
      .join(perN.groupBy(col(id)).agg(
        max(when(col("n") === 1, col("bp"))).as("dist1_bp"),
        max(when(col("n") === 2, col("bp"))).as("dist2_bp"),
        max(when(col("n") === 3, col("bp"))).as("dist3_bp")),
        Seq(id), "left")
  }

  /** Document fingerprint: polynomial rolling hash of normalized text
    * (PolyHash expression — SURVEY §2.7 fingerprinting row).
    */
  def fingerprint(c: Column): Column = poly_hash(norm(c))

  /** Distinct token n-grams, first-occurrence order. A Scala UDF: the
    * transform()/element_at() HOF formulation re-evaluates norm+split
    * per lambda element (and worse when fed into explode) — measured
    * ~14 s vs <1 s at sf0.1. Shared with Dedup.ngramJaccardPairs.
    */
  private[ops] val ngramsUdf = udf { (toks: Seq[String], n: Int) =>
    if (toks == null) Seq.empty[String]
    else toks.iterator.sliding(n).withPartial(false).map(_.mkString(" ")).toSeq.distinct
  }

  def tokenNgrams(c: Column, n: Int): Column =
    ngramsUdf(split(norm(c), " "), lit(n))

  /** ALL token n-grams (non-distinct — repetition analysis needs the
    * multiplicities that [[ngramsUdf]] deliberately drops).
    */
  private[ops] val allNgramsUdf = udf { (toks: Seq[String], n: Int) =>
    if (toks == null) Seq.empty[String]
    else toks.iterator.sliding(n).withPartial(false).map(_.mkString(" ")).toSeq
  }

  /** Fixed-width token chunks (last chunk may be partial) — the chunk
    * unit of boilerplate stripping. Same UDF-over-HOF rationale as
    * [[ngramsUdf]]: a transform()-built array fed into posexplode
    * re-evaluates the lambda per OUTPUT row (measured 9.6 s → 1.8 s for
    * q148 at sf0.1).
    */
  private[ops] val tokenChunksUdf = udf { (toks: Seq[String], w: Int) =>
    if (toks == null) Seq.empty[String]
    else toks.grouped(w).map(_.mkString(" ")).toSeq
  }

  /** Gopher-style repetition filters per document (Rae et al. 2021 §A1.1
    * — the "repetitious text" quality signals an LLM-corpus pipeline
    * thresholds on): total n-gram count, fraction taken by the single
    * most frequent n-gram, and the duplicate-gram fraction
    * (1 − distinct/total). Documents with fewer than n tokens emit no
    * row (no grams → nothing to measure), matching the oracle.
    *
    * Plan: one explode + two keyed aggregations — map-side combine keeps
    * the first shuffle at O(distinct grams per doc); nothing is ever
    * collected per-corpus, so the op scales by adding executors.
    */
  def repetitionStats(df: DataFrame, id: String, text: String,
      n: Int = 2): DataFrame = {
    val g = graft.Tables.spread(df.select(col(id), col(text)), id)
      .select(col(id),
        explode(allNgramsUdf(split(norm(col(text)), " "), lit(n))).as("gram"))
    g.groupBy(col(id), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col(id))
      .agg(sum(col("c")).as("total"), max(col("c")).as("top1"),
        count(lit(1)).as("nd"))
      .select(col(id),
        col("total").cast("int").as("n_grams"),
        round(col("top1") / col("total"), 4).as("top_gram_frac"),
        round(lit(1.0) - col("nd") / col("total"), 4).as("dup_gram_frac"))
  }

  /** Distinct character n-grams (nvtext character_ngrams parity). */
  private val charNgramsUdf = udf { (s: String, n: Int) =>
    if (s == null || s.length < n) Seq.empty[String]
    else s.sliding(n).toSeq.distinct
  }

  def charNgrams(c: Column, n: Int): Column = charNgramsUdf(norm(c), lit(n))

  /** Unicode code points of the string (nvtext code_points parity). */
  private val codePointsUdf = udf { (s: String) =>
    if (s == null) Seq.empty[Int]
    else s.codePoints.toArray.toSeq
  }

  def codePoints(c: Column): Column = codePointsUdf(c)

  /** Porter stemmer (nvtext porter_stemmer parity — [cpp/src/text/
    * stemmer.cu]). Classic Porter (1980), steps 1a–5b; golden-value
    * spec in TextAnalysisSpec.
    */
  def porterStem(c: Column): Column = porterUdf(lower(c))

  private val porterUdf = udf { (w: String) =>
    if (w == null) null else Porter.stem(w)
  }

  /** WordPiece vocabulary for [[wordpieceTokenize]] (nvtext
    * subword_tokenize parity — [cpp/src/text/subword_tokenize.cu] runs
    * greedy longest-match-first against a hashed vocab file). Token id =
    * index in this list. No model artifacts ship in this sandbox, so
    * the vocab is an embedded constant chosen to exercise every greedy
    * path on the fixture corpus (full words, multi-piece splits, shared
    * continuations like ##ow, longest-vs-prefix races like fa/fast, and
    * [UNK] fallback); at production scale it is a broadcast Map loaded
    * from the tokenizer's vocab.txt — the operator shape is identical.
    */
  val wordpieceVocab: Seq[String] =
    Seq("[UNK]") ++
      ('a' to 'z').map(_.toString) ++
      ('a' to 'z').map("##" + _) ++
      Seq("the", "data", "join", "sort", "key", "row", "dup", "agg",
        "fast", "big", "part", "fa", "sl", "sp", "ba", "ha",
        "wind", "cust", "str", "fil", "que", "gro", "sca",
        "smal", "tab", "mer", "ord", "val", "lin", "vec", "col",
        "##ow", "##omer", "##eam", "##ter", "##ry", "##up", "##ark",
        "##tch", "##sh", "##er", "##ge", "##le", "##ue", "##umn", "##tor")

  private val wpIndex: Map[String, Int] = wordpieceVocab.zipWithIndex.toMap
  // longest piece length net of the ## marker — bounds the inner scan
  private val wpMaxCore: Int = wordpieceVocab.filterNot(_ == "[UNK]")
    .map(p => if (p.startsWith("##")) p.length - 2 else p.length).max

  /** Greedy longest-match-first WordPiece of one word (HuggingFace
    * semantics): repeatedly take the longest vocab piece matching at the
    * cursor ("##"-prefixed after the first); if no piece matches at any
    * position the ENTIRE word collapses to [UNK] (id 0) — partial
    * prefixes are discarded, not emitted.
    */
  private[graft] def wordpieceWord(w: String): List[Int] = {
    val out = scala.collection.mutable.ListBuffer.empty[Int]
    var pos = 0
    while (pos < w.length) {
      var len = math.min(w.length - pos, wpMaxCore)
      var found = -1
      while (len > 0 && found < 0) {
        val core = w.substring(pos, pos + len)
        val cand = if (pos == 0) core else "##" + core
        // a raw word starting with "##" may not claim a continuation
        // piece at position 0 (mirrors the oracle's NOT LIKE '##%')
        if (pos > 0 || !core.startsWith("##")) {
          wpIndex.get(cand) match {
            case Some(i) if i != 0 => found = i
            case _ =>
          }
        }
        if (found < 0) len -= 1
      }
      if (found < 0) return List(0)
      out += found
      pos += len
    }
    out.toList
  }

  private val wordpieceUdf = udf { (words: Seq[String]) =>
    val ids = if (words == null) Seq.empty[Int]
      else words.flatMap(wordpieceWord)
    WpDoc(if (words == null) 0 else words.length, ids.length,
      ids.count(_ == 0), ids.mkString(" "))
  }

  /** Vocab-driven subword tokenization over a document column: the
    * whole doc tokenizes inside ONE compiled UDF call (words →
    * flatMapped greedy WordPiece), so the plan is a pure map stage —
    * zero shuffles, no explode, no per-token row blowup; token counts
    * for packing/mixture budgets come out of the same pass. Gated q109
    * against a DuckDB recursive-CTE replay of the same greedy matching.
    */
  def wordpieceTokenize(df: DataFrame, id: String, text: String): DataFrame = {
    val words = filter(split(norm(col(text)), " "), x => length(x) > 0)
    df.select(col(id), wordpieceUdf(words).as("wp"))
      .select(col(id), col("wp.n_words").as("n_words"),
        col("wp.n_tokens").as("n_tokens"), col("wp.n_unk").as("n_unk"),
        col("wp.token_ids").as("token_ids"))
  }

  /** nvtext `replace_tokens` parity [python/cudf/cudf/core/column/
    * string.py :: replace_tokens]: whitespace tokens equal to
    * `targets(i)` become `repls(i)`; everything else passes through.
    * A literal-map lookup inside one `transform` — whole-stage
    * codegen, no UDF, scale-free per-row map.
    */
  def replaceTokens(c: Column, targets: Seq[String],
      repls: Seq[String]): Column = {
    require(targets.length == repls.length, "targets/repls must align")
    val m = typedlit(targets.zip(repls).toMap)
    array_join(transform(split(norm(c), " "),
      t => coalesce(element_at(m, t), t)), " ")
  }

  /** nvtext `filter_tokens` parity [python/cudf/cudf/core/column/
    * string.py :: filter_tokens]: whitespace tokens shorter than
    * `minLen` are replaced by `repl`; with `repl = ""` they are
    * removed outright (single-space rejoin — the practical reading of
    * cuDF's delimiter collapse). Pure HOF column, codegen'd.
    */
  def filterTokens(c: Column, minLen: Int, repl: String = ""): Column = {
    val toks = split(norm(c), " ")
    if (repl.isEmpty)
      array_join(filter(toks, t => length(t) >= minLen), " ")
    else
      array_join(transform(toks,
        t => when(length(t) >= minLen, t).otherwise(lit(repl))), " ")
  }

  /** nvtext `character_tokenize` parity [python/cudf/cudf/core/column/
    * string.py :: character_tokenize]: one output row per character
    * with its 1-based position. `split(s, "")` yields single
    * characters identically in Spark and DuckDB (verified).
    */
  def characterTokenize(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id),
        posexplode(split(col(text), "")).as(Seq("pos0", "ch")))
      .select(col(id), (col("pos0") + 1).as("pos"), col("ch"))

  /** nvtext `detokenize` parity [python/cudf/cudf/core/column/
    * string.py :: detokenize]: reassemble a token table (id, pos,
    * token) back into one string per id, ordered by pos. One
    * partial+final aggregation; the sort happens inside `array_sort`
    * on the collected (pos, token) structs, never as a global sort.
    */
  def detokenize(df: DataFrame, id: String, pos: String, token: String,
      sep: String = " "): DataFrame =
    df.groupBy(col(id))
      .agg(array_sort(collect_list(struct(col(pos), col(token)))).as("a"))
      .select(col(id),
        array_join(transform(col("a"), s => s(token)), sep).as("text"))

  /** nvtext `edit_distance_matrix` parity [python/cudf/cudf/core/
    * column/string.py :: edit_distance_matrix]: pairwise Levenshtein
    * over a column of strings. All-pairs BY DEFINITION (the cuDF API
    * returns the full N×N matrix), so this is O(N²) and documented
    * for bounded inputs only — vocabularies, label sets, entity
    * names; the emitted upper triangle (a < b) halves the work.
    * Spark's built-in `levenshtein` matches DuckDB's bit-for-bit.
    *
    * `maxN` fail-fasts the misuse mode (same guard pattern as the
    * jaccard cap / SemDeDup): a distinct count beyond it means someone
    * pointed an O(N²) matrix op at corpus-sized data — the one cheap
    * count aggregate catches it before the quadratic join is built.
    * Raise maxN knowingly for a genuinely large bounded vocabulary.
    */
  def editDistanceMatrix(df: DataFrame, value: String,
      maxN: Long = 10000): DataFrame = {
    val v = df.select(col(value).as("v")).distinct()
    val n = v.count()
    require(n <= maxN,
      s"editDistanceMatrix: $n distinct values exceed maxN=$maxN — this op is " +
        "all-pairs O(N²) BY DEFINITION (the cuDF edit_distance_matrix contract) and " +
        "is meant for bounded inputs (vocabularies, label sets, entity names). " +
        "For corpus-scale near-dup detection use ngramJaccardPairs / " +
        "minhashCandidatePairs; pass a larger maxN to knowingly run the quadratic join.")
    v.as("a").join(v.as("b"), col("a.v") < col("b.v"))
      .select(col("a.v").as("a"), col("b.v").as("b"),
        levenshtein(col("a.v"), col("b.v")).as("dist"))
  }

  /** nvtext `tokenize_with_vocabulary` parity [python/cudf/cudf/core/
    * tokenize_vocabulary.py]: map each whitespace token to its id in
    * `vocab` (a frame of (word, vocab_id)), OOV → `defaultId`. The
    * vocabulary is broadcast (bounded by construction); the corpus
    * never shuffles — explode, broadcast-left-join, re-collect by
    * position.
    */
  def tokenizeWithVocabulary(df: DataFrame, id: String, text: String,
      vocab: DataFrame, defaultId: Int = -1): DataFrame =
    df.select(col(id), posexplode(filter(split(norm(col(text)), " "),
        x => length(x) > 0)).as(Seq("pos", "word")))
      .join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col(id))
      .agg(array_sort(collect_list(struct(col("pos"),
        coalesce(col("vocab_id"), lit(defaultId)).as("tid")))).as("a"))
      .select(col(id), size(col("a")).as("n_tokens"),
        array_join(transform(col("a"), s => s("tid").cast("string")), " ")
          .as("token_ids"))

  /** URL decomposition for corpus filtering (domain blocklists, path
    * heuristics — the CommonCrawl-prep pass). Pure `regexp_extract`
    * chains, RE2-safe and lookaround-free so the same patterns run
    * verbatim in the DuckDB oracle; whole-stage codegen, no UDF.
    * Emits scheme/host/port/path/query/tld/registrable-ish domain
    * (last two labels — a public-suffix list plugs in here at
    * production) and path depth.
    */
  /** Unigram-LM (SentencePiece-style) OPTIMAL segmentation — the
    * Viterbi-DP counterpart of [[tokenizeWithVocabulary]]'s greedy
    * longest-match-first. Each whitespace word is segmented into
    * vocabulary pieces minimizing (total_cost, n_pieces)
    * LEXICOGRAPHICALLY; with integer piece costs the DP is bit-exact
    * in any engine (production supplies cost ≈ round(-1000·log p)).
    * Unknown single characters cost `unkCost`. Pure map stage: the
    * vocabulary (piece, cost) is collected (vocab-sized by contract)
    * and broadcast; one DP per word, O(len · maxPieceLen).
    * Returns (id, n_words, total_cost, total_pieces).
    */
  /** The per-word DP, exposed for PropertySpec's brute-force compare:
    * min (cost, pieces) lexicographically over all segmentations of `w`
    * into vocab pieces (unknown single chars cost `unkCost`).
    */
  private[graft] def viterbiWord(w: String, vm: Map[String, Long],
      ml: Int, unkCost: Long): (Long, Long) = {
    val n = w.length
    val dpC = Array.fill(n + 1)(Long.MaxValue)
    val dpP = Array.fill(n + 1)(Long.MaxValue)
    dpC(0) = 0L; dpP(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - ml)
      while (j < i) {
        if (dpC(j) != Long.MaxValue) {
          val c = vm.getOrElse(w.substring(j, i),
            if (i - j == 1) unkCost else -1L)
          if (c >= 0L) {
            val nc = dpC(j) + c; val np = dpP(j) + 1
            if (nc < dpC(i) || (nc == dpC(i) && np < dpP(i))) {
              dpC(i) = nc; dpP(i) = np
            }
          }
        }
        j += 1
      }
      i += 1
    }
    (dpC(n), dpP(n))
  }

  /** Best segmentation COST of `w` with one piece BANNED from the
    * vocabulary — the loss-if-removed probe of
    * [[Bpe.unigramTrainEm]]'s likelihood-drop prune (r15 verdict item
    * 5): loss(p) = Σ_w freq(w) · (cost_without_p(w) − cost(w)). Cost
    * only (the alternative path itself is irrelevant to the Δ); the
    * all-chars fallback always exists because chars never prune, so
    * the result is finite for every non-char ban.
    */
  private[graft] def viterbiWordCostBanned(w: String, vm: Map[String, Long],
      ml: Int, unkCost: Long, banned: String): Long = {
    val n = w.length
    val dp = Array.fill(n + 1)(Long.MaxValue)
    dp(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - ml)
      while (j < i) {
        if (dp(j) != Long.MaxValue) {
          val piece = w.substring(j, i)
          if (piece != banned) {
            val c = vm.getOrElse(piece, if (i - j == 1) unkCost else -1L)
            if (c >= 0L && dp(j) + c < dp(i)) dp(i) = dp(j) + c
          }
        }
        j += 1
      }
      i += 1
    }
    dp(n)
  }

  /** [[viterbiWord]] with the ARGMIN PATH — the E-step kernel of
    * [[Bpe.unigramTrainEm]]'s hard-EM training loop. Ties resolve by
    * the full lexicographic triple (cost, n_pieces, path-string with
    * U+001F separators): at a fixed DP position and piece count every
    * candidate path string has the SAME length (position chars +
    * np−1 separators), so prefix-min composes to global path-min and
    * one stored candidate per position suffices — the same total
    * order a SQL replay gets from ORDER BY cost, np, path. Returns
    * the pieces of the unique optimal segmentation (empty for the
    * empty/unsegmentable word).
    */
  private[graft] def viterbiWordPath(w: String, vm: Map[String, Long],
      ml: Int, unkCost: Long): Seq[String] = {
    val n = w.length
    val dpC = Array.fill(n + 1)(Long.MaxValue)
    val dpP = Array.fill(n + 1)(Long.MaxValue)
    val dpS = Array.fill[String](n + 1)(null)
    dpC(0) = 0L; dpP(0) = 0L; dpS(0) = ""
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - ml)
      while (j < i) {
        if (dpC(j) != Long.MaxValue) {
          val piece = w.substring(j, i)
          val c = vm.getOrElse(piece, if (i - j == 1) unkCost else -1L)
          if (c >= 0L) {
            val nc = dpC(j) + c; val np = dpP(j) + 1
            val ns = if (dpS(j).isEmpty) piece
                     else dpS(j) + "\u001f" + piece
            if (nc < dpC(i) || (nc == dpC(i) && (np < dpP(i) ||
                (np == dpP(i) && ns.compareTo(dpS(i)) < 0)))) {
              dpC(i) = nc; dpP(i) = np; dpS(i) = ns
            }
          }
        }
        j += 1
      }
      i += 1
    }
    if (dpS(n) == null) Seq.empty
    else dpS(n).split("\u001f").toSeq
  }

  def viterbiSegment(df: DataFrame, id: String, text: String,
      vocab: DataFrame, unkCost: Long = 10000L): DataFrame = {
    val vm = vocab.select(col("piece"), col("cost").cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxLen = if (vm.isEmpty) 1 else vm.keys.map(_.length).max
    val bc = df.sparkSession.sparkContext.broadcast((vm, maxLen))
    val segUdf = udf { (s: String) =>
      val (vmap, ml) = bc.value
      val words = if (s == null) Array.empty[String]
        else s.split(" ").filter(_.nonEmpty)
      var totalCost = 0L; var totalPieces = 0L
      words.foreach { w =>
        val (c, p) = viterbiWord(w, vmap, ml, unkCost)
        totalCost += c; totalPieces += p
      }
      (words.length.toLong, totalCost, totalPieces)
    }
    df.select(col(id), segUdf(norm(col(text))).as("__seg"))
      .select(col(id), col("__seg._1").as("n_words"),
        col("__seg._2").as("total_cost"), col("__seg._3").as("total_pieces"))
  }

  def urlParts(u: Column): Column = {
    val host = regexp_extract(u, "^[a-z][a-z0-9+.-]*://(?:[^/?#]*@)?([a-z0-9.-]+)", 1)
    val path = regexp_extract(u, "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    struct(
      regexp_extract(u, "^([a-z][a-z0-9+.-]*)://", 1).as("scheme"),
      host.as("host"),
      regexp_extract(u, "^[a-z][a-z0-9+.-]*://[a-z0-9.-]*:([0-9]+)", 1).as("port"),
      path.as("path"),
      regexp_extract(u, "\\?([^#]*)", 1).as("query"),
      regexp_extract(host, "\\.([a-z0-9-]+)$", 1).as("tld"),
      regexp_extract(host, "([a-z0-9-]+\\.[a-z0-9-]+)$", 1).as("domain"),
      size(filter(split(path, "/"), p => p =!= "")).as("path_depth"))
  }

  /** URL canonicalization — the crawl-dedup normalizer: the same page
    * arrives under dozens of surface forms (tracking params, fragments,
    * default ports, www, scheme/host case), and deduping on the RAW
    * url misses all of them. Steps, in order:
    *   1. trim; 2. drop the #fragment; 3. lowercase scheme://host
    *   (path case is significant and kept); 4. strip a leading www.;
    *   5. strip default ports :80/:443; 6. remove tracking params
    *   (utm_*, gclid, fbclid, ref) — anchored to a preceding '?' or
    *   '&' so 'href='/'pref=' params and path segments like
    *   '/ref=sr_1_1' are untouched (r8 advice: the unanchored form
    *   matched inside other tokens) — then tidy the separators left
    *   behind; 7. drop a now-empty trailing '?'/'&'.
    * Pure codegen'd regexp chain (no UDF); the q195 oracle implements
    * the same steps independently in DuckDB's regex dialect, so the
    * gate is engine-agreement on a shared VALUES fixture — q149's
    * pattern.
    */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(trim(u), "#.*$", "")
    // lowercase scheme://host only
    val head = lower(regexp_extract(noFrag, "^[^/]*//[^/]*", 0))
    val tail = regexp_replace(noFrag, "^[^/]*//[^/]*", "")
    val lowered = when(head === "", noFrag).otherwise(concat(head, tail))
    val noWww = regexp_replace(lowered, "^([a-z][a-z0-9+.-]*://)www\\.", "$1")
    val noPort = regexp_replace(noWww,
      "^([a-z][a-z0-9+.-]*://[^/:]+):(?:80|443)(/|$)", "$1$2")
    val noTrack = regexp_replace(noPort,
      "([?&])(utm_[a-z]+|gclid|fbclid|ref)=[^&#]*", "$1")
    // tidy: collapse the '&' runs the removals left, turn '?&' into
    // '?', then drop a dangling trailing separator
    val collapsed = regexp_replace(noTrack, "&&+", "&")
    val fixHead = regexp_replace(collapsed, "\\?&", "?")
    regexp_replace(fixHead, "[?&]+$", "")
  }

  /** Canonical-URL dedup census: group by [[canonicalUrl]], report
    * each canonical form's variant count and the kept (min) id — the
    * crawl-frontier dedup pass.
    */
  def canonicalUrlGroups(df: DataFrame, id: String, url: String): DataFrame =
    df.select(col(id), canonicalUrl(col(url)).as("canonical"))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_variants"), min(col(id)).as("keep_id"))

  /** Unicode-script profile of a text column — the script gate a
    * multilingual corpus applies before language-specific processing
    * (fasttext-style pipelines route or drop by script before any
    * model runs). Counts codepoints per script class with explicit
    * range regexes (evaluated independently by both engines), emits
    * floor-bp shares of the total letter mass and the dominant script
    * (ties broken by the fixed class order, then 'other').
    */
  def scriptProfile(c: Column): Column = {
    def cnt(ranges: String) =
      length(regexp_replace(c, s"[^$ranges]", "")).cast("long")
    val latin = cnt("a-zA-Z")
    val cyr = cnt("\\u0400-\\u04FF")
    val cjk = cnt("\\u4E00-\\u9FFF\\u3040-\\u30FF")
    val arab = cnt("\\u0600-\\u06FF")
    val letters = latin + cyr + cjk + arab
    def bp(x: Column) = when(letters > 0,
      floor(x * lit(10000L) / letters).cast("long")).otherwise(lit(0L))
    val dominant = when(letters === 0, "other")
      .when(latin >= cyr && latin >= cjk && latin >= arab, "latin")
      .when(cyr >= cjk && cyr >= arab, "cyrillic")
      .when(cjk >= arab, "cjk")
      .otherwise("arabic")
    struct(latin.as("latin"), cyr.as("cyrillic"), cjk.as("cjk"),
      arab.as("arabic"), bp(latin).as("latin_bp"), bp(cyr).as("cyrillic_bp"),
      bp(cjk).as("cjk_bp"), bp(arab).as("arabic_bp"),
      dominant.as("dominant"))
  }

  /** CODE-SWITCHING / language-mixture profile — per document, the
    * sentence-level language composition (a "monolingual" corpus whose
    * docs are half-and-half pollutes both language buckets; doc-level
    * language ID ([[langIdCol]]) cannot see it): sentences split on
    * [.!?]+, each classified by the SAME marker-scoring langid, then
    * per doc the dominant language, its share in floor basis points,
    * and the language-mixture entropy in exact floor-nano nats (the
    * [[graft.ops.Corpus.entropyTermExpr]] contract — entropy 0 =
    * monolingual, higher = switching).
    *
    * One explode + one (id, lang) count shuffle; the window and final
    * fold reuse the same id partitioning (one Exchange total beyond
    * the scan). Dominant ties break to the lexicographically smallest
    * language — deterministic, hash-gatable.
    *
    * @return (id, n_sentences, n_langs, dom_lang, dom_bp, entropy_nano)
    */
  def codeSwitchProfile(df: DataFrame, id: String, text: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sents = df.select(col(id), explode(split(col(text), "[.!?]+")).as("sent"))
      .withColumn("sent", trim(col("sent")))
      .filter(length(col("sent")) > 0)
      .withColumn("slang", langIdCol(col("sent")))
    val counts = sents.groupBy(col(id), col("slang"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(id))
    counts
      .withColumn("n_sentences", sum(col("cnt")).over(w))
      .withColumn("n_langs", count(lit(1)).over(w))
      .withColumn("term",
        expr(graft.ops.Corpus.entropyTermExpr("cnt", "n_sentences")))
      .groupBy(col(id), col("n_sentences"), col("n_langs"))
      .agg(sum(col("term")).as("entropy_nano"),
        min(struct((-col("cnt")).as("nc"), col("slang").as("l"))).as("d"))
      .select(col(id), col("n_sentences"), col("n_langs"),
        col("d.l").as("dom_lang"),
        expr("((-d.nc) * 10000) div n_sentences").as("dom_bp"),
        col("entropy_nano"))
  }

  // ---- PII scan / redaction (M6-adjacent: the pre-training privacy
  // pass every corpus pipeline runs before anything ships) -----------

  /** PII patterns, restricted to the regex subset where Java (Spark)
    * and RE2 (DuckDB) agree match-for-match: no lookaround, no
    * backreferences, ASCII word boundaries, counted repetition only.
    * Detection is pattern-grade by design (a validator, not an NER
    * model): emails, NN(N)-NNN-NNN-NNNN phone shapes, dotted-quad
    * IPv4s with octet range checks, and 16-digit card candidates —
    * card COUNTS additionally require the Luhn checksum, computed in
    * pure integer arithmetic so the count replays bit-for-bit.
    */
  val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // both the international NN(N)-NNN-NNN-NNNN shape and the ubiquitous
  // NNN-NNN-NNNN local shape (r13 ADVICE); the optional middle group is
  // tried greedily first in BOTH engines (Java greedy, RE2 default
  // leftmost-first), so a 4-part number is one match, never two
  val piiPhoneRe = "\\b[0-9]{2,3}-[0-9]{3}(-[0-9]{3})?-[0-9]{4}\\b"
  val piiIpv4Re = "\\b(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])" +
    "(\\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}\\b"
  val piiCardRe = "\\b[0-9]{16}\\b"
  // SSN shape NNN-NN-NNNN; issuable-range validity (area not 000/666/9xx,
  // group not 00, serial not 0000) is a separate integer check — RE2 has
  // no lookahead, so exclusions can't live in the pattern
  val piiSsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  // IBAN shape: country code + 2 check digits + 11..30 alphanumerics
  // (ISO 13616 BBAN); mod-97 validity is [[ibanValid]]
  val piiIbanRe = "\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\\b"

  /** Luhn checksum over a 16-digit candidate string — integer HOF, no
    * UDF: reversed position i doubles every even i with the −9
    * correction; valid iff the sum ≡ 0 (mod 10).
    */
  def luhnValid16(c: Column): Column = {
    val chars = split(c, "")
    val total = aggregate(sequence(lit(1), lit(16)), lit(0),
      (acc, i) => {
        val d = element_at(chars, (lit(17) - i).cast("int")).cast("int")
        val term = when(pmod(i, lit(2)) === 0,
          d * 2 - when(d > 4, 9).otherwise(0)).otherwise(d)
        acc + term
      })
    pmod(total, lit(10)) === 0
  }

  /** IBAN mod-97 check (ISO 13616): move the first 4 chars to the end,
    * map letters to 10..35, read the result as a decimal number — valid
    * iff ≡ 1 (mod 97). Computed as a left-to-right integer fold that
    * reduces mod 97 at every step (the textbook streaming form), so the
    * accumulator never exceeds 97·100 + 35 and the arithmetic replays
    * bit-for-bit in any engine — the oracle instead casts the mapped
    * digit string to HUGEINT and takes one modulo; both are the same
    * number theory.
    */
  def ibanValid(c: Column): Column = {
    val rearranged = concat(substring(c, 5, 64), substring(c, 1, 4))
    val chars = split(rearranged, "")
    val residue = aggregate(chars, lit(0L), (acc, ch) =>
      when(ch >= "A" && ch <= "Z",
        pmod(acc * 100 + (ascii(ch) - 55), lit(97L)))
        .otherwise(pmod(acc * 10 + ch.cast("long"), lit(97L))))
    residue === 1
  }

  /** SSN issuable-range check over a NNN-NN-NNNN match: area not 000,
    * not 666, below 900; group not 00; serial not 0000 (SSA rules).
    * Pure substring/integer arithmetic — replays exactly.
    */
  def ssnValid(c: Column): Column = {
    val area = substring(c, 1, 3).cast("int")
    val group = substring(c, 5, 2).cast("int")
    val serial = substring(c, 8, 4).cast("int")
    area =!= 0 && area =!= 666 && area < 900 && group =!= 0 && serial =!= 0
  }

  /** Per-document PII counts: one projection, no shuffle — each class
    * counted independently over the RAW text (a token can legitimately
    * hit two classes; per-class counts are the audit contract). Card
    * candidates are counted twice: raw 16-digit runs and the
    * Luhn-valid subset (the false-positive discriminator).
    *
    * @return (id, n_email, n_phone, n_ipv4, n_card_raw, n_card_luhn,
    *         pii_total — emails + phones + ips + Luhn-valid cards)
    */
  def piiScan(df: DataFrame, id: String, text: String): DataFrame = {
    val t = coalesce(col(text), lit(""))
    def cnt(re: String) =
      size(regexp_extract_all(t, lit(re), lit(0))).cast("long")
    val cards = regexp_extract_all(t, lit(piiCardRe), lit(0))
    df.select(col(id),
        cnt(piiEmailRe).as("n_email"),
        cnt(piiPhoneRe).as("n_phone"),
        cnt(piiIpv4Re).as("n_ipv4"),
        size(cards).cast("long").as("n_card_raw"),
        size(filter(cards, c => luhnValid16(c))).cast("long")
          .as("n_card_luhn"))
      .withColumn("pii_total",
        col("n_email") + col("n_phone") + col("n_ipv4") + col("n_card_luhn"))
  }

  /** Extended per-document PII counts (r13 verdict item 7): IBAN and
    * SSN shapes with their validity splits — raw shape matches vs the
    * subset passing the class's integer checksum/range rules (mod-97
    * for IBAN, SSA issuable ranges for SSN) — plus the phone count so
    * the NNN-NNN-NNNN alternation is gated. Same posture as
    * [[piiScan]]: one projection, no shuffle, validators not NER.
    *
    * @return (id, n_phone, n_ssn_raw, n_ssn_valid, n_iban_raw,
    *         n_iban_valid)
    */
  def piiScanExtended(df: DataFrame, id: String, text: String): DataFrame = {
    val t = coalesce(col(text), lit(""))
    val ssns = regexp_extract_all(t, lit(piiSsnRe), lit(0))
    val ibans = regexp_extract_all(t, lit(piiIbanRe), lit(0))
    df.select(col(id),
      size(regexp_extract_all(t, lit(piiPhoneRe), lit(0))).cast("long")
        .as("n_phone"),
      size(ssns).cast("long").as("n_ssn_raw"),
      size(filter(ssns, c => ssnValid(c))).cast("long").as("n_ssn_valid"),
      size(ibans).cast("long").as("n_iban_raw"),
      size(filter(ibans, c => ibanValid(c))).cast("long").as("n_iban_valid"))
  }

  /** PII redaction — the write-side companion of [[piiScan]]: each
    * class replaced by a typed placeholder, applied in a FIXED order
    * (email, phone, ssn, card, iban, ip) so the output is
    * deterministic and the oracle replays the same chain with
    * 'g'-flagged regexp_replace. All shape matches are redacted (not
    * only checksum-valid ones) — on the write side false positives
    * are the safe direction.
    */
  def piiRedact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(coalesce(c, lit("")),
                piiEmailRe, "<EMAIL>"),
              piiPhoneRe, "<PHONE>"),
            piiSsnRe, "<SSN>"),
          piiCardRe, "<CARD>"),
        piiIbanRe, "<IBAN>"),
      piiIpv4Re, "<IP>")
}
