package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Corpus, Similarity}

/** Corpus-preparation operators (graft.ops.Corpus): benchmark
  * decontamination, PII redaction, sequence packing, deterministic
  * hash sampling, TF-IDF, semantic (embedding-cluster) dedup.
  *
  * Every oracle replays the Spark kernel in DuckDB SQL — including a
  * full unrolled replay of the deterministic k-means used by
  * semanticDupPairs — so all six are hash-gated, not rows-only.
  */
object CorpusQueries extends QueryGroup {

  /** DuckDB: normalized text (Dedup.normText). */
  private val sqlNorm = "LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))"

  /** DuckDB replay of [[graft.expressions.TextHashes.poly_hash]] (same
    * helper as LlmQueries.sqlPoly — fold a·31+codepoint mod 1e9+7).
    */
  private def sqlPoly(e: String): String =
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, x) -> (a * 31 + x) % 1000000007)"

  /** DuckDB replay of [[Corpus.stupidBackoffScore]] (hashed = false)
    * and [[Corpus.stupidBackoffScoreHashed]] (hashed = true): train on
    * the even-id half, score every doc with ≥ 3 tokens. ONE oracle
    * body for both tiers — the only divergences are the gram join keys
    * (strings vs sqlPoly BIGINTs), exactly the divergences of the two
    * Spark ops. The per-trigram term is the literal
    * [[Corpus.sbTermExpr]] string, so the double arithmetic replays
    * operation-for-operation (floor-nano → BIGINT sum, order-immune).
    */
  private def sbOracleSql(hashed: Boolean): String = {
    val keyed =
      if (!hashed)
        s"""tri AS (SELECT doc_id, w1, w2, w3 FROM tri0),
           |c1 AS (SELECT w1, COUNT(*) AS c1u FROM uni WHERE doc_id % 2 = 0 GROUP BY 1),
           |c2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big0 WHERE doc_id % 2 = 0 GROUP BY 1, 2),
           |c3 AS (SELECT w1, w2, w3, COUNT(*) AS c123 FROM tri0 WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
           |tritab AS (SELECT c3.w1, c3.w2, c3.w3, c123, c12 FROM c3 JOIN c2 USING (w1, w2)),
           |bitab AS (SELECT c2.w1 AS w2, c2.w2 AS w3, c2.c12 AS c23, c1.c1u AS c2u
           |  FROM c2 JOIN c1 ON c2.w1 = c1.w1),
           |unitab AS (SELECT w1 AS w3, c1u AS c3u FROM c1),
           |sc AS (SELECT tri.doc_id, ${graft.ops.Corpus.sbTermExpr(0.4)} AS term
           |  FROM tri LEFT JOIN tritab USING (w1, w2, w3)
           |           LEFT JOIN bitab USING (w2, w3)
           |           LEFT JOIN unitab USING (w3)
           |           CROSS JOIN ntot)""".stripMargin
      else
        s"""tri AS (SELECT doc_id,
           |    ${sqlPoly("w1 || ' ' || w2 || ' ' || w3")} AS h3,
           |    ${sqlPoly("w1 || ' ' || w2")} AS h2a,
           |    ${sqlPoly("w2 || ' ' || w3")} AS h23,
           |    ${sqlPoly("w2")} AS hw2, ${sqlPoly("w3")} AS hw3 FROM tri0),
           |big AS (SELECT doc_id, ${sqlPoly("w1 || ' ' || w2")} AS h2,
           |    ${sqlPoly("w1")} AS hw1 FROM big0),
           |uh AS (SELECT doc_id, ${sqlPoly("w1")} AS h1 FROM uni),
           |c1 AS (SELECT h1, COUNT(*) AS c1u FROM uh WHERE doc_id % 2 = 0 GROUP BY 1),
           |c2solo AS (SELECT h2, COUNT(*) AS c12 FROM big WHERE doc_id % 2 = 0 GROUP BY 1),
           |c2pair AS (SELECT hw1, h2, COUNT(*) AS c23 FROM big WHERE doc_id % 2 = 0 GROUP BY 1, 2),
           |c3 AS (SELECT h2a, h3, COUNT(*) AS c123 FROM tri WHERE doc_id % 2 = 0 GROUP BY 1, 2),
           |tritab AS (SELECT c3.h2a, c3.h3, c123, c12
           |  FROM c3 JOIN (SELECT h2 AS h2a, c12 FROM c2solo) s USING (h2a)),
           |bitab AS (SELECT c2pair.hw1 AS hw2, c2pair.h2 AS h23, c23, c1.c1u AS c2u
           |  FROM c2pair JOIN c1 ON c2pair.hw1 = c1.h1),
           |unitab AS (SELECT h1 AS hw3, c1u AS c3u FROM c1),
           |sc AS (SELECT tri.doc_id, ${graft.ops.Corpus.sbTermExpr(0.4)} AS term
           |  FROM tri LEFT JOIN tritab USING (h2a, h3)
           |           LEFT JOIN bitab USING (hw2, h23)
           |           LEFT JOIN unitab USING (hw3)
           |           CROSS JOIN ntot)""".stripMargin
    s"""WITH d AS (SELECT doc_id,
       |    list_filter(string_split($sqlNorm, ' '), w -> length(w) > 0) AS ws
       |  FROM documents),
       |tri0 AS (SELECT doc_id, ws[CAST(i AS INTEGER)] AS w1,
       |    ws[CAST(i + 1 AS INTEGER)] AS w2, ws[CAST(i + 2 AS INTEGER)] AS w3
       |  FROM d, UNNEST(range(1, len(ws) - 1)) AS r(i)),
       |big0 AS (SELECT doc_id, ws[CAST(i AS INTEGER)] AS w1,
       |    ws[CAST(i + 1 AS INTEGER)] AS w2
       |  FROM d, UNNEST(range(1, len(ws))) AS r(i)),
       |uni AS (SELECT doc_id, unnest(ws) AS w1 FROM d),
       |ntot AS (SELECT COUNT(*) AS n_train FROM uni WHERE doc_id % 2 = 0),
       |$keyed
       |SELECT doc_id, COUNT(*) AS n_tri, CAST(SUM(term) AS BIGINT) AS sb_nano
       |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of [[Corpus.packBestFit]] (budget 64, 16 shards):
    * the best-fit-decreasing fold runs as a recursive CTE — one row
    * per shard per step, bins as a BIGINT list, tightest-feasible =
    * list_position of the min feasible remaining (first occurrence =
    * lowest bin id, Spark's TreeSet.first tie-break). Ends with CTE
    * `st`; assignments are the step ≥ 1 rows.
    */
  private val sqlBestFitCtes: String =
    s"""d AS (SELECT doc_id,
       |    len(list_filter(string_split($sqlNorm, ' '), w -> length(w) > 0)) AS n
       |  FROM documents),
       |pieces0 AS (SELECT doc_id, n, UNNEST(range(0, (n + 63) // 64)) AS piece
       |  FROM d WHERE n > 0),
       |pieces AS (SELECT (doc_id * 2654435761) % 4294967296 % 16 AS shard,
       |    doc_id, piece, LEAST(64, n - piece * 64) AS len FROM pieces0),
       |rk AS (SELECT shard, doc_id, piece, len,
       |    ROW_NUMBER() OVER (PARTITION BY shard
       |      ORDER BY len DESC, doc_id, piece) AS rk
       |  FROM pieces),
       |st AS (
       |  SELECT shard, 0 AS step, CAST([] AS BIGINT[]) AS bins,
       |    CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS piece,
       |    CAST(NULL AS BIGINT) AS len, CAST(NULL AS BIGINT) AS bin
       |  FROM (SELECT DISTINCT shard FROM rk)
       |  UNION ALL
       |  SELECT s.shard, s.step + 1,
       |    CASE WHEN list_position(s.bins,
       |        list_min(list_filter(s.bins, x -> x >= p.len))) IS NULL
       |      THEN list_append(s.bins, 64 - p.len)
       |      ELSE list_transform(s.bins, (x, i) ->
       |        CASE WHEN i = list_position(s.bins,
       |            list_min(list_filter(s.bins, x2 -> x2 >= p.len)))
       |          THEN x - p.len ELSE x END)
       |    END,
       |    p.doc_id, p.piece, p.len,
       |    COALESCE(list_position(s.bins,
       |        list_min(list_filter(s.bins, x -> x >= p.len))),
       |      len(s.bins) + 1)
       |  FROM st s JOIN rk p ON p.shard = s.shard AND p.rk = s.step + 1
       |)""".stripMargin

  /** DuckDB replay of [[Corpus.naiveBayesPredict]] trained on the
    * doc_id %3 != 0 slice (lang = class, 256 hash buckets), predicting
    * the held-out third: per-(bucket, class) counts → floor-micro
    * log-likelihoods over the full seen-bucket × class grid, floor-micro
    * log-priors, integer score sum, ROW_NUMBER argmax (score desc,
    * label asc). Ends with CTE `best` (doc_id, lang, score_micro,
    * n_known, rk).
    */
  private val sqlNbCtes: String =
    s"""d AS (SELECT doc_id, lang, $sqlNorm AS s FROM documents),
       |tokall AS (SELECT doc_id, lang, unnest(string_split(s, ' ')) AS term FROM d),
       |tok AS (SELECT doc_id, lang, term FROM tokall WHERE length(term) > 0),
       |dt AS (SELECT DISTINCT term FROM tok),
       |hb AS (SELECT term, ${sqlPoly("term")} % 256 AS b FROM dt),
       |tb AS (SELECT doc_id, lang, b FROM tok JOIN hb USING (term)),
       |tr AS (SELECT * FROM tb WHERE doc_id % 3 != 0),
       |ct AS (SELECT lang, b, COUNT(*) AS cnt FROM tr GROUP BY 1, 2),
       |tot AS (SELECT lang, COUNT(*) AS tot FROM tr GROUP BY 1),
       |grid AS (SELECT sb.b, tot.lang, tot.tot
       |  FROM (SELECT DISTINCT b FROM ct) sb CROSS JOIN tot),
       |model AS (SELECT g.b, g.lang,
       |    CAST(FLOOR(LN((COALESCE(ct.cnt, 0) + 0.5) / (g.tot + 128.0))
       |      * 1000000.0) AS BIGINT) AS ll
       |  FROM grid g LEFT JOIN ct ON g.b = ct.b AND g.lang = ct.lang),
       |nd AS (SELECT lang, COUNT(*) AS ndocs FROM documents WHERE doc_id % 3 != 0 GROUP BY 1),
       |ndt AS (SELECT COUNT(*) AS nd_tot FROM documents WHERE doc_id % 3 != 0),
       |pri AS (SELECT lang, CAST(FLOOR(LN(CAST(ndocs AS DOUBLE) / nd_tot)
       |    * 1000000.0) AS BIGINT) AS prior FROM nd, ndt),
       |te AS (SELECT doc_id, b FROM tb WHERE doc_id % 3 = 0),
       |sc AS (SELECT te.doc_id, m.lang, CAST(SUM(m.ll) AS BIGINT) AS s,
       |    COUNT(*) AS n_known
       |  FROM te JOIN model m USING (b) GROUP BY 1, 2),
       |sc2 AS (SELECT sc.doc_id, sc.lang, CAST(sc.s + pri.prior AS BIGINT) AS score_micro,
       |    sc.n_known
       |  FROM sc JOIN pri USING (lang)),
       |best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY score_micro DESC, lang) AS rk FROM sc2)""".stripMargin

  /** DuckDB: index-order dot product of two 64-dim float-list columns. */
  private[queries] def sqlDot(a: String, ac: String, b: String, bc: String): String =
    s"list_sum(list_transform(range(1, 65), i -> " +
      s"CAST($a.$ac[i] AS DOUBLE) * CAST($b.$bc[i] AS DOUBLE)))"

  /** DuckDB CTEs replaying Similarity.kmeansCentroids exactly: seeds =
    * the k lowest-id vectors; each round assigns by argmax dot (ties →
    * lowest cluster id) then recomputes per-position means cast to
    * FLOAT (the float cast is what makes the fixpoint engine-portable:
    * it absorbs last-ulp double-summation-order noise on both sides).
    */
  private[queries] def sqlKmeansCtes(k: Int, iters: Int): String = {
    val seed =
      s"""c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl,
         |  embedding AS c_vec FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $k))""".stripMargin
    val rounds = (1 to iters).map { it =>
      s"""a$it AS (SELECT vec_id, embedding, cl FROM (
         |  SELECT e.vec_id, e.embedding, c.cl,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlDot("e", "embedding", "c", "c_vec")} DESC, c.cl ASC) AS rn
         |  FROM embeddings e, c${it - 1} c) s WHERE rn = 1),
         |m$it AS (SELECT cl, i, CAST(AVG(CAST(embedding[i] AS DOUBLE)) AS FLOAT) AS m
         |  FROM a$it, range(1, 65) t(i) GROUP BY cl, i),
         |c$it AS (SELECT cl, list(m ORDER BY i) AS c_vec FROM m$it GROUP BY cl)""".stripMargin
    }
    (seed +: rounds).mkString(",\n")
  }

  /** [[sqlKmeansCtes]] generalized to a NAMED source CTE (columns
    * vec_id, embedding) with prefixed CTE names, so two independent
    * chains over different corpus splits coexist in one WITH — the
    * q244b oracle needs one chain per mining direction. Ends at
    * `${p}c$iters(cl, c_vec)`.
    */
  private[queries] def sqlKmeansCtesOver(p: String, src: String,
      k: Int, iters: Int): String = {
    val seed =
      s"""${p}c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl,
         |  embedding AS c_vec FROM (SELECT vec_id, embedding FROM $src ORDER BY vec_id LIMIT $k))""".stripMargin
    val rounds = (1 to iters).map { it =>
      s"""${p}a$it AS (SELECT vec_id, embedding, cl FROM (
         |  SELECT e.vec_id, e.embedding, c.cl,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlDot("e", "embedding", "c", "c_vec")} DESC, c.cl ASC) AS rn
         |  FROM $src e, ${p}c${it - 1} c) s WHERE rn = 1),
         |${p}m$it AS (SELECT cl, i, CAST(AVG(CAST(embedding[i] AS DOUBLE)) AS FLOAT) AS m
         |  FROM ${p}a$it, range(1, 65) t(i) GROUP BY cl, i),
         |${p}c$it AS (SELECT cl, list(m ORDER BY i) AS c_vec FROM ${p}m$it GROUP BY cl)""".stripMargin
    }
    (seed +: rounds).mkString(",\n")
  }

  /** Index-order dot of a SLICE of `embedding` against a (pre-sliced)
    * codeword list — the subspace form of [[sqlDot]]. `off` is 0-based.
    */
  private[queries] def sqlDotSlice(a: String, off: Int, len: Int,
      b: String, bc: String): String =
    s"list_sum(list_transform(range(1, ${len + 1}), i -> " +
      s"CAST($a.embedding[$off + i] AS DOUBLE) * CAST($b.$bc[i] AS DOUBLE)))"

  /** Subspace k-means replay for the PQ oracle: [[sqlKmeansCtes]] with
    * every dot/mean confined to `embedding[off+1 .. off+len]` and CTE
    * names prefixed `p` so four independent chains coexist in one WITH.
    * Ends with `${p}sel(vec_id, c_vec)`: each vector's FINAL codeword
    * (assignment against the last-round codebook — exactly what
    * [[graft.ops.Similarity.pqAssign]] emits as the code).
    */
  private[queries] def sqlKmeansCtesSub(p: String, off: Int, len: Int,
      k: Int, iters: Int): String = {
    val seed =
      s"""${p}c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl,
         |  embedding[${off + 1}:${off + len}] AS c_vec
         |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $k))""".stripMargin
    val rounds = (1 to iters).map { it =>
      s"""${p}a$it AS (SELECT vec_id, cl FROM (
         |  SELECT e.vec_id, c.cl,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlDotSlice("e", off, len, "c", "c_vec")} DESC, c.cl ASC) AS rn
         |  FROM embeddings e, ${p}c${it - 1} c) s WHERE rn = 1),
         |${p}m$it AS (SELECT cl, i, CAST(AVG(CAST(e.embedding[$off + i] AS DOUBLE)) AS FLOAT) AS m
         |  FROM ${p}a$it a JOIN embeddings e USING (vec_id), range(1, ${len + 1}) t(i) GROUP BY cl, i),
         |${p}c$it AS (SELECT cl, list(m ORDER BY i) AS c_vec FROM ${p}m$it GROUP BY cl)""".stripMargin
    }
    val sel =
      s"""${p}sel AS (SELECT vec_id, c_vec FROM (
         |  SELECT e.vec_id, c.cl,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlDotSlice("e", off, len, "c", "c_vec")} DESC, c.cl ASC) AS rn
         |  FROM embeddings e, ${p}c$iters c) s
         |  JOIN ${p}c$iters c2 ON c2.cl = s.cl WHERE rn = 1)""".stripMargin
    (seed +: rounds :+ sel).mkString(",\n")
  }

  /** Shared by q140 and q140b: both decontamination plans (broadcast
    * semi-join vs bloom-prefiltered shuffle) must emit identical rows.
    */
  private lazy val decontOracle: String =
    s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
       |tk AS (SELECT doc_id, string_split(s, ' ') AS toks FROM t),
       |grams AS (SELECT doc_id, unnest(list_distinct(
       |    [concat_ws(' ', toks[i], toks[i+1], toks[i+2]) for i in range(1, len(toks) - 1)])) AS gram
       |  FROM tk),
       |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
       |totals AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY 1),
       |hits AS (SELECT g.doc_id, COUNT(*) AS n_overlap FROM grams g JOIN bench b USING (gram) GROUP BY 1)
       |SELECT h.doc_id, CAST(t.n_grams AS INTEGER) AS n_grams,
       |  CAST(h.n_overlap AS INTEGER) AS n_overlap,
       |  CAST(FLOOR(h.n_overlap * 10000.0 / t.n_grams) AS BIGINT) AS overlap_bp
       |FROM hits h JOIN totals t USING (doc_id) ORDER BY doc_id""".stripMargin

  override def queries: Map[String, Q] = Map(
    // benchmark decontamination: flag corpus docs sharing a token
    // 3-gram with the eval set (docs with doc_id % 97 == 0)
    "q140_decontaminate" -> ((s, d) => {
      val corpus = Tables.documents(s, d)
      val bench = corpus.filter(pmod(col("doc_id"), lit(97)) === 0)
      Corpus.decontaminate(corpus, bench, "doc_id", "text", n = 3)
        // gate on the integer pair; the ratio is derived — floor to
        // basis points (identical IEEE doubles → identical floor) so
        // no round-half boundary can diverge between engines
        .withColumn("overlap_bp",
          floor(col("n_overlap") * lit(10000.0) / col("n_grams")).cast("long"))
        .select(col("doc_id"), col("n_grams"), col("n_overlap"), col("overlap_bp"))
        .orderBy(col("doc_id"))
    }),

    // the too-big-to-broadcast variant: bloom-prefiltered shuffle
    // semi-join, exactness preserved (trailing exact gram semi-join
    // kills bloom false positives) — MUST equal q140 bit-for-bit, so
    // it shares q140's oracle SQL verbatim
    "q140b_decontaminate_large" -> ((s, d) => {
      val corpus = Tables.documents(s, d)
      val bench = corpus.filter(pmod(col("doc_id"), lit(97)) === 0)
      Corpus.decontaminateLarge(corpus, bench, "doc_id", "text", n = 3)
        .withColumn("overlap_bp",
          floor(col("n_overlap") * lit(10000.0) / col("n_grams")).cast("long"))
        .select(col("doc_id"), col("n_grams"), col("n_overlap"), col("overlap_bp"))
        .orderBy(col("doc_id"))
    }),

    // PII redaction: emails / IPv4 / phone-shaped numbers, with match
    // counts. PII is injected deterministically from doc_id on BOTH
    // sides (the synthetic corpus has none).
    "q141_redact_pii" -> ((s, d) => {
      val df = Tables.documents(s, d).select(col("doc_id"),
        concat(substring(col("text"), 1, 40),
          lit(" contact user"), col("doc_id"), lit("@mail.example.org via 10.0."),
          pmod(col("doc_id"), lit(250)), lit(".7 tel 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")).as("text"))
      Corpus.redactPii(df, "text")
        .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
          col("redacted"))
        .orderBy(col("doc_id"))
    }),

    // sequence packing: global token offsets + 512-token window ids via
    // the two-phase distributed prefix sum (no whole-corpus Window)
    "q142_pack_sequences" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      import graft.ops.Dedup
      Corpus.packSequences(docs, "doc_id",
          size(split(Dedup.normText(col("text")), " ")), budget = 512)
        .orderBy(col("doc_id"))
    }),

    // packing budgets over REAL tokenizer counts: wordpiece subword
    // tokenization (q109's kernel, one map stage) feeds the two-phase
    // prefix-sum packer — the actual pretraining layout computation
    "q142b_pack_by_subword" -> ((s, d) => {
      val counted = graft.ops.TextAnalysis.wordpieceTokenize(
        Tables.documents(s, d), "doc_id", "text")
      Corpus.packSequences(counted, "doc_id", col("n_tokens"), budget = 512)
        .orderBy(col("doc_id"))
    }),

    // deterministic stratified sampling by multiplicative hash of the id
    // — reproducible across runs AND engines (unlike RNG sample, q39)
    "q143_sample_by_hash" -> ((s, d) => {
      Corpus.sampleByHash(Tables.documents(s, d), "doc_id", "lang",
          rates = Map("es" -> 0.5, "zh" -> 0.05), defaultRate = 0.2)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // per-document top-3 TF-IDF terms
    "q144_tfidf" -> ((s, d) => {
      Corpus.tfidf(Tables.documents(s, d), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // SemDeDup-style semantic dedup: learned k-means clusters, within-
    // cluster cosine pairs above threshold. Gated through the scale-safe
    // size-derived default: 500 fixture vectors -> k = ceil(sqrt(500)) =
    // 23, and the oracle unrolls its k-means CTEs at the same k.
    "q145_semantic_dedup" -> ((s, d) => {
      Corpus.semanticDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.4, iters = 2)
        .orderBy(col("a"), col("b"))
    }),

    // distributed Misra–Gries heavy hitters: top-20 tokens, provably
    // exact (each row's ok flag is the displacement-bound proof)
    "q146_heavy_hitters" -> ((s, d) => {
      Corpus.heavyHitters(Tables.documents(s, d), "doc_id", "text",
          k = 20, capacity = 1024)
        .orderBy(col("rnk"))
    }),

    // CCNet-style boilerplate chunk removal: 8-token chunks occurring in
    // ≥3 distinct docs are stripped, survivors reassembled in order
    "q148_boilerplate_strip" -> ((s, d) => {
      Corpus.boilerplateStrip(Tables.documents(s, d), "doc_id", "text",
          w = 8, minDocs = 3)
        .orderBy(col("doc_id"))
    }),

    // C4 keep-first line dedup (NEW r10): exactly ONE copy of each
    // duplicated 8-token chunk survives corpus-wide (the globally first
    // occurrence by (doc_id, cidx)); complements q148, which removes
    // ALL copies of frequent chunks. First-occurrence via an argmin
    // aggregate, never a window over the chunk key (hot chunks stay
    // map-side-combined)
    "q221_line_dedup_keep_first" -> ((s, d) => {
      Corpus.dedupLinesKeepFirst(Tables.documents(s, d), "doc_id", "text",
          w = 8)
        .orderBy(col("doc_id"))
    }),

    // consistent bottom-5-per-language sample (exact count per stratum,
    // membership stable under corpus growth — unlike a rate filter)
    "q147_bottomk_sample" -> ((s, d) => {
      Corpus.bottomKPerStratum(Tables.documents(s, d), "lang", "doc_id", n = 5)
        .select(col("lang"), col("doc_id"), col("bucket"), col("rnk"))
        .orderBy(col("lang"), col("rnk"))
    }),

    // corpus-trained bigram LM score (the CCNet perplexity-filter
    // signal, self-contained: the model IS the corpus counts)
    "q151_bigram_lm" -> ((s, d) => {
      Corpus.bigramLmScore(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // inverted index: df / total tf / first-10 posting list per term
    "q152_inverted_index" -> ((s, d) => {
      Corpus.invertedIndex(Tables.documents(s, d), "doc_id", "text",
          maxPostings = 10)
        .orderBy(col("term"))
    }),

    // document-level PMI over the 30-term core vocabulary
    "q153_pmi" -> ((s, d) => {
      Corpus.pmiPairs(Tables.documents(s, d), "doc_id", "text",
          topN = 30, minPairDf = 5)
        .orderBy(col("term_a"), col("term_b"))
    }),

    // windowed skip-gram co-occurrence PMI (NEW r14): the statistic
    // SGNS factorizes — position-window pair counts (q153 counts
    // documents), pair generation a map-side array expression (no
    // self-join), normalizers computed before the frequency cuts
    "q282_coocc_pmi" -> ((s, d) => {
      Corpus.cooccurrencePmi(Tables.documents(s, d), "text",
          window = 3, minCount = 20L, minPair = 5L)
        .orderBy(col("term_a"), col("term_b"))
    }),

    // hashed-feature linear quality classifier: zero-shuffle map-stage
    // inference; the logit is exact-IEEE on both engines (no sigmoid)
    "q155_quality_classifier" -> ((s, d) => {
      Corpus.qualityClassifierScore(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // domain-mixture resampling: per-language keep-rates toward a
    // 300-doc en/es/zh mixture (es hits the rate cap), hash-filtered
    "q156_mixture_resample" -> ((s, d) => {
      Corpus.mixtureResample(Tables.documents(s, d), "doc_id", "lang",
          targets = Map("en" -> 0.5, "es" -> 0.3, "zh" -> 0.2), budget = 300)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          max(round(col("rate"), 6)).as("rate"),
          max(col("n_stratum")).as("n_stratum"))
        .orderBy(col("lang"))
    }),

    // curriculum interleave (NEW r14): the deterministic ORDERING side
    // of mixture weighting — virtual timestamp rank·1e6 div weight per
    // source, so weight-w sources appear w× as densely in the train
    // order; two-phase per-source ranks (hash-top-bits chunking, no
    // unbounded window), (hash, id) within-source order. Gate = the
    // first 200 positions of the order (TakeOrdered, a total order)
    "q276_curriculum_interleave" -> ((s, d) => {
      val weights = s.range(20).select(
        concat(lit("src"), col("id")).as("source"),
        (col("id") % 4 + 1).as("weight"))
      Corpus.curriculumInterleave(Tables.documents(s, d), "doc_id",
          "source", weights)
        .orderBy(col("vt_micro"), col("source"), col("rn"))
        .limit(200)
    }),

    // deterministic weighted sample without replacement (NEW r11):
    // Efraimidis–Spirakis with hash-derived uniforms — priority =
    // floor(1e9·ln(P/(h+1))/w), keep the k smallest. A pure function
    // of (ids, weights, k), so unlike RNG sample (q39) it hash-gates;
    // weight = n_chars biases the 100-doc draw toward longer docs
    "q226_weighted_sample" -> ((s, d) => {
      Corpus.weightedSampleDet(Tables.documents(s, d), "doc_id",
        "n_chars", k = 100)
    }),

    // per-stratum exact-k weighted sample (NEW r11): 30 best-ish docs
    // per language by n_chars-weighted E–S priority — grp-partitioned
    // rank, never a global window
    "q226b_weighted_sample_by" -> ((s, d) => {
      Corpus.weightedSampleDetBy(Tables.documents(s, d), "doc_id",
          "n_chars", "lang", kPerStratum = 30)
        .orderBy(col("grp"), col("rk"))
    }),

    // mixture resampling WITH upsampling: rates above 1 replicate
    // (floor(r) copies + one hash-gated fractional copy, E[copies]=r).
    // At sf0.01 this profile downsamples en (0.55×) and upsamples zh
    // (2.4×) and es (4.11×); de/fr get target 0 and drop. Gated on
    // the full (doc_id, lang, copy) emitted set.
    "q156e_mixture_upsample" -> ((s, d) => {
      Corpus.mixtureUpsample(Tables.documents(s, d), "doc_id", "lang",
          targets = Map("en" -> 0.2, "es" -> 0.5, "zh" -> 0.3), budget = 600)
        .select(col("doc_id"), col("lang"), col("copy"))
        .orderBy(col("doc_id"), col("copy"))
    }),

    // mixture resampling toward a TOKEN budget — the unit pretraining
    // actually plans in: real wordpiece counts (q109's kernel) drive
    // per-language keep-rates of budget·target/token-mass
    "q156b_mixture_by_tokens" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val counted = graft.ops.TextAnalysis
        .wordpieceTokenize(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      Corpus.mixtureResampleTokens(counted, "doc_id", "lang",
          col("n_tokens"),
          targets = Map("en" -> 0.5, "es" -> 0.3, "zh" -> 0.2),
          budgetTokens = 25000)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_tokens")).as("kept_tokens"),
          max(round(col("rate"), 6)).as("rate"),
          max(col("tok_stratum")).as("tok_stratum"))
        .orderBy(col("lang"))
    }),

    // vocabulary frequency-of-frequencies spectrum (hapax count, Zipf
    // tail mass) — the corpus-health dashboard row
    "q157_vocab_stats" -> ((s, d) => {
      Corpus.vocabStats(Tables.documents(s, d), "text", maxFreq = 10)
        .orderBy(col("bucket"))
    }),

    // Zipf slope of the top-200 terms (corpus-health regression)
    "q157b_zipf_slope" -> ((s, d) => {
      Corpus.zipfSlope(Tables.documents(s, d), "text", topK = 200)
    }),

    // deterministic shard manifest: stable hash sharding + per-shard
    // doc/token totals (the training-data writer layout step)
    "q158_shard_manifest" -> ((s, d) => {
      Corpus.shardManifest(Tables.documents(s, d), "doc_id", "text",
          nShards = 8)
        .orderBy(col("shard"))
    }),

    // the one-call pipeline: quality → decontaminate (bench = doc_id%97
    // docs) → exact dedup → en/es/zh mixture sampling; every row comes
    // back with its keep flag and first failing stage
    "q161_prepare_corpus" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Corpus.prepareCorpus(docs, "doc_id", "text", "lang",
          targets = Map("en" -> 0.5, "es" -> 0.3, "zh" -> 0.2),
          budget = 250,
          benchmark = docs.filter(pmod(col("doc_id"), lit(97)) === 0),
          n = 3, minTokens = 40)
        .orderBy(col("doc_id"))
    }),

    // RAG/pretraining chunking: 64-token chunks, 16-token overlap
    "q160_chunk_documents" -> ((s, d) => {
      Corpus.chunkDocuments(Tables.documents(s, d), "doc_id", "text",
          size = 64, overlap = 16)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // weighted sampling: per-language bottom-3 Efraimidis–Spirakis keys
    // weighted by token count — longer docs proportionally likelier,
    // fully deterministic (hash-derived uniforms, no RNG)
    "q159_weighted_sample" -> ((s, d) => {
      import graft.ops.Dedup
      Corpus.weightedSample(Tables.documents(s, d), "doc_id", "lang",
          size(split(Dedup.normText(col("text")), " ")).cast("double"), n = 3)
        .select(col("lang"), col("rnk"), col("doc_id"), col("es_key"))
        .orderBy(col("lang"), col("rnk"))
    }),

    // exact duplicate-substring spans at 5-token window granularity
    // (Lee et al. 2022 substring-dedup signal: position counts + the
    // longest duplicated run per doc)
    "q154_dup_spans" -> ((s, d) => {
      Corpus.dupSpans(Tables.documents(s, d), "doc_id", "text", l = 5)
        .orderBy(col("doc_id"))
    }),

    // the q154 signal turned into the actual TRANSFORM: excise every
    // token covered by a non-first duplicated 5-token window and
    // rebuild each doc (Lee et al. substring dedup with rewrite).
    // numParts is left on AUTO: the op sizes its own shuffle width
    // from a token-count pass, so this same query plan is untouched at
    // sf0.01/0.1 and widens itself on a 100× corpus (PLANS.md r8 row:
    // 2688→268 MiB peak task AND 128→~100 s wall on the same fixture)
    "q154b_dedup_substrings" -> ((s, d) => {
      Corpus.dedupSpansRewrite(Tables.documents(s, d), "doc_id", "text", l = 5)
        .orderBy(col("doc_id"))
    }),

    // EXACT char-level duplicated spans by distributed suffix ranking
    // (NEW r16, the exact Lee-et-al tier q154 approximates at token
    // granularity): prefix-doubling rank classes at exactly 30 chars,
    // no hashes, no window strings; spans merge per doc. doc_id % 4
    // slice keeps the oracle's substring census cheap
    "q321_suffix_spans" -> ((s, d) => {
      Corpus.suffixRankSpans(
          Tables.documents(s, d).filter(col("doc_id") % 4 === 0),
          "doc_id", "text", minLen = 30)
        .orderBy(col("doc_id"), col("span_start"))
    }),

    // the exact tier's TRANSFORM (NEW r16): excise every char covered
    // by a non-first duplicated 30-char window class and rebuild —
    // q154b's rewrite semantics with rank classes instead of window
    // strings
    "q321b_suffix_rewrite" -> ((s, d) => {
      Corpus.suffixRankRewrite(
          Tables.documents(s, d).filter(col("doc_id") % 4 === 0),
          "doc_id", "text", minLen = 30)
        .orderBy(col("doc_id"))
    }),

    // duplication-attribution edges (NEW r16): for each duplicated
    // 30-char window class the globally-first occurrence is the
    // source; edges (src, dst, n_windows) = contamination forensics
    "q322_dup_attribution" -> ((s, d) => {
      Corpus.dupAttribution(
          Tables.documents(s, d).filter(col("doc_id") % 4 === 0),
          "doc_id", "text", minLen = 30, topK = 100)
        .orderBy(col("n_windows").desc, col("src_id"), col("dst_id"))
    }),

    // Stupid Backoff trigram LM scoring (NEW r17, Brants et al. 2007):
    // train on the even-id half, score every doc — held-out trigrams
    // exercise the backoff ladder; floor-nano terms sum as BIGINT
    "q323_stupid_backoff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Corpus.stupidBackoffScore(docs,
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // the 100 TB tier (NEW r17): gram keys ride as poly-hash BIGINTs
    // (8-byte shuffle keys, the q297b discipline); oracle replays the
    // same polynomial so a collision cannot split the gate
    "q323b_stupid_backoff_hashed" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Corpus.stupidBackoffScoreHashed(docs,
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // best-fit no-split packing (NEW r17, Ding et al. 2024 "Fewer
    // Truncations"): tightest-feasible-bin, (len DESC, id, piece)
    // order, per Knuth-hash shard; oracle replays the fold as a
    // recursive CTE step-for-step
    "q324_bestfit_pack" -> ((s, d) => {
      Corpus.packBestFit(Tables.documents(s, d), "doc_id", "text",
          budget = 64, shards = 16)
        .orderBy(col("doc_id"), col("piece"))
    }),

    // shard-level fill report over the same layout: bins opened vs the
    // ceil(mass/budget) lower bound, fill rate in floor basis points
    "q324b_bestfit_stats" -> ((s, d) => {
      Corpus.packBestFitStats(
          Corpus.packBestFit(Tables.documents(s, d), "doc_id", "text",
            budget = 64, shards = 16), budget = 64)
        .orderBy(col("shard"))
    }),

    // per-source operational report (NEW r8): doc counts, exact-dup
    // rate, token mass, mean length — the pre-mixing dashboard
    "q169_source_report" -> ((s, d) => {
      Corpus.sourceReport(Tables.documents(s, d), "doc_id", "text", "source")
        .orderBy(col("source"))
    }),

    // per-source unigram KL drift + entropy (NEW r8): the data-mixing
    // diagnostic — floor-nano per-term contributions summed as BIGINT,
    // so the doubles never meet a reduction order
    "q182_domain_drift" -> ((s, d) => {
      Corpus.domainDrift(Tables.documents(s, d), "text", "source")
        .orderBy(col("source"))
    }),

    // sequence-length bucketing / pad-efficiency report (NEW r8):
    // smallest power-of-two bucket per doc, clamped at 2048; all
    // integer arithmetic, CASE ladder shared with the oracle
    "q184_length_buckets" -> ((s, d) => {
      Corpus.lengthBuckets(Tables.documents(s, d), "text")
        .orderBy(col("bucket"))
    }),

    // per-source length quantiles via grouped mergeable histograms
    // (NEW r8): the distributed per-group quantile shape — per-shard
    // histograms add by (source, bucket), the walk runs on
    // |sources|×64 rows
    "q203_grouped_quantiles" -> ((s, d) => {
      val lens = Tables.documents(s, d)
        .select(col("source"),
          size(split(graft.ops.Dedup.normText(col("text")), " "))
            .cast("double").as("len"))
      val h = graft.ops.Sketches.histBuildBy(lens, "source", "len",
        lo = 0.0, hi = 1024.0, nBuckets = 64)
      graft.ops.Sketches.histQuantileBy(h, 0.0, 1024.0, 64,
          Seq(0.5, 0.9, 0.99))
        .orderBy(col("grp"), col("q"))
    }),

    // vocabulary diff between two snapshots (NEW r8): gained/lost/
    // shared terms, vocab Jaccard, gained-mass share — the crawl-over-
    // crawl change dashboard
    "q201_vocab_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Corpus.vocabDiff(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0), "text")
    }),

    // leakage-safe split (NEW r8): content-hashed assignment — the
    // gate output carries per-split doc/fingerprint counts AND the
    // cross-split leaked-fingerprint count, which the op guarantees 0
    "q187_split_safe" -> ((s, d) => {
      val split = Corpus.splitAssignSafe(Tables.documents(s, d), "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val withFp = split.withColumn("fp",
        md5(graft.ops.Dedup.normText(col("text"))))
      val leak = withFp.groupBy(col("fp"))
        .agg(countDistinct(col("split")).as("ns"))
        .agg(sum(when(col("ns") > 1, 1L).otherwise(0L)).as("leaked_fps"))
      withFp.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_fps"))
        .crossJoin(broadcast(leak))
        .orderBy(col("split"))
    }),

    // benchmark-example containment (asymmetric Jaccard): which eval
    // docs are >= 50% contained in some NON-benchmark training doc —
    // the direction q140's corpus-side overlap can't express
    "q140c_containment" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Corpus.containmentPairs(
          docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(97)) === 0),
          "doc_id", "text", n = 3, minContainment = 0.5)
        .orderBy(col("bench_id"), col("doc_id"))
    }),

    // per-benchmark-doc contamination verdicts with exact-dedup-first
    // baked in (the linear-scale path the 100x stress measured): rep
    // containment + fingerprint fan-back to every bench member
    "q140d_containment_verdicts" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Corpus.containmentVerdicts(
          docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(97)) === 0),
          "doc_id", "text", n = 3, minContainment = 0.5)
        .orderBy(col("bench_doc"))
    }),

    // perplexity filter: decile-bin docs by the q151 bigram-LM score
    // (CCNet-style quality buckets); keep = the 8 best deciles
    // SCALE NOTE (r10 window audit): the exact global ntile is the
    // GATE tier — at 100 TB a perplexity filter assigns deciles by
    // comparing against broadcast decile thresholds (the
    // Sketches.histBuild / Validate.quantileMapHist substrate), a
    // map-only plan; the exact global window stays here because the
    // oracle replays ntile semantics bit-for-bit.
    "q151b_perplexity_filter" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("avg_logprob").desc, col("doc_id").asc)
      Corpus.bigramLmScore(Tables.documents(s, d), "doc_id", "text")
        .withColumn("decile", ntile(10).over(w))
        .withColumn("keep", col("decile") <= 8)
        .orderBy(col("doc_id"))
    }),

    // histogram-threshold perplexity filter (NEW r10): the 100 TB
    // tier of q151b — the cut point comes from a mergeable histogram
    // of the score (one scan, 256 integer buckets) instead of a
    // global ntile sort; keep/drop is a map-only pass with a
    // broadcast scalar. Bucket-edge granularity (≤ one bucket width
    // conservatively over-kept) is the documented histogram contract
    "q151d_perplexity_filter_hist" -> ((s, d) => {
      val scored = Corpus.bigramLmScore(Tables.documents(s, d),
        "doc_id", "text")
      Corpus.thresholdKeepByHistogram(scored, "avg_logprob",
          lo = -15.0, hi = 0.0, nBuckets = 256, dropBp = 2000)
        .select(col("doc_id"), col("n_bigrams"), col("avg_logprob"),
          col("bucket"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // CCNet head/middle/tail quality tiers (NEW r10): perplexity
    // terciles from the SAME mergeable histogram substrate as q151d —
    // per-cut threshold buckets via integer cross-multiplies, tier
    // label as a map-only count of cleared cuts against a broadcast
    // sorted cut array. Wenzek et al. 2020 §4.3's corpus split
    "q151e_perplexity_tiers" -> ((s, d) => {
      val scored = Corpus.bigramLmScore(Tables.documents(s, d),
        "doc_id", "text")
      Corpus.tierByHistogram(scored, "avg_logprob",
          lo = -15.0, hi = 0.0, nBuckets = 256, cutsBp = Seq(3334, 6667))
        .select(col("doc_id"), col("avg_logprob"), col("bucket"),
          col("tier"))
        .orderBy(col("doc_id"))
    }),

    // interpolated Kneser-Ney bigram LM (absolute discount 0.75):
    // the canonical smoothing upgrade over q151's add-one; the lp
    // expression is ONE string parsed by both engines
    "q151c_kn_lm" -> ((s, d) => {
      Corpus.knBigramLmScore(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Okapi BM25 retrieval for a 4-term query — the serving-side
    // counterpart of q152's inverted index; per-term scores quantized
    // to basis points before the doc sum (association-order-free)
    "q152b_bm25_topk" -> ((s, d) => {
      Corpus.bm25TopK(Tables.documents(s, d), "doc_id", "text",
        queryTerms = Seq("spark", "merge", "window", "customer"), k = 20)
    }),

    // temperature-scaled mixture (tau = 2): targets derived from the
    // observed language distribution, flattened toward uniform
    "q156c_mixture_temperature" -> ((s, d) => {
      Corpus.mixtureTemperature(Tables.documents(s, d), "doc_id", "lang",
          tau = 2.0, budget = 150)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          max(round(col("target"), 6)).as("target"),
          max(round(col("rate"), 6)).as("rate"))
        .orderBy(col("lang"))
    }),

    // DSIR importance weights (Xie et al. 2023): target = the English
    // slice, source = the whole corpus; per-bucket log-likelihood
    // ratios rounded before the per-doc sum so both engines agree;
    // ranked on the ROUNDED weight, doc_id tiebreak
    "q156d_dsir_weights" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Corpus.dsirLogWeights(docs, docs.filter(col("lang") === "en"),
          "doc_id", "text", buckets = 256)
        .select(col("doc_id"), col("n_tokens"),
          round(col("logw"), 6).as("logw"))
        .orderBy(col("logw").desc, col("doc_id")).limit(50)
    }),

    // deterministic stratified train/val/test split: 80/10/10 by id
    // hash; gated on per-(lang, split) counts AND id sums, so a single
    // reassigned doc flips the hash
    "q143b_stratified_split" -> ((s, d) => {
      Corpus.splitAssign(Tables.documents(s, d), "doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"), col("split"))
    }),

    // trainable naive Bayes language-ID: train on the %3!=0 slice
    // (lang = class), predict the held-out third; all log terms
    // floor-quantized to micro-units at model build, so scoring is
    // integer argmax — association-order-free in both engines
    "q174_nb_langid" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pred = Corpus.naiveBayesPredict(
          docs.filter(col("doc_id") % 3 === 0),
          docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", "lang")
        .select(col("doc_id"), col("lang").as("pred"),
          col("score_micro"), col("n_known"))
      pred.join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("doc_id"), col("lang"), col("pred"),
          col("score_micro"), col("n_known"))
        .orderBy(col("doc_id"))
    }),

    // feature-hashed bag-of-words vectors: text → fixed-width
    // array<float> with no trained vocabulary; integer signed counts,
    // so the embedding is bit-identical across engines. Gated as the
    // q91 sig_str convention — the raw array<float> column crashes the
    // driver's pandas hasher (r8 red row), and the values are
    // integer-valued, so a cast-to-long comma join is deterministic
    "q176_hashed_bow" -> ((s, d) => {
      Corpus.hashedBowVectors(
          Tables.documents(s, d).filter(col("doc_id") % 25 === 0),
          "doc_id", "text", dim = 64)
        .select(col("doc_id"),
          array_join(transform(col("vec"),
            v => v.cast("long").cast("string")), ",").as("vec_str"),
          col("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // per-class precision/recall/F1 of the same model (NEW r8): the
    // full evaluation rollup — exact integer bp, F1 in closed form
    // 2tp/(n_pred + n_truth)
    "q194_classifier_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pred = Corpus.naiveBayesPredict(
          docs.filter(col("doc_id") % 3 === 0),
          docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", "lang")
        .select(col("doc_id"), col("lang").as("pred"))
      Corpus.classifierReport(pred,
          docs.select(col("doc_id"), col("lang")), "doc_id", "pred", "lang")
        .orderBy(col("cls"))
    }),

    // holdout accuracy rollup of the same model — the number a
    // pipeline actually gates deploys on
    "q174b_nb_accuracy" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pred = Corpus.naiveBayesPredict(
          docs.filter(col("doc_id") % 3 === 0),
          docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", "lang")
        .select(col("doc_id"), col("lang").as("pred"))
      pred.join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pred") === col("lang"), 1L).otherwise(0L)).as("n_correct"))
        .orderBy(col("lang"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q140_decontaminate" -> decontOracle,
    // the large-benchmark plan must produce the SAME rows: one oracle
    "q140b_decontaminate_large" -> decontOracle,

    "q141_redact_pii" ->
      s"""WITH t AS (SELECT doc_id,
         |  substr(text, 1, 40) || ' contact user' || doc_id || '@mail.example.org via 10.0.'
         |    || (doc_id % 250) || '.7 tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${Corpus.emailRe}')) AS INTEGER) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${Corpus.ipv4Re}')) AS INTEGER) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '${Corpus.phoneRe}')) AS INTEGER) AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '${Corpus.emailRe}', '<EMAIL>', 'g'),
         |    '${Corpus.ipv4Re}', '<IP>', 'g'),
         |    '${Corpus.phoneRe}', '<PHONE>', 'g') AS redacted
         |FROM t ORDER BY doc_id""".stripMargin,

    "q142_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, len(string_split($sqlNorm, ' ')) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
         |  FROM t)
         |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, start_off,
         |  CAST(start_off // 512 AS BIGINT) AS window_id,
         |  ((start_off + n_tokens - 1) // 512) <> (start_off // 512) AS spans_boundary
         |FROM c ORDER BY doc_id""".stripMargin,

    "q142b_pack_by_subword" ->
      s"""WITH RECURSIVE
         |${LlmQueries.sqlWordpieceCtes},
         |n AS (SELECT t.doc_id,
         |    CAST(coalesce(len(f.ids), 0) AS BIGINT) AS n_tokens
         |  FROM t LEFT JOIN flat f USING (doc_id)),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
         |  FROM n)
         |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, start_off,
         |  CAST(start_off // 512 AS BIGINT) AS window_id,
         |  ((start_off + n_tokens - 1) // 512) <> (start_off // 512) AS spans_boundary
         |FROM c ORDER BY doc_id""".stripMargin,

    "q143_sample_by_hash" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (doc_id * 2654435761) % 4294967296 < CAST(FLOOR(
        |  (CASE WHEN lang = 'zh' THEN 0.05 WHEN lang = 'es' THEN 0.5 ELSE 0.2 END) * 4294967296) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,

    "q144_tfidf" ->
      s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
         |tok AS (SELECT doc_id, unnest(string_split(s, ' ')) AS term FROM t),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok WHERE len(term) > 0 GROUP BY 1, 2),
         |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
         |sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
         |  ROUND(tf.tf * LN(n.n_docs * 1.0 / dfq.df), 4) AS score
         |  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN n)
         |SELECT doc_id,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS INTEGER) AS rnk,
         |  term, CAST(tf AS INTEGER) AS tf, CAST(df AS INTEGER) AS df, score
         |FROM sc QUALIFY rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "q145_semantic_dedup" ->
      s"""WITH ${sqlKmeansCtes(k = 23, iters = 2)},
         |af AS (SELECT vec_id, embedding, cl FROM (
         |  SELECT e.vec_id, e.embedding, c.cl,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${sqlDot("e", "embedding", "c", "c_vec")} DESC, c.cl ASC) AS rn
         |  FROM embeddings e, c2 c) s WHERE rn = 1)
         |SELECT l.vec_id AS a, r.vec_id AS b,
         |  ROUND(${sqlDot("l", "embedding", "r", "embedding")}, 6) AS cos
         |FROM af l JOIN af r ON l.cl = r.cl AND l.vec_id < r.vec_id
         |WHERE ROUND(${sqlDot("l", "embedding", "r", "embedding")}, 6) > 0.4
         |ORDER BY a, b""".stripMargin,

    // exact top-20 by full count; ok=1 restates the MG displacement
    // bound the Spark side must prove (cnt·capacity > n_tokens)
    "q146_heavy_hitters" ->
      s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
         |tok AS (SELECT unnest(string_split(s, ' ')) AS term FROM t),
         |f AS (SELECT term, COUNT(*) AS cnt FROM tok WHERE len(term) > 0 GROUP BY 1)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS INTEGER) AS rnk,
         |  term, cnt, CAST(1 AS INTEGER) AS ok
         |FROM f QUALIFY rnk <= 20 ORDER BY rnk""".stripMargin,

    "q148_boilerplate_strip" ->
      s"""WITH t AS (SELECT doc_id, string_split($sqlNorm, ' ') AS tk FROM documents),
         |tokpos AS (SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS ord FROM t),
         |chunks AS (SELECT doc_id, CAST((ord - 1) // 8 AS INTEGER) AS cidx,
         |    string_agg(tok, ' ' ORDER BY ord) AS chunk
         |  FROM tokpos GROUP BY doc_id, (ord - 1) // 8),
         |dfq AS (SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY 1),
         |fl AS (SELECT c.doc_id, c.cidx, c.chunk, d.nd >= 3 AS boiler
         |  FROM chunks c JOIN dfq d USING (chunk))
         |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_chunks,
         |  CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS INTEGER) AS n_boiler,
         |  COALESCE(string_agg(CASE WHEN NOT boiler THEN chunk END, ' ' ORDER BY cidx), '') AS clean_text
         |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // rn = 1 restates the argmin-struct first occurrence: min (doc_id,
    // cidx) per chunk corpus-wide
    "q221_line_dedup_keep_first" ->
      s"""WITH t AS (SELECT doc_id, string_split($sqlNorm, ' ') AS tk FROM documents),
         |tokpos AS (SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS ord FROM t),
         |chunks AS (SELECT doc_id, CAST((ord - 1) // 8 AS INTEGER) AS cidx,
         |    string_agg(tok, ' ' ORDER BY ord) AS chunk
         |  FROM tokpos GROUP BY doc_id, (ord - 1) // 8),
         |fl AS (SELECT doc_id, cidx, chunk,
         |    ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, cidx) AS rn
         |  FROM chunks)
         |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_chunks,
         |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS INTEGER) AS n_removed,
         |  COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY cidx), '') AS text_dedup
         |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q147_bottomk_sample" ->
      """WITH h AS (SELECT doc_id, lang,
        |  (doc_id * 2654435761) % 4294967296 AS bucket FROM documents)
        |SELECT lang, doc_id, bucket,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS INTEGER) AS rnk
        |FROM h QUALIFY rnk <= 5 ORDER BY lang, rnk""".stripMargin,

    "q151_bigram_lm" ->
      s"""WITH t AS (SELECT doc_id, string_split($sqlNorm, ' ') AS tk FROM documents),
         |tokpos AS (SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk, 1) AS p FROM t),
         |c1 AS (SELECT w, COUNT(*) AS c1 FROM tokpos WHERE len(w) > 0 GROUP BY 1),
         |v AS (SELECT COUNT(DISTINCT w) AS v FROM tokpos WHERE len(w) > 0),
         |bg AS (SELECT a.doc_id, a.w AS w1, b.w AS w2 FROM tokpos a
         |  JOIN tokpos b ON a.doc_id = b.doc_id AND b.p = a.p + 1),
         |c2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
         |sc AS (SELECT bg.doc_id, LN((c2.c12 + 1.0) / (c1.c1 + v.v)) AS lp
         |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 ON bg.w1 = c1.w CROSS JOIN v)
         |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
         |  ROUND(AVG(lp), 4) AS avg_logprob
         |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q151c_kn_lm" ->
      s"""WITH t AS (SELECT doc_id, string_split($sqlNorm, ' ') AS tk FROM documents),
         |tokpos AS (SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk, 1) AS p FROM t),
         |bg AS (SELECT a.doc_id, a.w AS w1, b.w AS w2 FROM tokpos a
         |  JOIN tokpos b ON a.doc_id = b.doc_id AND b.p = a.p + 1),
         |ctx AS (SELECT w1, COUNT(*) AS c1, COUNT(DISTINCT w2) AS n1f FROM bg GROUP BY 1),
         |c2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
         |bw AS (SELECT w2, COUNT(*) AS n1b FROM c2 GROUP BY 1),
         |ty AS (SELECT COUNT(*) AS dd FROM c2),
         |sc AS (SELECT bg.doc_id, ${graft.ops.Corpus.knLpExpr(0.75)} AS lp
         |  FROM bg JOIN c2 USING (w1, w2) JOIN ctx USING (w1)
         |  JOIN bw USING (w2) CROSS JOIN ty)
         |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
         |  ROUND(AVG(lp), 4) AS avg_logprob
         |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "q152_inverted_index" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split($sqlNorm, ' ')) AS term FROM documents),
         |tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM t WHERE len(term) > 0 GROUP BY 1, 2)
         |SELECT term, CAST(COUNT(*) AS INTEGER) AS df, CAST(SUM(tf) AS BIGINT) AS tf_total,
         |  array_to_string(list(doc_id ORDER BY doc_id)[1:10], ',') AS postings
         |FROM tf GROUP BY term ORDER BY term""".stripMargin,

    "q153_pmi" ->
      s"""WITH dt0 AS (SELECT DISTINCT doc_id, term FROM
         |  (SELECT doc_id, unnest(string_split($sqlNorm, ' ')) AS term FROM documents) WHERE len(term) > 0),
         |top AS (SELECT term, COUNT(*) AS n FROM dt0 GROUP BY 1 ORDER BY n DESC, term ASC LIMIT 30),
         |dt AS (SELECT dt0.doc_id, dt0.term, top.n FROM dt0 JOIN top USING (term)),
         |nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
         |pr AS (SELECT x.term AS term_a, y.term AS term_b, COUNT(*) AS n_ab,
         |    ANY_VALUE(x.n) AS n_a, ANY_VALUE(y.n) AS n_b
         |  FROM dt x JOIN dt y ON x.doc_id = y.doc_id AND x.term < y.term GROUP BY 1, 2)
         |SELECT term_a, term_b, n_ab, ROUND(LN(n_ab * 1.0 * nd.n_docs / (n_a * n_b)), 4) AS pmi
         |FROM pr, nd WHERE n_ab >= 5 ORDER BY term_a, term_b""".stripMargin,

    // pair multiset == Spark's map-side generation: the self-join on
    // (doc, 0 < y.p - x.p <= w) enumerates exactly the ordered (i, j)
    // pairs the flatten/transform expression emits, then canonicalizes
    // least/greatest; normalizers (n_tok, n_pair) precede the cuts;
    // PMI via the shared cooccPmiExpr spelling
    "q282_coocc_pmi" ->
      s"""WITH t AS (SELECT doc_id, string_split($sqlNorm, ' ') AS tk FROM documents),
         |tokpos AS (SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS p FROM t),
         |tp AS (SELECT doc_id, tok, p FROM tokpos WHERE len(tok) > 0),
         |pr AS (SELECT least(x.tok, y.tok) AS a, greatest(x.tok, y.tok) AS b,
         |    COUNT(*) AS c_ab
         |  FROM tp x JOIN tp y ON x.doc_id = y.doc_id
         |    AND y.p > x.p AND y.p <= x.p + 3 AND x.tok <> y.tok
         |  GROUP BY 1, 2),
         |np AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_pair FROM pr),
         |uni AS (SELECT tok, COUNT(*) AS c FROM tp GROUP BY 1),
         |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM uni),
         |v AS (SELECT tok, c FROM uni WHERE c >= 20)
         |SELECT pr.a AS term_a, pr.b AS term_b, pr.c_ab,
         |  va.c AS c_a, vb.c AS c_b,
         |  ${graft.ops.Corpus.cooccPmiExpr("pr.c_ab", "va.c", "vb.c",
              "nt.n_tok", "np.n_pair")} AS pmi
         |FROM pr JOIN v va ON pr.a = va.tok JOIN v vb ON pr.b = vb.tok,
         |  nt, np
         |WHERE pr.c_ab >= 5 ORDER BY term_a, term_b""".stripMargin,

    "q169_source_report" ->
      s"""WITH base AS (SELECT source, md5($sqlNorm) AS fp,
         |    CAST(LEN(string_split($sqlNorm, ' ')) AS BIGINT) AS n_toks
         |  FROM documents),
         |d AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS token_mass
         |  FROM base GROUP BY source),
         |u AS (SELECT source, COUNT(*) AS n_distinct
         |  FROM (SELECT DISTINCT source, fp FROM base) GROUP BY source)
         |SELECT d.source, n_docs, n_distinct, token_mass,
         |  CAST(FLOOR((n_docs - n_distinct) * 10000 / n_docs) AS BIGINT) AS dup_bp,
         |  CAST(FLOOR(token_mass * 100 / n_docs) AS BIGINT) AS mean_toks_c
         |FROM d JOIN u USING (source) ORDER BY source""".stripMargin,

    "q182_domain_drift" ->
      s"""WITH d AS (SELECT source, $sqlNorm AS s FROM documents),
         |tokall AS (SELECT source, unnest(string_split(s, ' ')) AS term FROM d),
         |tok AS (SELECT source, term FROM tokall WHERE length(term) > 0),
         |st AS (SELECT source, term, COUNT(*) AS c_st FROM tok GROUP BY 1, 2),
         |stot AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s
         |  FROM st GROUP BY source),
         |ttot AS (SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_t
         |  FROM st GROUP BY term),
         |nall AS (SELECT CAST(SUM(c_st) AS BIGINT) AS n_all FROM st),
         |terms AS (SELECT st.source,
         |    ${graft.ops.Corpus.driftKlTermExpr} AS kl_nano_t,
         |    ${graft.ops.Corpus.driftEntTermExpr} AS ent_nano_t
         |  FROM st JOIN stot USING (source) JOIN ttot USING (term)
         |  CROSS JOIN nall),
         |agg AS (SELECT source, COUNT(*) AS n_terms,
         |    CAST(SUM(kl_nano_t) AS BIGINT) AS kl_nano,
         |    CAST(SUM(ent_nano_t) AS BIGINT) AS entropy_nano
         |  FROM terms GROUP BY source)
         |SELECT a.source, s.n_s AS n_tokens, a.n_terms, a.kl_nano,
         |  a.entropy_nano
         |FROM agg a JOIN stot s USING (source) ORDER BY a.source""".stripMargin,

    "q184_length_buckets" ->
      s"""WITH n0 AS (SELECT CAST(LEN(string_split($sqlNorm, ' ')) AS BIGINT) AS n
         |  FROM documents),
         |k AS (SELECT LEAST(n, 2048) AS kept FROM n0),
         |b AS (SELECT ${graft.ops.Corpus.lengthBucketExpr(
               Seq(16, 32, 64, 128, 256, 512, 1024, 2048))} AS bucket, kept
         |  FROM k)
         |SELECT bucket, COUNT(*) AS n_docs,
         |  CAST(SUM(kept) AS BIGINT) AS kept_tokens,
         |  CAST(SUM(bucket - kept) AS BIGINT) AS pad_tokens,
         |  (10000 * CAST(SUM(bucket - kept) AS BIGINT)) // (COUNT(*) * bucket)
         |    AS pad_bp
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q203_grouped_quantiles" -> {
      import graft.ops.Sketches
      val (lo, hi, nb) = (0.0, 1024.0, 64)
      s"""WITH vals AS (SELECT source,
         |    CAST(LEN(string_split($sqlNorm, ' ')) AS DOUBLE) AS v
         |  FROM documents),
         |h AS (SELECT source AS grp,
         |    ${Sketches.histBucketExpr(lo, hi, nb)} AS bucket,
         |    COUNT(*) AS cnt FROM vals GROUP BY 1, 2),
         |c AS (SELECT grp, bucket, cnt,
         |    CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY bucket
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cume,
         |    CAST(SUM(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
         |  FROM h),
         |qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
         |    CAST(0.99 AS DOUBLE)]) AS q)
         |SELECT grp, q, n, ${Sketches.histEstExpr(lo, hi, nb)} AS est
         |FROM qs JOIN c
         |  ON cume >= CAST(CEIL(q * n) AS BIGINT)
         |  AND cume - cnt < CAST(CEIL(q * n) AS BIGINT)
         |ORDER BY grp, q""".stripMargin
    },

    "q201_vocab_diff" ->
      s"""WITH od AS (SELECT $sqlNorm AS s FROM documents WHERE doc_id % 2 = 0),
         |nd AS (SELECT $sqlNorm AS s FROM documents WHERE doc_id % 2 != 0),
         |ot AS (SELECT term, COUNT(*) AS c_old FROM (
         |  SELECT unnest(string_split(s, ' ')) AS term FROM od)
         |  WHERE length(term) > 0 GROUP BY term),
         |nt AS (SELECT term, COUNT(*) AS c_new FROM (
         |  SELECT unnest(string_split(s, ' ')) AS term FROM nd)
         |  WHERE length(term) > 0 GROUP BY term),
         |j AS (SELECT ot.c_old, nt.c_new
         |  FROM ot FULL JOIN nt ON ot.term = nt.term),
         |a AS (SELECT
         |  CAST(SUM(CASE WHEN c_old IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_terms_old,
         |  CAST(SUM(CASE WHEN c_new IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_terms_new,
         |  CAST(SUM(CASE WHEN c_old IS NOT NULL AND c_new IS NOT NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST(SUM(CASE WHEN c_old IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_gained,
         |  CAST(SUM(CASE WHEN c_new IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_lost,
         |  CAST(SUM(COALESCE(c_old, 0)) AS BIGINT) AS mass_old,
         |  CAST(SUM(COALESCE(c_new, 0)) AS BIGINT) AS mass_new,
         |  CAST(SUM(CASE WHEN c_old IS NULL THEN COALESCE(c_new, 0)
         |    ELSE 0 END) AS BIGINT) AS gained_mass
         |  FROM j)
         |SELECT *,
         |  (10000 * n_shared) // (n_terms_old + n_terms_new - n_shared)
         |    AS vocab_jaccard_bp,
         |  (10000 * gained_mass) // mass_new AS gained_mass_bp
         |FROM a""".stripMargin,

    // per-source rank over (knuth-hash, id) — the oracle's one window
    // per source replays the op's two-phase chunked rank exactly
    // because chunk index is monotone in the hash
    "q276_curriculum_interleave" ->
      """WITH w AS (SELECT 'src' || CAST(i AS VARCHAR) AS source,
        |    CAST(1 + i % 4 AS BIGINT) AS wt FROM range(0, 20) t(i)),
        |b AS (SELECT doc_id, source,
        |    (doc_id % 4294967296) * 2654435761 % 4294967296 AS hb
        |  FROM documents),
        |r AS (SELECT doc_id, source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY hb, doc_id)
        |      AS BIGINT) AS rn
        |  FROM b),
        |v AS (SELECT r.doc_id, r.source, r.rn,
        |    (r.rn * 1000000) // w.wt AS vt_micro
        |  FROM r JOIN w USING (source))
        |SELECT doc_id, source, rn, vt_micro FROM v
        |ORDER BY vt_micro, source, rn LIMIT 200""".stripMargin,

    "q187_split_safe" -> {
      val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val thr = graft.ops.Corpus.splitThresholds(fracs)
      s"""WITH d AS (SELECT doc_id, $sqlNorm AS s FROM documents),
         |h AS (SELECT doc_id, s,
         |    (${sqlPoly("s")} * 2654435761) % 4294967296 AS bucket FROM d),
         |a AS (SELECT doc_id, md5(s) AS fp,
         |    CASE WHEN bucket < ${thr(0)} THEN 'train'
         |         WHEN bucket < ${thr(1)} THEN 'val'
         |         ELSE 'test' END AS split FROM h),
         |leak AS (SELECT CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS leaked_fps
         |  FROM (SELECT fp, COUNT(DISTINCT split) AS ns FROM a GROUP BY fp)),
         |g AS (SELECT split, COUNT(*) AS n_docs,
         |    CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fps FROM a GROUP BY split)
         |SELECT split, n_docs, n_fps, leaked_fps FROM g CROSS JOIN leak
         |ORDER BY split""".stripMargin
    },

    "q161_prepare_corpus" ->
      s"""WITH t AS (SELECT doc_id, lang, $sqlNorm AS s FROM documents),
         |base AS (SELECT doc_id, lang,
         |    len(string_split(s, ' ')) AS n_tokens, md5(s) AS fp FROM t),
         |tk AS (SELECT doc_id, string_split(s, ' ') AS toks FROM t),
         |grams AS (SELECT doc_id, unnest(list_distinct(
         |    [concat_ws(' ', toks[i], toks[i+1], toks[i+2]) for i in range(1, len(toks) - 1)])) AS gram
         |  FROM tk),
         |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
         |cont AS (SELECT DISTINCT g.doc_id FROM grams g JOIN bench b USING (gram)),
         |reps AS (SELECT fp, MIN(doc_id) AS keep_id FROM base GROUP BY fp),
         |staged AS (SELECT b.doc_id, b.lang, b.n_tokens,
         |    CASE WHEN b.n_tokens < 40 THEN 'low_quality'
         |         WHEN c.doc_id IS NOT NULL THEN 'contaminated'
         |         WHEN b.doc_id <> r.keep_id THEN 'duplicate' END AS fail
         |  FROM base b LEFT JOIN cont c ON b.doc_id = c.doc_id
         |  JOIN reps r USING (fp)),
         |rates AS (SELECT lang, LEAST(1.0, 250.0 *
         |    (CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.3
         |     WHEN 'zh' THEN 0.2 ELSE 0.0 END) / COUNT(*)) AS rate
         |  FROM staged WHERE fail IS NULL GROUP BY lang),
         |fin AS (SELECT s.doc_id, s.lang, s.n_tokens,
         |    COALESCE(s.fail, CASE WHEN (s.doc_id * 2654435761) % 4294967296
         |        < CAST(FLOOR(COALESCE(r.rate, 0.0) * 4294967296) AS BIGINT)
         |      THEN 'kept' ELSE 'sampled_out' END) AS reason
         |  FROM staged s LEFT JOIN rates r USING (lang))
         |SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens,
         |  CAST(CASE WHEN reason = 'kept' THEN 1 ELSE 0 END AS INTEGER) AS keep,
         |  reason
         |FROM fin ORDER BY doc_id""".stripMargin,

    // chunk i covers tokens [i*48+1, min(i*48+64, n)] 1-based; count =
    // 1 + ceil(max(n-64,0)/48) — the last chunk reaches the end
    "q160_chunk_documents" ->
      s"""WITH t AS (SELECT doc_id, string_split($sqlNorm, ' ') AS tk FROM documents),
         |c AS (SELECT doc_id, tk, len(tk) AS n,
         |    1 + CAST(CEIL(GREATEST(len(tk) - 64, 0) * 1.0 / 48) AS INTEGER) AS n_chunks
         |  FROM t),
         |ix AS (SELECT doc_id, tk, n,
         |    unnest([i for i in range(0, n_chunks)]) AS i FROM c),
         |x AS (SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         |    array_to_string(tk[i * 48 + 1 : LEAST(i * 48 + 64, n)], ' ') AS chunk
         |  FROM ix)
         |SELECT doc_id, chunk_idx,
         |  CAST(len(string_split(chunk, ' ')) AS INTEGER) AS n_chunk_tokens, chunk
         |FROM x ORDER BY doc_id, chunk_idx""".stripMargin,

    "q159_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |    len(string_split($sqlNorm, ' ')) AS w FROM documents),
         |k AS (SELECT doc_id, lang,
         |    -LN((((doc_id * 2654435761) % 4294967296) + 1) / 4294967297.0)
         |      / w AS es_key
         |  FROM t WHERE w > 0),
         |r AS (SELECT lang, doc_id, es_key,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY es_key, doc_id) AS INTEGER) AS rnk
         |  FROM k)
         |SELECT lang, rnk, doc_id, ROUND(es_key, 6) AS es_key
         |FROM r WHERE rnk <= 3 ORDER BY lang, rnk""".stripMargin,

    // replay of Corpus.qualityClassifierScore: same polynomial token
    // hash (HashSpec.polyHash via list_reduce), same weight remix, and
    // an in-order fold for the sum so the IEEE result is bit-identical
    "q155_quality_classifier" ->
      s"""WITH t AS (SELECT doc_id,
         |    list_filter(string_split($sqlNorm, ' '), x -> len(x) > 0) AS tk
         |  FROM documents),
         |s AS (SELECT doc_id, len(tk) AS n_tokens,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(tk, x ->
         |      ((list_reduce(list_prepend(CAST(7 AS BIGINT),
         |          list_transform(string_split(x, ''), c -> CAST(ascii(c) AS BIGINT))),
         |          (a, y) -> (a * 31 + y) % 1000000007)
         |        * 2654435761) % 1000000007) / 1000000007.0 - 0.5)),
         |      (a, w) -> a + w) AS ws
         |  FROM t)
         |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
         |  CASE WHEN n_tokens = 0 THEN 0.0
         |       ELSE ROUND(4.0 * ws / n_tokens, 6) END AS score,
         |  CASE WHEN n_tokens = 0 THEN FALSE
         |       ELSE (4.0 * ws / n_tokens) > 0 END AS keep
         |FROM s ORDER BY doc_id""".stripMargin,

    // the same scrambled poly hash + the SAME esPriorityExpr spelling
    // as the Spark op (one generator, two engines — the PSI pattern)
    "q226_weighted_sample" -> {
      val h = graft.ops.Sketches.kmvScrambleSql(
        graft.ops.Sketches.polyHashSql("CAST(doc_id AS VARCHAR)"))
      s"""WITH t AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         |    $h AS h
         |  FROM documents WHERE n_chars > 0 AND doc_id IS NOT NULL)
         |SELECT doc_id, w,
         |  ${graft.ops.Corpus.esPriorityExpr("h", "w")} AS priority_nano
         |FROM t ORDER BY priority_nano, doc_id LIMIT 100""".stripMargin
    },

    "q226b_weighted_sample_by" -> {
      val h = graft.ops.Sketches.kmvScrambleSql(
        graft.ops.Sketches.polyHashSql("CAST(doc_id AS VARCHAR)"))
      s"""WITH t AS (SELECT lang AS grp, doc_id,
         |    CAST(n_chars AS BIGINT) AS w, $h AS h
         |  FROM documents
         |  WHERE n_chars > 0 AND doc_id IS NOT NULL AND lang IS NOT NULL),
         |pr AS (SELECT grp, doc_id, w,
         |    ${graft.ops.Corpus.esPriorityExpr("h", "w")} AS priority_nano
         |  FROM t),
         |rk AS (SELECT grp, doc_id, w, priority_nano,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY grp
         |      ORDER BY priority_nano, doc_id) AS INTEGER) AS rk
         |  FROM pr)
         |SELECT grp, doc_id, w, priority_nano, rk FROM rk
         |WHERE rk <= 30 ORDER BY grp, rk""".stripMargin
    },

    "q156_mixture_resample" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_stratum FROM documents GROUP BY lang),
        |r AS (SELECT lang, n_stratum, LEAST(1.0,
        |    300.0 * (CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.3
        |             WHEN 'zh' THEN 0.2 ELSE 0.0 END) / n_stratum) AS rate
        |  FROM c),
        |k AS (SELECT d.lang FROM documents d JOIN r USING (lang)
        |  WHERE (d.doc_id * 2654435761) % 4294967296
        |    < CAST(FLOOR(r.rate * 4294967296) AS BIGINT))
        |SELECT k.lang, COUNT(*) AS n_kept,
        |  ROUND(ANY_VALUE(r.rate), 6) AS rate,
        |  CAST(ANY_VALUE(r.n_stratum) AS BIGINT) AS n_stratum
        |FROM k JOIN r USING (lang) GROUP BY k.lang ORDER BY k.lang""".stripMargin,

    // replication via a static range(0,64) cross join + width filter:
    // DuckDB 1.0's binder hits an INTERNAL error when an unnest-aliased
    // column is referenced from an outer WHERE, and its range() table
    // function rejects lateral (correlated) bounds — the 64-copy cap is
    // fixture-safe (max rate here is es at 4.11)
    "q156e_mixture_upsample" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_stratum FROM documents GROUP BY lang),
        |r AS (SELECT lang,
        |    CAST(600 AS DOUBLE) * (CASE lang WHEN 'en' THEN 0.2
        |      WHEN 'es' THEN 0.5 WHEN 'zh' THEN 0.3 ELSE 0.0 END)
        |      / n_stratum AS rate
        |  FROM c),
        |e AS (SELECT d.doc_id, d.lang, r.rate, t.copy
        |  FROM documents d JOIN r USING (lang) CROSS JOIN range(0, 64) t(copy)
        |  WHERE t.copy < CAST(GREATEST(CEIL(r.rate), 1) AS BIGINT))
        |SELECT doc_id, lang, CAST(copy AS BIGINT) AS copy FROM e
        |WHERE copy < CAST(FLOOR(rate) AS BIGINT)
        |   OR (copy = CAST(FLOOR(rate) AS BIGINT)
        |       AND (doc_id * 2654435761) % 4294967296
        |         < CAST(FLOOR((rate - FLOOR(rate)) * 4294967296) AS BIGINT))
        |ORDER BY doc_id, copy""".stripMargin,

    "q156b_mixture_by_tokens" ->
      s"""WITH RECURSIVE
         |${LlmQueries.sqlWordpieceCtes},
         |n AS (SELECT t.doc_id,
         |    CAST(coalesce(len(f.ids), 0) AS INTEGER) AS n_tokens
         |  FROM t LEFT JOIN flat f USING (doc_id)),
         |dl AS (SELECT n.doc_id, d.lang, n.n_tokens
         |  FROM n JOIN documents d USING (doc_id)),
         |r AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS tok_stratum,
         |    LEAST(1.0, 25000.0 * (CASE lang WHEN 'en' THEN 0.5
         |      WHEN 'es' THEN 0.3 WHEN 'zh' THEN 0.2 ELSE 0.0 END)
         |      / SUM(n_tokens)) AS rate
         |  FROM dl GROUP BY lang),
         |k AS (SELECT dl.lang, dl.n_tokens FROM dl JOIN r USING (lang)
         |  WHERE (dl.doc_id * 2654435761) % 4294967296
         |    < CAST(FLOOR(r.rate * 4294967296) AS BIGINT))
         |SELECT k.lang, COUNT(*) AS n_kept,
         |  CAST(SUM(k.n_tokens) AS BIGINT) AS kept_tokens,
         |  ROUND(ANY_VALUE(r.rate), 6) AS rate,
         |  ANY_VALUE(r.tok_stratum) AS tok_stratum
         |FROM k JOIN r USING (lang) GROUP BY k.lang ORDER BY k.lang""".stripMargin,

    "q157_vocab_stats" ->
      s"""WITH tok AS (SELECT unnest(string_split($sqlNorm, ' ')) AS term FROM documents),
         |f AS (SELECT term, COUNT(*) AS f FROM tok WHERE len(term) > 0 GROUP BY term),
         |tot AS (SELECT COUNT(*) AS n_tokens FROM tok WHERE len(term) > 0),
         |b AS (SELECT CAST(CASE WHEN f <= 10 THEN f ELSE 11 END AS INTEGER) AS bucket,
         |    COUNT(*) AS n_terms, CAST(SUM(f) AS BIGINT) AS n_occurrences
         |  FROM f GROUP BY 1)
         |SELECT bucket, n_terms, n_occurrences,
         |  ROUND(n_occurrences * 1.0 / n_tokens, 6) AS mass_frac
         |FROM b, tot ORDER BY bucket""".stripMargin,

    "q157b_zipf_slope" ->
      s"""WITH tok AS (SELECT unnest(string_split($sqlNorm, ' ')) AS term FROM documents),
         |f AS (SELECT term, COUNT(*) AS f FROM tok WHERE len(term) > 0 GROUP BY term),
         |top AS (SELECT term, f FROM f ORDER BY f DESC, term ASC LIMIT 200),
         |r AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, term ASC) AS r FROM top)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         |  ROUND(REGR_SLOPE(LN(f), LN(r)), 4) AS zipf_slope
         |FROM r""".stripMargin,

    "q158_shard_manifest" ->
      s"""WITH t AS (SELECT doc_id,
         |    ((doc_id * 2654435761) % 4294967296) % 8 AS shard,
         |    len(list_filter(string_split($sqlNorm, ' '), x -> len(x) > 0)) AS n_tokens
         |  FROM documents)
         |SELECT shard, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM t GROUP BY shard ORDER BY shard""".stripMargin,

    "q154_dup_spans" ->
      s"""WITH t AS (SELECT doc_id, string_split($sqlNorm, ' ') AS tk FROM documents),
         |w0 AS (SELECT doc_id, [array_to_string(tk[i:i+4], ' ')
         |    for i in range(1, greatest(len(tk) - 4, 0) + 1)] AS wins FROM t),
         |w AS (SELECT doc_id, unnest(wins) AS win, generate_subscripts(wins, 1) AS p FROM w0),
         |wd AS (SELECT win FROM w GROUP BY win HAVING COUNT(DISTINCT doc_id) > 1),
         |dup AS (SELECT w.doc_id, w.p FROM w JOIN wd USING (win)),
         |runs AS (SELECT doc_id, p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS isl FROM dup),
         |agg AS (SELECT doc_id, isl, COUNT(*) AS run FROM runs GROUP BY 1, 2),
         |per AS (SELECT doc_id, CAST(SUM(run) AS INTEGER) AS n_dup,
         |  CAST(MAX(run) AS INTEGER) AS max_run FROM agg GROUP BY 1),
         |tot AS (SELECT doc_id, CAST(GREATEST(len(tk) - 4, 0) AS INTEGER) AS n_windows FROM t)
         |SELECT tot.doc_id, n_windows, COALESCE(n_dup, 0) AS n_dup, COALESCE(max_run, 0) AS max_run
         |FROM tot LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q154b_dedup_substrings" ->
      s"""WITH t AS (SELECT doc_id, string_split($sqlNorm, ' ') AS tk FROM documents),
         |w0 AS (SELECT doc_id, [array_to_string(tk[i:i+4], ' ')
         |    for i in range(1, greatest(len(tk) - 4, 0) + 1)] AS wins FROM t),
         |w AS (SELECT doc_id, unnest(wins) AS win, generate_subscripts(wins, 1) AS p FROM w0),
         |w2 AS (SELECT doc_id, p,
         |    ROW_NUMBER() OVER (PARTITION BY win ORDER BY doc_id, p) AS rn,
         |    COUNT(*) OVER (PARTITION BY win) AS cnt FROM w),
         |marked AS (SELECT doc_id, p FROM w2 WHERE cnt > 1 AND rn > 1),
         |cover AS (SELECT DISTINCT doc_id, unnest([p + i for i in range(0, 5)]) AS tp FROM marked),
         |tokens AS (SELECT doc_id, unnest(tk) AS tok, generate_subscripts(tk, 1) AS tp FROM t),
         |kept AS (SELECT k.doc_id, k.tp, k.tok FROM tokens k LEFT JOIN cover c
         |  ON k.doc_id = c.doc_id AND k.tp = c.tp WHERE c.doc_id IS NULL),
         |reb AS (SELECT doc_id, COUNT(*) AS n_kept,
         |  string_agg(tok, ' ' ORDER BY tp) AS text_dedup FROM kept GROUP BY 1),
         |tot AS (SELECT doc_id, len(tk) AS n_toks FROM t)
         |SELECT tot.doc_id, CAST(n_toks AS INTEGER) AS n_toks,
         |  CAST(n_toks - COALESCE(n_kept, 0) AS INTEGER) AS n_removed,
         |  COALESCE(text_dedup, '') AS text_dedup
         |FROM tot LEFT JOIN reb USING (doc_id) ORDER BY tot.doc_id""".stripMargin,

    // the oracle sorts/censuses the fixture's substrings DIRECTLY
    // (bounded corpus): every 30-char window with corpus-wide count
    // >= 2, merged by gaps-and-islands — the Spark side must produce
    // the identical spans from rank classes alone
    "q321_suffix_spans" ->
      s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents
         |  WHERE doc_id % 4 = 0),
         |pos AS (SELECT doc_id, i, substr(s, CAST(i AS INTEGER), 30) AS w
         |  FROM t CROSS JOIN (SELECT unnest(range(1,
         |    CAST(COALESCE((SELECT MAX(LENGTH(s)) FROM t), 0) AS BIGINT)
         |    + 1)) AS i) r
         |  WHERE i + 30 - 1 <= LENGTH(s)),
         |dupw AS (SELECT w FROM pos GROUP BY w HAVING COUNT(*) >= 2),
         |dup AS (SELECT doc_id, i FROM pos
         |  WHERE w IN (SELECT w FROM dupw)),
         |isl AS (SELECT doc_id, i,
         |    i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS g
         |  FROM dup)
         |SELECT doc_id, CAST(MIN(i) AS BIGINT) AS span_start,
         |  CAST(MAX(i) + 29 AS BIGINT) AS span_end,
         |  CAST(MAX(i) - MIN(i) + 30 AS BIGINT) AS span_len,
         |  COUNT(*) AS n_windows
         |FROM isl GROUP BY doc_id, g
         |ORDER BY doc_id, span_start""".stripMargin,

    // first-occurrence rule replayed as ROW_NUMBER over (doc_id, i)
    // per window value — identical to Spark's min(struct(id, p))
    "q321b_suffix_rewrite" ->
      s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents
         |  WHERE doc_id % 4 = 0),
         |r AS (SELECT unnest(range(1,
         |    CAST(COALESCE((SELECT MAX(LENGTH(s)) FROM t), 0) AS BIGINT)
         |    + 1)) AS i),
         |pos AS (SELECT doc_id, i, substr(s, CAST(i AS INTEGER), 30) AS w
         |  FROM t CROSS JOIN r WHERE i + 29 <= LENGTH(s)),
         |w2 AS (SELECT doc_id, i,
         |    ROW_NUMBER() OVER (PARTITION BY w ORDER BY doc_id, i) AS rn,
         |    COUNT(*) OVER (PARTITION BY w) AS cnt FROM pos),
         |marked AS (SELECT doc_id, i FROM w2 WHERE cnt > 1 AND rn > 1),
         |cover AS (SELECT DISTINCT doc_id,
         |    unnest([i + k for k in range(0, 30)]) AS cp FROM marked),
         |chars AS (SELECT doc_id, i AS cp,
         |    substr(s, CAST(i AS INTEGER), 1) AS ch
         |  FROM t CROSS JOIN r WHERE i <= LENGTH(s)),
         |kept AS (SELECT c.doc_id, c.cp, c.ch FROM chars c
         |  LEFT JOIN cover v ON c.doc_id = v.doc_id AND c.cp = v.cp
         |  WHERE v.doc_id IS NULL),
         |reb AS (SELECT doc_id, COUNT(*) AS n_kept,
         |  string_agg(ch, '' ORDER BY cp) AS text_dedup
         |  FROM kept GROUP BY 1),
         |tot AS (SELECT doc_id, CAST(LENGTH(s) AS BIGINT) AS n_chars
         |  FROM t)
         |SELECT tot.doc_id, n_chars,
         |  CAST(n_chars - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
         |  COALESCE(text_dedup, '') AS text_dedup
         |FROM tot LEFT JOIN reb USING (doc_id)
         |ORDER BY tot.doc_id""".stripMargin,

    // first occurrence per window value = FIRST_VALUE over the same
    // (doc_id, i) total order Spark's min(struct(id, p)) encodes
    "q322_dup_attribution" ->
      s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents
         |  WHERE doc_id % 4 = 0),
         |r AS (SELECT unnest(range(1,
         |    CAST(COALESCE((SELECT MAX(LENGTH(s)) FROM t), 0) AS BIGINT)
         |    + 1)) AS i),
         |pos AS (SELECT doc_id, i, substr(s, CAST(i AS INTEGER), 30) AS w
         |  FROM t CROSS JOIN r WHERE i + 29 <= LENGTH(s)),
         |w2 AS (SELECT doc_id, i, w,
         |    FIRST_VALUE(doc_id) OVER
         |      (PARTITION BY w ORDER BY doc_id, i) AS src_id,
         |    ROW_NUMBER() OVER
         |      (PARTITION BY w ORDER BY doc_id, i) AS rn,
         |    COUNT(*) OVER (PARTITION BY w) AS cnt FROM pos)
         |SELECT src_id, doc_id AS dst_id, COUNT(*) AS n_windows
         |FROM w2 WHERE cnt > 1 AND rn > 1
         |GROUP BY 1, 2
         |ORDER BY n_windows DESC, src_id, dst_id
         |LIMIT 100""".stripMargin,

    "q323_stupid_backoff" -> sbOracleSql(hashed = false),

    "q323b_stupid_backoff_hashed" -> sbOracleSql(hashed = true),

    "q324_bestfit_pack" ->
      s"""WITH RECURSIVE $sqlBestFitCtes
         |SELECT doc_id, piece, len, shard, bin FROM st WHERE step >= 1
         |ORDER BY doc_id, piece""".stripMargin,

    "q324b_bestfit_stats" ->
      s"""WITH RECURSIVE $sqlBestFitCtes,
         |asg AS (SELECT doc_id, piece, len, shard, bin FROM st WHERE step >= 1)
         |SELECT shard, COUNT(*) AS n_pieces, COUNT(DISTINCT bin) AS n_bins,
         |  CAST(SUM(len) AS BIGINT) AS tokens,
         |  CAST((SUM(len) + 63) // 64 AS BIGINT) AS lb_bins,
         |  CAST((10000 * SUM(len)) // (COUNT(DISTINCT bin) * 64) AS BIGINT) AS fill_bp
         |FROM asg GROUP BY shard ORDER BY shard""".stripMargin,

    "q140c_containment" ->
      s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
         |tk AS (SELECT doc_id, string_split(s, ' ') AS toks FROM t),
         |grams AS (SELECT doc_id, unnest(list_distinct(
         |    [concat_ws(' ', toks[i], toks[i+1], toks[i+2]) for i in range(1, len(toks) - 1)])) AS gram
         |  FROM tk),
         |bg AS (SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id % 97 = 0),
         |bsz AS (SELECT bench_id, COUNT(*) AS bench_grams FROM bg GROUP BY 1),
         |hits AS (SELECT g.doc_id, b.bench_id, COUNT(*) AS n_common
         |  FROM grams g JOIN bg b USING (gram) WHERE g.doc_id % 97 <> 0 GROUP BY 1, 2)
         |SELECT h.doc_id, h.bench_id, CAST(z.bench_grams AS INTEGER) AS bench_grams,
         |  CAST(h.n_common AS INTEGER) AS n_common,
         |  CAST(FLOOR(h.n_common * 10000.0 / z.bench_grams) AS BIGINT) AS containment_bp
         |FROM hits h JOIN bsz z USING (bench_id)
         |WHERE FLOOR(h.n_common * 10000.0 / z.bench_grams) >= 5000
         |ORDER BY bench_id, doc_id""".stripMargin,

    "q140d_containment_verdicts" ->
      s"""WITH f AS (SELECT doc_id, text, md5($sqlNorm) AS fp FROM documents),
         |cr AS (SELECT fp, MIN(doc_id) AS doc_id, ARG_MIN(text, doc_id) AS text
         |  FROM f WHERE doc_id % 97 <> 0 GROUP BY fp),
         |br AS (SELECT fp, MIN(doc_id) AS bench_id, ARG_MIN(text, doc_id) AS text
         |  FROM f WHERE doc_id % 97 = 0 GROUP BY fp),
         |cg AS (SELECT doc_id, unnest(list_distinct(
         |    [concat_ws(' ', toks[i], toks[i+1], toks[i+2]) for i in range(1, len(toks) - 1)])) AS gram
         |  FROM (SELECT doc_id, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS toks FROM cr)),
         |bgr AS (SELECT bench_id, unnest(list_distinct(
         |    [concat_ws(' ', toks[i], toks[i+1], toks[i+2]) for i in range(1, len(toks) - 1)])) AS gram
         |  FROM (SELECT bench_id, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS toks FROM br)),
         |bsz AS (SELECT bench_id, COUNT(*) AS bench_grams FROM bgr GROUP BY 1),
         |hits AS (SELECT g.doc_id, b.bench_id, COUNT(*) AS n_common
         |  FROM cg g JOIN bgr b USING (gram) GROUP BY 1, 2),
         |pairs AS (SELECT h.doc_id, h.bench_id, z.bench_grams, h.n_common,
         |    CAST(FLOOR(h.n_common * 10000.0 / z.bench_grams) AS BIGINT) AS containment_bp
         |  FROM hits h JOIN bsz z USING (bench_id)
         |  WHERE FLOOR(h.n_common * 10000.0 / z.bench_grams) >= 5000),
         |best AS (SELECT bench_id, bench_grams, n_common, containment_bp,
         |    doc_id AS example_doc_id FROM (SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY bench_id ORDER BY containment_bp DESC, doc_id ASC) AS rn
         |    FROM pairs) WHERE rn = 1)
         |SELECT m.doc_id AS bench_doc,
         |  CAST(best.bench_grams AS INTEGER) AS bench_grams,
         |  CAST(best.n_common AS INTEGER) AS n_common,
         |  best.containment_bp, best.example_doc_id
         |FROM (SELECT doc_id, fp FROM f WHERE doc_id % 97 = 0) m
         |JOIN br USING (fp) JOIN best USING (bench_id)
         |ORDER BY bench_doc""".stripMargin,

    "q151b_perplexity_filter" ->
      s"""WITH t AS (SELECT doc_id, string_split($sqlNorm, ' ') AS tk FROM documents),
         |tokpos AS (SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk, 1) AS p FROM t),
         |c1 AS (SELECT w, COUNT(*) AS c1 FROM tokpos WHERE len(w) > 0 GROUP BY 1),
         |v AS (SELECT COUNT(DISTINCT w) AS v FROM tokpos WHERE len(w) > 0),
         |bg AS (SELECT a.doc_id, a.w AS w1, b.w AS w2 FROM tokpos a
         |  JOIN tokpos b ON a.doc_id = b.doc_id AND b.p = a.p + 1),
         |c2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
         |sc AS (SELECT bg.doc_id, LN((c2.c12 + 1.0) / (c1.c1 + v.v)) AS lp
         |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 ON bg.w1 = c1.w CROSS JOIN v),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
         |  ROUND(AVG(lp), 4) AS avg_logprob FROM sc GROUP BY 1)
         |SELECT doc_id, n_bigrams, avg_logprob,
         |  CAST(NTILE(10) OVER w AS INTEGER) AS decile,
         |  NTILE(10) OVER w <= 8 AS keep
         |FROM agg WINDOW w AS (ORDER BY avg_logprob DESC, doc_id ASC)
         |ORDER BY doc_id""".stripMargin,

    "q151d_perplexity_filter_hist" -> {
      val bucketExpr = graft.ops.Sketches.histBucketExpr(-15.0, 0.0, 256)
      s"""WITH t AS (SELECT doc_id, string_split($sqlNorm, ' ') AS tk FROM documents),
         |tokpos AS (SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk, 1) AS p FROM t),
         |c1 AS (SELECT w, COUNT(*) AS c1 FROM tokpos WHERE len(w) > 0 GROUP BY 1),
         |vv AS (SELECT COUNT(DISTINCT w) AS v FROM tokpos WHERE len(w) > 0),
         |bg AS (SELECT a.doc_id, a.w AS w1, b.w AS w2 FROM tokpos a
         |  JOIN tokpos b ON a.doc_id = b.doc_id AND b.p = a.p + 1),
         |c2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
         |sc AS (SELECT bg.doc_id, LN((c2.c12 + 1.0) / (c1.c1 + vv.v)) AS lp
         |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 ON bg.w1 = c1.w CROSS JOIN vv),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
         |  ROUND(AVG(lp), 4) AS avg_logprob FROM sc GROUP BY 1),
         |hv AS (SELECT doc_id, n_bigrams, avg_logprob,
         |  CAST(avg_logprob AS DOUBLE) AS v FROM agg),
         |hist AS (SELECT $bucketExpr AS bucket, COUNT(*) AS cnt
         |  FROM hv GROUP BY 1),
         |cum AS (SELECT a.bucket, CAST(SUM(b.cnt) AS BIGINT) AS cume
         |  FROM hist a JOIN hist b ON b.bucket <= a.bucket GROUP BY a.bucket),
         |nn AS (SELECT MAX(cume) AS n FROM cum),
         |tb AS (SELECT MIN(bucket) AS tb FROM cum CROSS JOIN nn
         |  WHERE cume * 10000 >= n * 2000)
         |SELECT hv.doc_id, hv.n_bigrams, hv.avg_logprob,
         |  $bucketExpr AS bucket, ($bucketExpr >= tb.tb) AS keep
         |FROM hv CROSS JOIN tb ORDER BY hv.doc_id""".stripMargin
    },

    "q151e_perplexity_tiers" -> {
      val bucketExpr = graft.ops.Sketches.histBucketExpr(-15.0, 0.0, 256)
      s"""WITH t AS (SELECT doc_id, string_split($sqlNorm, ' ') AS tk FROM documents),
         |tokpos AS (SELECT doc_id, unnest(tk) AS w, generate_subscripts(tk, 1) AS p FROM t),
         |c1 AS (SELECT w, COUNT(*) AS c1 FROM tokpos WHERE len(w) > 0 GROUP BY 1),
         |vv AS (SELECT COUNT(DISTINCT w) AS v FROM tokpos WHERE len(w) > 0),
         |bg AS (SELECT a.doc_id, a.w AS w1, b.w AS w2 FROM tokpos a
         |  JOIN tokpos b ON a.doc_id = b.doc_id AND b.p = a.p + 1),
         |c2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
         |sc AS (SELECT bg.doc_id, LN((c2.c12 + 1.0) / (c1.c1 + vv.v)) AS lp
         |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 ON bg.w1 = c1.w CROSS JOIN vv),
         |agg AS (SELECT doc_id, ROUND(AVG(lp), 4) AS avg_logprob FROM sc GROUP BY 1),
         |hv AS (SELECT doc_id, avg_logprob,
         |  CAST(avg_logprob AS DOUBLE) AS v FROM agg),
         |hist AS (SELECT $bucketExpr AS bucket, COUNT(*) AS cnt
         |  FROM hv GROUP BY 1),
         |cum AS (SELECT a.bucket, CAST(SUM(b.cnt) AS BIGINT) AS cume
         |  FROM hist a JOIN hist b ON b.bucket <= a.bucket GROUP BY a.bucket),
         |nn AS (SELECT MAX(cume) AS n FROM cum),
         |tb1 AS (SELECT MIN(bucket) AS tb FROM cum CROSS JOIN nn
         |  WHERE cume * 10000 >= n * 3334),
         |tb2 AS (SELECT MIN(bucket) AS tb FROM cum CROSS JOIN nn
         |  WHERE cume * 10000 >= n * 6667)
         |SELECT hv.doc_id, hv.avg_logprob, $bucketExpr AS bucket,
         |  CAST((CASE WHEN $bucketExpr >= tb1.tb THEN 1 ELSE 0 END)
         |    + (CASE WHEN $bucketExpr >= tb2.tb THEN 1 ELSE 0 END) AS INTEGER) AS tier
         |FROM hv CROSS JOIN tb1 CROSS JOIN tb2 ORDER BY hv.doc_id""".stripMargin
    },

    "q152b_bm25_topk" -> {
      val (k1, b) = (1.2, 0.75)
      s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
         |tk AS (SELECT doc_id, list_filter(string_split(s, ' '), x -> len(x) > 0) AS toks FROM t),
         |lens AS (SELECT doc_id, len(toks) AS dl FROM tk),
         |stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM
         |    (SELECT doc_id, unnest(toks) AS term FROM tk)
         |  WHERE term IN ('spark', 'merge', 'window', 'customer') GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id,
         |    CAST(FLOOR(LN((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
         |      * (tf * ${k1 + 1.0}) / (tf + $k1 * (${1.0 - b} + $b * dl / avgdl))
         |      * 10000.0) AS BIGINT) AS s_bp
         |  FROM tf JOIN lens USING (doc_id) JOIN dfreq USING (term), stats)
         |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_terms_hit,
         |  CAST(SUM(s_bp) AS BIGINT) AS score_bp
         |FROM sc GROUP BY doc_id ORDER BY score_bp DESC, doc_id LIMIT 20""".stripMargin
    },

    "q156c_mixture_temperature" ->
      s"""WITH c AS (SELECT lang, COUNT(*) AS n_stratum FROM documents GROUP BY lang),
         |p AS (SELECT lang, n_stratum, n_stratum / SUM(n_stratum) OVER () AS p FROM c),
         |pt AS (SELECT lang, n_stratum, POW(p, ${1.0 / 2.0}) AS pt FROM p),
         |r AS (SELECT lang, n_stratum, pt / SUM(pt) OVER () AS target FROM pt),
         |r2 AS (SELECT lang, n_stratum, target,
         |  LEAST(1.0, 150.0 * target / n_stratum) AS rate FROM r),
         |k AS (SELECT d.lang FROM documents d JOIN r2 USING (lang)
         |  WHERE (d.doc_id * 2654435761) % 4294967296
         |    < CAST(FLOOR(r2.rate * 4294967296) AS BIGINT))
         |SELECT k.lang, COUNT(*) AS n_kept,
         |  ROUND(ANY_VALUE(r2.target), 6) AS target,
         |  ROUND(ANY_VALUE(r2.rate), 6) AS rate
         |FROM k JOIN r2 ON k.lang = r2.lang GROUP BY k.lang ORDER BY k.lang""".stripMargin,

    "q156d_dsir_weights" ->
      s"""WITH d AS (SELECT doc_id, $sqlNorm AS s FROM documents),
         |tok AS (SELECT doc_id, unnest(string_split(s, ' ')) AS term FROM d),
         |tok2 AS (SELECT doc_id, term FROM tok WHERE length(term) > 0),
         |dt AS (SELECT DISTINCT term FROM tok2),
         |hb AS (SELECT term, ${sqlPoly("term")} % 256 AS b FROM dt),
         |tb AS (SELECT doc_id, b FROM tok2 JOIN hb USING (term)),
         |qc AS (SELECT b, COUNT(*) AS qc FROM tb GROUP BY b),
         |pc AS (SELECT b, COUNT(*) AS pc FROM tb
         |  JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY b),
         |tot AS (SELECT (SELECT SUM(qc) FROM qc) AS q_tot,
         |               (SELECT SUM(pc) FROM pc) AS p_tot),
         |lr AS (SELECT qc.b, ROUND(
         |    ln((COALESCE(pc, 0) + 0.5) / (p_tot + 0.5 * 256)) -
         |    ln((qc + 0.5) / (q_tot + 0.5 * 256)), 6) AS lr
         |  FROM qc LEFT JOIN pc ON qc.b = pc.b CROSS JOIN tot),
         |w AS (SELECT doc_id, COUNT(*) AS n_tokens, SUM(lr) AS logw
         |  FROM tb JOIN lr USING (b) GROUP BY doc_id)
         |SELECT doc_id, n_tokens, ROUND(logw, 6) AS logw FROM w
         |ORDER BY ROUND(logw, 6) DESC, doc_id LIMIT 50""".stripMargin,

    "q143b_stratified_split" -> {
      val t1 = (0.8 * 4294967296.0d).toLong
      val t2 = (0.9 * 4294967296.0d).toLong
      s"""WITH s AS (SELECT doc_id, lang,
         |  CASE WHEN (doc_id * 2654435761) % 4294967296 < $t1 THEN 'train'
         |       WHEN (doc_id * 2654435761) % 4294967296 < $t2 THEN 'val'
         |       ELSE 'test' END AS split FROM documents)
         |SELECT lang, split, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
         |FROM s GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
    },

    "q174_nb_langid" ->
      s"""WITH $sqlNbCtes
         |SELECT b.doc_id, d2.lang, b.lang AS pred, b.score_micro, b.n_known
         |FROM best b JOIN documents d2 USING (doc_id)
         |WHERE b.rk = 1 ORDER BY b.doc_id""".stripMargin,

    "q176_hashed_bow" ->
      s"""WITH d AS (SELECT doc_id, $sqlNorm AS s FROM documents WHERE doc_id % 25 = 0),
         |tokall AS (SELECT doc_id, unnest(string_split(s, ' ')) AS term FROM d),
         |tok AS (SELECT doc_id, term FROM tokall WHERE length(term) > 0),
         |dt AS (SELECT DISTINCT term FROM tok),
         |hh AS (SELECT term, ${sqlPoly("term")} AS h FROM dt),
         |tb AS (SELECT doc_id, h % 64 AS i,
         |    CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM tok JOIN hh USING (term)),
         |cells AS (SELECT doc_id, i, SUM(sgn) AS v, COUNT(*) AS n
         |  FROM tb GROUP BY 1, 2),
         |nt AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens
         |  FROM cells GROUP BY 1),
         |grid AS (SELECT doc_id, r.i
         |  FROM (SELECT DISTINCT doc_id FROM cells) CROSS JOIN range(0, 64) r(i)),
         |jn AS (SELECT g.doc_id, g.i, CAST(COALESCE(c.v, 0) AS BIGINT) AS val
         |  FROM grid g LEFT JOIN cells c ON g.doc_id = c.doc_id AND g.i = c.i),
         |v AS (SELECT doc_id,
         |    string_agg(CAST(val AS VARCHAR), ',' ORDER BY i) AS vec_str
         |  FROM jn GROUP BY doc_id)
         |SELECT v.doc_id, v.vec_str, nt.n_tokens FROM v JOIN nt USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q174b_nb_accuracy" ->
      s"""WITH $sqlNbCtes
         |SELECT d2.lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN b.lang = d2.lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         |FROM best b JOIN documents d2 USING (doc_id)
         |WHERE b.rk = 1 GROUP BY d2.lang ORDER BY d2.lang""".stripMargin,

    "q194_classifier_report" ->
      s"""WITH $sqlNbCtes,
         |pairs AS (SELECT b.lang AS p, d2.lang AS t
         |  FROM best b JOIN documents d2 USING (doc_id) WHERE b.rk = 1),
         |cls AS (SELECT p AS cls FROM pairs UNION SELECT t FROM pairs),
         |tp AS (SELECT p AS cls, COUNT(*) AS tp FROM pairs
         |  WHERE p = t GROUP BY p),
         |pn AS (SELECT p AS cls, COUNT(*) AS n_pred FROM pairs GROUP BY p),
         |tn AS (SELECT t AS cls, COUNT(*) AS n_truth FROM pairs GROUP BY t),
         |j AS (SELECT cls.cls, COALESCE(tp.tp, 0) AS tp,
         |    COALESCE(pn.n_pred, 0) AS n_pred,
         |    COALESCE(tn.n_truth, 0) AS n_truth
         |  FROM cls LEFT JOIN tp USING (cls) LEFT JOIN pn USING (cls)
         |  LEFT JOIN tn USING (cls))
         |SELECT cls, tp, n_pred, n_truth,
         |  (10000 * tp) // n_pred AS precision_bp,
         |  (10000 * tp) // n_truth AS recall_bp,
         |  (20000 * tp) // (n_pred + n_truth) AS f1_bp
         |FROM j ORDER BY cls""".stripMargin
  )
}
