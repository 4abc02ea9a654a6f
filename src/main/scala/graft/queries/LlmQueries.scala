package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.expressions.TextHashes._
import graft.ops.{Dedup, Keywords, Linalg, Multimodal, Similarity, TextAnalysis}

/** LLM-data-pipeline operators (SURVEY §7.2 M6 — the north star):
  * dedup (exact / minhash+LSH / simhash / n-gram jaccard / embedding
  * cosine), similarity search (brute-force + RP-LSH), text analysis
  * (langid / quality / tokens / fingerprint), multimodal plumbing.
  *
  * Every oracle replays the custom hash kernels in pure DuckDB SQL
  * (list_reduce/list_transform over the same integer arithmetic as
  * graft.expressions.HashSpec), generated programmatically below — the
  * differential gate covers the custom Catalyst expressions bit-for-bit.
  */
object LlmQueries extends QueryGroup {

  private val P = "1000000007"

  /** DuckDB: polynomial rolling hash of a string expression (HashSpec.polyHash). */
  private def sqlPoly(e: String): String =
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, x) -> (a * 31 + x) % $P)"

  /** DuckDB: normalized text (Dedup.normText). */
  private val sqlNorm = "LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))"

  /** One oracle body for both q297 (string-keyed census) and q297b
    * (hash-keyed census, the 100 TB tier): the only divergences are the
    * gram/line GROUP BY key (gram vs polyHash(gram)) and the top-gram
    * tie-break (gram ASC vs hash ASC) — exactly the divergences of
    * [[graft.ops.TextAnalysis.gopherRepetitionHashed]]. The n-gram
    * start-position range derives from MAX word count (not a literal
    * cap), so the gate cannot silently diverge if fixtures grow
    * (r15 ADVICE item 1).
    */
  private def gopherRepetitionOracleSql(hashed: Boolean): String = {
    val gramCensus =
      if (!hashed)
        s"""gc AS (SELECT doc_id, tc, n, gram, COUNT(*) AS cnt
           |  FROM g GROUP BY doc_id, tc, n, gram),
           |gr AS (SELECT doc_id, tc, n, cnt,
           |    LENGTH(REPLACE(gram, ' ', '')) AS gchars,
           |    ROW_NUMBER() OVER (PARTITION BY doc_id, n
           |      ORDER BY cnt DESC, gram ASC) AS rk
           |  FROM gc),""".stripMargin
      else
        s"""gh0 AS (SELECT doc_id, tc, n, ${sqlPoly("gram")} AS gh,
           |    LENGTH(REPLACE(gram, ' ', '')) AS gc0 FROM g),
           |gc AS (SELECT doc_id, tc, n, gh, COUNT(*) AS cnt,
           |    MAX(gc0) AS gchars FROM gh0 GROUP BY doc_id, tc, n, gh),
           |gr AS (SELECT doc_id, tc, n, cnt, gchars,
           |    ROW_NUMBER() OVER (PARTITION BY doc_id, n
           |      ORDER BY cnt DESC, gh ASC) AS rk
           |  FROM gc),""".stripMargin
    val lineCensus =
      if (!hashed)
        s"""lc AS (SELECT doc_id, l, COUNT(*) AS cnt,
           |    LENGTH(l) AS lchars FROM ln0 GROUP BY doc_id, l),""".stripMargin
      else
        s"""lc AS (SELECT doc_id, ${sqlPoly("l")} AS lh, COUNT(*) AS cnt,
           |    MAX(LENGTH(l)) AS lchars FROM ln0
           |  GROUP BY doc_id, ${sqlPoly("l")}),""".stripMargin
    s"""WITH t AS (SELECT doc_id, text, $sqlNorm AS s FROM documents
       |  WHERE doc_id % 3 = 0),
       |l AS (SELECT doc_id, text,
       |    list_filter(string_split(s, ' '), w -> length(w) > 0) AS ws
       |  FROM t),
       |b AS (SELECT doc_id, text, ws, LEN(ws) AS nw,
       |    COALESCE(list_sum(list_transform(ws,
       |      w -> CAST(LENGTH(w) AS BIGINT))), 0) AS tc
       |  FROM l),
       |g AS (SELECT doc_id, tc, n.n,
       |    array_to_string(ws[CAST(i.i AS INTEGER):
       |      CAST(i.i + n.n - 1 AS INTEGER)], ' ') AS gram
       |  FROM b
       |  CROSS JOIN (SELECT unnest(range(2, 11)) AS n) n
       |  CROSS JOIN (SELECT unnest(range(1,
       |    CAST(COALESCE((SELECT MAX(nw) FROM b), 0) AS BIGINT) + 1))
       |    AS i) i
       |  WHERE i.i <= nw - n.n + 1),
       |$gramCensus
       |pn AS (SELECT doc_id, n,
       |    MAX(CASE WHEN rk = 1 THEN
       |      (cnt * gchars * 10000) // GREATEST(tc, 1) END) AS top_bp,
       |    (COALESCE(SUM(CASE WHEN cnt >= 2 THEN cnt * gchars END), 0)
       |      * 10000) // GREATEST(MAX(tc), 1) AS dup_bp
       |  FROM gr GROUP BY doc_id, n),
       |gcols AS (SELECT doc_id,
       |    MAX(CASE WHEN n = 2 THEN top_bp END) AS top2_bp,
       |    MAX(CASE WHEN n = 3 THEN top_bp END) AS top3_bp,
       |    MAX(CASE WHEN n = 4 THEN top_bp END) AS top4_bp,
       |    MAX(CASE WHEN n = 5 THEN dup_bp END) AS dup5_bp,
       |    MAX(CASE WHEN n = 6 THEN dup_bp END) AS dup6_bp,
       |    MAX(CASE WHEN n = 7 THEN dup_bp END) AS dup7_bp,
       |    MAX(CASE WHEN n = 8 THEN dup_bp END) AS dup8_bp,
       |    MAX(CASE WHEN n = 9 THEN dup_bp END) AS dup9_bp,
       |    MAX(CASE WHEN n = 10 THEN dup_bp END) AS dup10_bp
       |  FROM pn GROUP BY doc_id),
       |ln0 AS (SELECT doc_id, ul.l FROM b,
       |    UNNEST(string_split(text, chr(10))) AS ul(l)
       |  WHERE LENGTH(ul.l) > 0),
       |$lineCensus
       |lcols AS (SELECT doc_id,
       |    (COALESCE(SUM(CASE WHEN cnt >= 2 THEN cnt END), 0) * 10000)
       |      // GREATEST(SUM(cnt), 1) AS dup_line_bp,
       |    (COALESCE(SUM(CASE WHEN cnt >= 2 THEN cnt * lchars END), 0)
       |      * 10000) // GREATEST(SUM(cnt * lchars), 1)
       |      AS dup_line_char_bp
       |  FROM lc GROUP BY doc_id)
       |SELECT b.doc_id, CAST(b.nw AS INTEGER) AS n_words,
       |  CAST(COALESCE(lcols.dup_line_bp, 0) AS BIGINT) AS dup_line_bp,
       |  CAST(COALESCE(lcols.dup_line_char_bp, 0) AS BIGINT)
       |    AS dup_line_char_bp,
       |  CAST(COALESCE(gcols.top2_bp, 0) AS BIGINT) AS top2_bp,
       |  CAST(COALESCE(gcols.top3_bp, 0) AS BIGINT) AS top3_bp,
       |  CAST(COALESCE(gcols.top4_bp, 0) AS BIGINT) AS top4_bp,
       |  CAST(COALESCE(gcols.dup5_bp, 0) AS BIGINT) AS dup5_bp,
       |  CAST(COALESCE(gcols.dup6_bp, 0) AS BIGINT) AS dup6_bp,
       |  CAST(COALESCE(gcols.dup7_bp, 0) AS BIGINT) AS dup7_bp,
       |  CAST(COALESCE(gcols.dup8_bp, 0) AS BIGINT) AS dup8_bp,
       |  CAST(COALESCE(gcols.dup9_bp, 0) AS BIGINT) AS dup9_bp,
       |  CAST(COALESCE(gcols.dup10_bp, 0) AS BIGINT) AS dup10_bp,
       |  (COALESCE(lcols.dup_line_bp, 0) <= 3000
       |    AND COALESCE(lcols.dup_line_char_bp, 0) <= 2000
       |    AND COALESCE(gcols.top2_bp, 0) <= 2000
       |    AND COALESCE(gcols.top3_bp, 0) <= 1800
       |    AND COALESCE(gcols.top4_bp, 0) <= 1600
       |    AND COALESCE(gcols.dup5_bp, 0) <= 1500
       |    AND COALESCE(gcols.dup6_bp, 0) <= 1400
       |    AND COALESCE(gcols.dup7_bp, 0) <= 1300
       |    AND COALESCE(gcols.dup8_bp, 0) <= 1200
       |    AND COALESCE(gcols.dup9_bp, 0) <= 1100
       |    AND COALESCE(gcols.dup10_bp, 0) <= 1000) AS rep_pass
       |FROM b LEFT JOIN gcols ON b.doc_id = gcols.doc_id
       |LEFT JOIN lcols ON b.doc_id = lcols.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }

  /** DuckDB CTE chain replaying [[graft.ops.Bpe.unigramTrainEm]] with
    * the default knobs (40/20/10 seed, keepTop 24, 2 iterations,
    * maxWordLen 16): bounded seed counts, then per EM iteration a
    * recursive-CTE enumeration of EVERY segmentation path of each
    * distinct training word (path strings with chr(31) separators) and
    * the ROW_NUMBER argmin over the same (cost, np, path) total order
    * the Spark DP stores — so the M-step counts the identical pieces.
    * The likelihood-drop prune (r15 verdict item 5) replays as a
    * correlated MIN over the SAME enumerated path set restricted to
    * paths not containing the probed piece — the SQL mirror of the
    * banned-piece DP. Ends at `v2`, the learned (piece, cnt, cost)
    * vocabulary.
    */
  private def unigramEmIterCtes(i: Int, vin: String): String =
    s"""seg$i AS (SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS cost,
       |    CAST(0 AS BIGINT) AS np, '' AS path FROM dw
       |  UNION ALL
       |  SELECT s.w, s.pos + LENGTH(p.piece), s.cost + p.cost, s.np + 1,
       |    CASE WHEN s.path = '' THEN p.piece
       |         ELSE s.path || chr(31) || p.piece END
       |  FROM seg$i s JOIN $vin p
       |    ON s.pos + LENGTH(p.piece) <= LENGTH(s.w)
       |   AND substr(s.w, s.pos + 1, LENGTH(p.piece)) = p.piece),
       |paths$i AS MATERIALIZED (SELECT w, cost, np, path FROM seg$i
       |  WHERE pos = LENGTH(w)),
       |best$i AS MATERIALIZED (SELECT w, cost, path FROM (
       |  SELECT w, cost, path, ROW_NUMBER() OVER (PARTITION BY w
       |      ORDER BY cost ASC, np ASC, path ASC) AS rn
       |  FROM paths$i) WHERE rn = 1),
       |pc$i AS MATERIALIZED (SELECT piece, SUM(f) AS cnt FROM (
       |  SELECT wf.f, unnest(string_split(b.path, chr(31))) AS piece
       |  FROM wf JOIN best$i b ON wf.w = b.w) GROUP BY piece),
       |-- likelihood-drop prune: price each distinct multi-char piece
       |-- of each best path by min-cost-over-paths-not-using-it minus
       |-- best cost (the all-chars path guarantees the min exists)
       |wp$i AS (SELECT DISTINCT w, piece FROM (
       |  SELECT b.w, unnest(string_split(b.path, chr(31))) AS piece
       |  FROM best$i b) WHERE LENGTH(piece) >= 2),
       |ls$i AS MATERIALIZED (SELECT wp.piece,
       |    SUM(wf.f * ((SELECT MIN(s.cost) FROM paths$i s
       |      WHERE s.w = wp.w AND NOT list_contains(
       |        string_split(s.path, chr(31)), wp.piece)) - b.cost))
       |      AS loss
       |  FROM wp$i wp
       |  JOIN best$i b ON wp.w = b.w
       |  JOIN wf ON wf.w = wp.w
       |  GROUP BY wp.piece),
       |ch$i AS (SELECT v.piece, GREATEST(COALESCE(p.cnt, 0), 1) AS cnt
       |  FROM (SELECT piece FROM $vin WHERE LENGTH(piece) = 1) v
       |  LEFT JOIN pc$i p ON v.piece = p.piece),
       |nc$i AS (SELECT p.piece, p.cnt FROM pc$i p
       |  LEFT JOIN ls$i l ON p.piece = l.piece
       |  WHERE LENGTH(p.piece) >= 2
       |  ORDER BY COALESCE(l.loss, 0) DESC, p.cnt DESC, p.piece ASC
       |  LIMIT 24),
       |al$i AS (SELECT piece, cnt FROM ch$i
       |  UNION ALL SELECT piece, cnt FROM nc$i),
       |tt$i AS (SELECT SUM(cnt) AS tot FROM al$i),
       |v$i AS MATERIALIZED (SELECT piece, CAST(cnt AS BIGINT) AS cnt,
       |  CAST(FLOOR(-1000 * LN(CAST(cnt AS DOUBLE) / tot)) AS BIGINT)
       |    AS cost
       |  FROM al$i, tt$i)""".stripMargin

  private def unigramTrainCtes: String =
    s"""t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
       |w0 AS (SELECT unnest(string_split(s, ' ')) AS w FROM t),
       |wf AS MATERIALIZED (SELECT w, COUNT(*) AS f FROM w0
       |  WHERE LENGTH(w) BETWEEN 1 AND 16 GROUP BY w),
       |dw AS MATERIALIZED (SELECT w FROM wf),
       |sub1 AS (SELECT substr(w, CAST(i AS INTEGER), 1) AS piece,
       |    SUM(f) AS cnt
       |  FROM wf, range(1, 65) r(i) WHERE i <= LENGTH(w) GROUP BY 1),
       |sub2 AS (SELECT piece, cnt FROM (
       |  SELECT substr(w, CAST(i AS INTEGER), 2) AS piece, SUM(f) AS cnt
       |  FROM wf, range(1, 64) r(i) WHERE i <= LENGTH(w) - 1 GROUP BY 1)
       |  ORDER BY cnt DESC, piece ASC LIMIT 40),
       |sub3 AS (SELECT piece, cnt FROM (
       |  SELECT substr(w, CAST(i AS INTEGER), 3) AS piece, SUM(f) AS cnt
       |  FROM wf, range(1, 63) r(i) WHERE i <= LENGTH(w) - 2 GROUP BY 1)
       |  ORDER BY cnt DESC, piece ASC LIMIT 20),
       |subw AS (SELECT w AS piece, f AS cnt FROM wf
       |  ORDER BY f DESC, w ASC LIMIT 10),
       |seedv AS (SELECT piece, MAX(cnt) AS cnt FROM (
       |  SELECT piece, cnt FROM sub1 UNION ALL SELECT piece, cnt FROM sub2
       |  UNION ALL SELECT piece, cnt FROM sub3
       |  UNION ALL SELECT piece, cnt FROM subw) GROUP BY piece),
       |tt0 AS (SELECT SUM(cnt) AS tot FROM seedv),
       |v0 AS MATERIALIZED (SELECT piece, CAST(cnt AS BIGINT) AS cnt,
       |  CAST(FLOOR(-1000 * LN(CAST(cnt AS DOUBLE) / tot)) AS BIGINT)
       |    AS cost
       |  FROM seedv, tt0),
       |${unigramEmIterCtes(1, "v0")},
       |${unigramEmIterCtes(2, "v1")}""".stripMargin

  /** DuckDB CTE chain replaying [[graft.ops.TextAnalysis.wordpieceTokenize]]:
    * greedy longest-match-first per DISTINCT word as a recursive CTE —
    * each step takes the longest vocab piece matching at the cursor
    * (continuations ##-prefixed); a word with NO match at some cursor
    * collapses to a single [UNK] (id 0) via the bool_or. The vocab
    * literal comes from the SAME Seq the Spark UDF indexes. The walk is
    * deliberately NOT a list_reduce fold: DuckDB 1.0 corrupts struct
    * accumulators under vectorized folds (verified in-session).
    * Yields `t(doc_id, wl)` and `flat(doc_id, ids)`; callers join them
    * (shared with the q142b packing oracle in CorpusQueries).
    * Callers must open with WITH RECURSIVE.
    */
  private[queries] lazy val sqlWordpieceCtes: String = {
    val vlit = TextAnalysis.wordpieceVocab
      .map(v => s"'$v'").mkString("[", ", ", "]")
    s"""v AS (SELECT $vlit AS vb),
       |t AS (SELECT doc_id,
       |    list_filter(string_split($sqlNorm, ' '), x -> len(x) > 0) AS wl
       |  FROM documents),
       |w AS (SELECT doc_id, unnest(wl) AS word,
       |    generate_subscripts(wl, 1) AS widx FROM t),
       |uw AS (SELECT DISTINCT word FROM w),
       |rec AS (
       |  SELECT word, 0 AS pos, CAST(NULL AS VARCHAR) AS piece,
       |    0 AS step, false AS bad FROM uw
       |  UNION ALL
       |  SELECT word,
       |    CASE WHEN best = '' THEN len(word)
       |         WHEN best LIKE '##%' THEN pos + len(best) - 2
       |         ELSE pos + len(best) END AS pos,
       |    CASE WHEN best = '' THEN '[UNK]' ELSE best END AS piece,
       |    step + 1 AS step,
       |    (best = '') AS bad
       |  FROM (
       |    SELECT word, pos, step,
       |      coalesce(list_filter(cands, p -> len(p) =
       |        list_aggregate(list_transform(cands, q -> len(q)), 'max'))[1], '') AS best
       |    FROM (
       |      SELECT r.word, r.pos, r.step,
       |        list_filter(v.vb, p -> CASE WHEN r.pos = 0
       |          THEN p NOT LIKE '##%' AND p != '[UNK]'
       |            AND substr(r.word, 1, len(p)) = p
       |          ELSE p LIKE '##%' AND len(p) > 2
       |            AND substr(r.word, r.pos + 1, len(p) - 2) = substr(p, 3)
       |          END) AS cands
       |      FROM rec r, v
       |      WHERE NOT r.bad AND r.pos < len(r.word)))),
       |wt AS (SELECT word,
       |    CASE WHEN bool_or(bad) THEN [CAST(0 AS INTEGER)]
       |         ELSE list(CAST(list_position((SELECT vb FROM v), piece) - 1
       |           AS INTEGER) ORDER BY step) END AS ids
       |  FROM rec WHERE piece IS NOT NULL GROUP BY word),
       |flat AS (SELECT w.doc_id, flatten(list(wt.ids ORDER BY w.widx)) AS ids
       |  FROM w JOIN wt USING (word) GROUP BY w.doc_id)""".stripMargin
  }

  /** DuckDB CTEs: documents → minhash signature list (HashSpec.minHash).
    * `from` lets callers restrict the corpus (e.g. to exact-dedup reps).
    */
  private[queries] def sqlMinhashCtes(n: Int = 16, k: Int = 5,
      from: String = "documents"): String = {
    val sigEntries = (0 until n).map { i =>
      val a = 2 * i + 3
      val b = 1217 * i + 17
      s"list_min(list_transform(hs, h -> ($a * h + $b) % $P))"
    }.mkString(",\n    ")
    s"""t AS (SELECT doc_id, $sqlNorm AS s FROM $from),
       |sh AS (SELECT doc_id,
       |  CASE WHEN LEN(s) < $k THEN [s]
       |       ELSE list_distinct([substr(s, CAST(i AS INTEGER), $k) for i in range(1, LEN(s) - ${k - 2})])
       |  END AS shingles FROM t),
       |hh AS (SELECT doc_id, list_transform(shingles, sg -> ${sqlPoly("sg")}) AS hs FROM sh),
       |sig AS (SELECT doc_id, [
       |    $sigEntries
       |  ] AS sig FROM hh)""".stripMargin
  }

  /** DuckDB: 32-bit simhash from a list column `hs` of mixed token hashes. */
  private def sqlSimhashFromHs: String =
    (0 until 32).map { j =>
      s"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> $j) & 1) * 2 - 1)) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  /** DuckDB: RP-LSH bucket over `embedding` (HashSpec.rpBits), dim=64. */
  private def sqlRpBucket(tbl: String, nBits: Int): String = {
    val bits = (0 until nBits).map { j =>
      val s = s"list_sum(list_transform(range(1, 65), i -> " +
        s"CAST($tbl.embedding[i] AS DOUBLE) * (((1103515245 * ($j * 64 + (i - 1)) + 12345) % 2001) - 1000)))"
      s"(CASE WHEN $s > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"CAST($bits AS BIGINT)"
  }

  /** Canonical Porter-1980 examples (same table as TextAnalysisSpec):
    * the q108 inputs AND its oracle — expected stems are the gate.
    */
  private val porterGolden: Seq[(String, String)] = Seq(
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file", "happy" -> "happi", "sky" -> "sky",
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc", "digitizer" -> "digit",
    "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "formaliti" -> "formal", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good", "revival" -> "reviv", "allowance" -> "allow",
    "inference" -> "infer", "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens", "irritant" -> "irrit",
    "replacement" -> "replac", "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "homologou" -> "homolog", "communism" -> "commun",
    "activate" -> "activ", "angulariti" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  /** Synthesized PII-bearing frame for q265/q265b: one email, phone,
    * IPv4 and 16-digit card candidate per customer, all deterministic
    * functions of (c_custkey, c_nationkey) — the oracle rebuilds the
    * identical text, so scan counts and the redacted md5 hash-gate.
    */
  private def piiDocs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.customer(s, d).select(col("c_custkey"),
      concat_ws(" ",
        col("c_name"),
        lit("call"),
        concat(
          (col("c_nationkey") + 10).cast("string"), lit("-"),
          lpad(pmod(col("c_custkey") * 7, lit(1000)).cast("string"), 3, "0"),
          lit("-"),
          lpad(pmod(col("c_custkey") * 13, lit(1000)).cast("string"), 3, "0"),
          lit("-"),
          lpad(pmod(col("c_custkey") * 17, lit(10000)).cast("string"), 4, "0")),
        lit("mail"),
        concat(lit("c"), col("c_custkey").cast("string"),
          lit("@example.com")),
        lit("card"),
        lpad((col("c_custkey") * 137 + col("c_nationkey")).cast("string"),
          16, "4"),
        lit("ip"),
        concat(lit("10."), col("c_nationkey").cast("string"), lit(".0."),
          pmod(col("c_custkey"), lit(256)).cast("string")),
        lit("ok the end")).as("t"))

  /** Extended PII fixture for q265c/q265d: a local NNN-NNN-NNNN phone
    * (the r13-ADVICE shape), an intl 4-part phone, an SSN whose
    * issuable-range validity varies by key, and a DE-shaped IBAN whose
    * mod-97 validity varies by key (~1/97 of keys valid) — every class
    * a deterministic function of (c_custkey, c_nationkey), rebuilt
    * verbatim in the oracle.
    */
  private def piiDocs2(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.customer(s, d).select(col("c_custkey"),
      concat_ws(" ",
        lit("tel"),
        concat(
          lpad(pmod(col("c_custkey") * 19 + 1, lit(1000)).cast("string"), 3, "0"),
          lit("-"),
          lpad(pmod(col("c_custkey") * 23, lit(1000)).cast("string"), 3, "0"),
          lit("-"),
          lpad(pmod(col("c_custkey") * 29, lit(10000)).cast("string"), 4, "0")),
        lit("intl"),
        concat(
          (col("c_nationkey") + 10).cast("string"), lit("-"),
          lpad(pmod(col("c_custkey") * 7, lit(1000)).cast("string"), 3, "0"),
          lit("-"),
          lpad(pmod(col("c_custkey") * 13, lit(1000)).cast("string"), 3, "0"),
          lit("-"),
          lpad(pmod(col("c_custkey") * 17, lit(10000)).cast("string"), 4, "0")),
        lit("ssn"),
        concat(
          lpad(pmod(col("c_custkey") * 37, lit(1000)).cast("string"), 3, "0"),
          lit("-"),
          lpad(pmod(col("c_custkey") * 11, lit(100)).cast("string"), 2, "0"),
          lit("-"),
          lpad(pmod(col("c_custkey") * 53, lit(10000)).cast("string"), 4, "0")),
        lit("iban"),
        concat(lit("DE"),
          lpad(pmod(col("c_custkey") * 3, lit(100)).cast("string"), 2, "0"),
          lpad(pmod(col("c_custkey") * 271 + col("c_nationkey"),
            lit(1000000000L)).cast("string"), 9, "0"),
          lpad(pmod(col("c_custkey") * 7919, lit(1000000000L))
            .cast("string"), 9, "0")),
        lit("fin")).as("t"))

  /** The q265c/q265d text in DuckDB (exact string equality with
    * [[piiDocs2]]). */
  private val sqlPiiText2: String =
    "'tel ' || LPAD(CAST((c_custkey * 19 + 1) % 1000 AS VARCHAR), 3, '0') || '-' || " +
      "LPAD(CAST((c_custkey * 23) % 1000 AS VARCHAR), 3, '0') || '-' || " +
      "LPAD(CAST((c_custkey * 29) % 10000 AS VARCHAR), 4, '0') || " +
      "' intl ' || CAST(c_nationkey + 10 AS VARCHAR) || '-' || " +
      "LPAD(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-' || " +
      "LPAD(CAST((c_custkey * 13) % 1000 AS VARCHAR), 3, '0') || '-' || " +
      "LPAD(CAST((c_custkey * 17) % 10000 AS VARCHAR), 4, '0') || " +
      "' ssn ' || LPAD(CAST((c_custkey * 37) % 1000 AS VARCHAR), 3, '0') || '-' || " +
      "LPAD(CAST((c_custkey * 11) % 100 AS VARCHAR), 2, '0') || '-' || " +
      "LPAD(CAST((c_custkey * 53) % 10000 AS VARCHAR), 4, '0') || " +
      "' iban DE' || LPAD(CAST((c_custkey * 3) % 100 AS VARCHAR), 2, '0') || " +
      "LPAD(CAST((c_custkey * 271 + c_nationkey) % 1000000000 AS VARCHAR), 9, '0') || " +
      "LPAD(CAST((c_custkey * 7919) % 1000000000 AS VARCHAR), 9, '0') || ' fin'"

  /** The same synthesized text in DuckDB (exact string equality with
    * [[piiDocs]] — md5-gated). */
  private val sqlPiiText: String =
    "c_name || ' call ' || CAST(c_nationkey + 10 AS VARCHAR) || '-' || " +
      "LPAD(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-' || " +
      "LPAD(CAST((c_custkey * 13) % 1000 AS VARCHAR), 3, '0') || '-' || " +
      "LPAD(CAST((c_custkey * 17) % 10000 AS VARCHAR), 4, '0') || " +
      "' mail c' || CAST(c_custkey AS VARCHAR) || '@example.com card ' || " +
      "LPAD(CAST(c_custkey * 137 + c_nationkey AS VARCHAR), 16, '4') || " +
      "' ip 10.' || CAST(c_nationkey AS VARCHAR) || '.0.' || " +
      "CAST(c_custkey % 256 AS VARCHAR) || ' ok the end'"

  /** DuckDB: index-order dot product of two embedding columns. */
  private def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> " +
      s"CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))"

  override def queries: Map[String, Q] = Map(
    // ---- dedup: exact (M6a) -----------------------------------------
    // duplication-multiplicity profile (NEW r11): the pre-dedup health
    // report — per power-of-two cluster-size bucket, clusters / docs /
    // redundant docs / corpus share in floor bp, over q90's md5
    // fingerprint substrate and q233's bin()-length bucketing
    "q237_dup_profile" -> ((s, d) => {
      Dedup.duplicationProfile(Tables.documents(s, d), "text")
        .orderBy(col("bucket"))
    }),

    // Fellegi-Sunter record linkage (NEW r12): entity resolution over
    // the customer frame split even/odd — nation-blocked candidate
    // pairs scored by integer agreement weights on the market segment
    // and the acctbal thousand-bucket; the structured-data sibling of
    // the text dedup family
    "q255_record_linkage" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .withColumn("bal_bucket",
          floor(col("c_acctbal") / 1000).cast("long"))
      graft.ops.Dedup.linkageScores(
          c.filter(col("c_custkey") % 2 === 0),
          c.filter(col("c_custkey") % 2 === 1),
          "c_custkey", "c_nationkey",
          Seq(("c_mktsegment", 1500L, -800L),
            ("bal_bucket", 2500L, -1200L)),
          minScoreMilli = 1700L)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ENTITY RESOLUTION (NEW r13): the composition that turns pairwise
    // linkage into entity ids — q255's scored pairs at the both-agree
    // threshold feed connected components (min-label propagation), and
    // the top-100 largest entities gate the whole chain: blocking →
    // scoring → thresholding → transitive closure
    "q255c_entity_resolution" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .withColumn("bal_bucket",
          floor(col("c_acctbal") / 1000).cast("long"))
      val pairs = graft.ops.Dedup.linkageScores(
          c.filter(col("c_custkey") % 2 === 0),
          c.filter(col("c_custkey") % 2 === 1),
          "c_custkey", "c_nationkey",
          Seq(("c_mktsegment", 1500L, -800L),
            ("bal_bucket", 2500L, -1200L)),
          minScoreMilli = 4000L)
        .select(col("a_id").as("id_a"), col("b_id").as("id_b"))
      graft.ops.Dedup.connectedComponents(pairs)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
        .orderBy(col("n_members").desc, col("cluster"))
        .limit(100)
    }),

    // LEARNED Fellegi-Sunter linkage (NEW r13): q255 with the weights
    // ESTIMATED instead of hand-set — m/u agreement probabilities
    // counted on an adjudicated training slice (nation-blocked pairs
    // of the %4 id stripes, labeled by segment equality — the q174
    // holdout pattern), add-half smoothed, floor-quantized to
    // milli log-ratios; the full even/odd split is then scored with
    // the learned weights and the top-100 by score gates the whole
    // train-then-score chain
    "q255b_linkage_learned" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .withColumn("bal_bucket",
          floor(col("c_acctbal") / 1000).cast("long"))
        .withColumn("name_tail", substring(col("c_name"), -1, 1))
      val aSide = c.filter(col("c_custkey") % 2 === 0)
      val bSide = c.filter(col("c_custkey") % 2 === 1)
      val labeled = c.filter(col("c_custkey") % 4 === 0)
        .select(col("c_custkey").as("a_id"),
          col("c_nationkey").as("blk"), col("c_mktsegment").as("sa"))
        .join(c.filter(col("c_custkey") % 4 === 1)
          .select(col("c_custkey").as("b_id"),
            col("c_nationkey").as("blk"), col("c_mktsegment").as("sb")),
          "blk")
        .select(col("a_id"), col("b_id"),
          (col("sa") === col("sb")).as("is_match"))
      val w = graft.ops.Dedup.linkageWeights(aSide, bSide, "c_custkey",
        labeled, Seq("bal_bucket", "name_tail"))
      graft.ops.Dedup.linkageScores(aSide, bSide, "c_custkey",
          "c_nationkey", w, minScoreMilli = Long.MinValue)
        .orderBy(col("score_milli").desc, col("a_id"), col("b_id"))
        .limit(100)
    }),

    "q90_dedup_exact" -> ((s, d) => {
      Dedup.exactDuplicateGroups(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("fp")).limit(100)
    }),

    // KMV distinct sketch (NEW r10): k-minimum-values estimate of the
    // distinct normalized documents — k rows per corpus, built by ONE
    // distributed top-k (TakeOrderedAndProject), shard-mergeable.
    // Unlike HLL, the sketch rides the shared poly hash and floor
    // integer estimator, so sketch AND estimate hash-gate bit-for-bit
    // (exact distinct emitted alongside as the accuracy witness)
    "q218_kmv_distinct" -> ((s, d) => {
      import graft.ops.Sketches
      val docs = Tables.documents(s, d)
      val norm = Dedup.normText(col("text"))
      val sk = Sketches.kmvSketch(docs, norm, k = 128)
      // h IS NOT NULL mirrors both kmvSketch's filter and the oracle's
      // t2 CTE — without it a null text would make n_exact diverge
      // cross-engine (null row counted here, not there)
      val exact = docs.select(poly_hash(norm).as("h"))
        .filter(col("h").isNotNull).distinct()
        .agg(count(lit(1)).as("n_exact"))
      Sketches.kmvDistinct(sk, 128).crossJoin(broadcast(exact))
    }),

    // per-source KMV distinct (NEW r10): q218 grouped — per-feed
    // distinct-document estimates at O(k) rows per source (the
    // per-tenant cardinality dashboard); grp-partitioned rank, never
    // a global window; exact per-source distinct rides along as the
    // accuracy witness, everything integer → full hash gate
    "q218b_kmv_distinct_by" -> ((s, d) => {
      import graft.ops.Sketches
      val docs = Tables.documents(s, d)
      val norm = Dedup.normText(col("text"))
      val sk = Sketches.kmvSketchBy(docs, "source", norm, k = 64)
      // same null hygiene as q218: the oracle's t CTE keeps only
      // non-null (grp, h) rows
      val exact = docs.select(col("source").as("grp"),
          poly_hash(norm).as("h"))
        .filter(col("grp").isNotNull && col("h").isNotNull).distinct()
        .groupBy(col("grp")).agg(count(lit(1)).as("n_exact"))
      Sketches.kmvDistinctBy(sk, 64)
        .join(exact, Seq("grp"))
        .orderBy(col("grp"))
    }),

    // KMV pairwise contamination MATRIX (NEW r10): every shard pair's
    // overlap estimate from the grouped sketch alone — |pairs|·2k
    // bounded rows, no corpus distinct-joins. Slices constructed with
    // known overlap (doc_id%4 ∈ {0,1}/{1,2}/{2,3}: adjacent pairs
    // share a quarter, the outer pair is disjoint) so the matrix
    // discriminates; all-integer → full hash gate
    "q219b_kmv_overlap_matrix" -> ((s, d) => {
      import graft.ops.Sketches
      val docs = Tables.documents(s, d)
      val norm = Dedup.normText(col("text"))
      def slice(name: String, r0: Int, r1: Int) =
        docs.filter(col("doc_id") % 4 === r0 || col("doc_id") % 4 === r1)
          .select(lit(name).as("grp"), col("text"))
      val all = slice("s01", 0, 1)
        .unionByName(slice("s12", 1, 2))
        .unionByName(slice("s23", 2, 3))
      Sketches.kmvOverlapMatrix(
          Sketches.kmvSketchBy(all, "grp", norm, 64), 64)
        .orderBy(col("grp_a"), col("grp_b"))
    }),

    // KMV overlap / contamination estimate (NEW r10): how much of
    // shard B leaked into shard A, answered from two 128-row sketches
    // instead of a distinct-join of the corpora — the 100 TB
    // decontamination TRIAGE step (the exact containment gate q140c/d
    // then runs only on flagged shard pairs). Slices overlap by
    // construction (doc_id % 3 ∈ {2} is in both)
    "q219_kmv_overlap" -> ((s, d) => {
      import graft.ops.Sketches
      val docs = Tables.documents(s, d)
      val norm = Dedup.normText(col("text"))
      val a = Sketches.kmvSketch(docs.filter(col("doc_id") % 3 =!= 0), norm, 128)
      val b = Sketches.kmvSketch(docs.filter(col("doc_id") % 3 =!= 1), norm, 128)
      Sketches.kmvOverlap(a, b, 128)
    }),

    // KMV set ALGEBRA (NEW r13): q219's union/intersection extended
    // with per-side and DIFFERENCE estimates — "how much of the new
    // shard is genuinely new" from 2·k sketch rows; same slices as
    // q219 so the three estimates cross-check (a_only ≈ b_only ≈ 1/3)
    "q273_kmv_set_algebra" -> ((s, d) => {
      import graft.ops.Sketches
      val docs = Tables.documents(s, d)
      val norm = Dedup.normText(col("text"))
      val a = Sketches.kmvSketch(docs.filter(col("doc_id") % 3 =!= 0), norm, 128)
      val b = Sketches.kmvSketch(docs.filter(col("doc_id") % 3 =!= 1), norm, 128)
      Sketches.kmvSetAlgebra(a, b, 128)
    }),

    // incremental NEAR-dedup: the new crawl's minhash bands joined
    // against the ingested snapshot's — the fuzzy companion of q90b
    // (same corpus split), round-4 estimated Jaccard at 0.9
    "q92e_neardup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.nearDupAgainst(
          docs.filter(pmod(col("doc_id"), lit(3)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(3)) === 0),
          "doc_id", "text", minEstJaccard = 0.9)
        .select(col("fresh_id"), col("ingested_id"),
          round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy(col("fresh_id"), col("ingested_id"))
    }),

    // corpus snapshot diff (NEW r8): the data-versioning view between
    // two crawls — added/removed/changed/unchanged per id over one
    // fingerprint full-outer join; "changed" docs simulated by a
    // deterministic text edit on doc_id % 7
    "q90c_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val oldSnap = docs.filter(pmod(col("doc_id"), lit(5)) =!= 4)
      val newSnap = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
        .withColumn("text", when(pmod(col("doc_id"), lit(7)) === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // LSH banding planner (NEW r8): the S-curve (bands, rows) selection
    // a user runs BEFORE q92 — FP/FN integral areas per factorization
    // of nPerm, floored to ppb pre-sum so both engines sum exact ints
    "q92f_lsh_plan" -> ((s, _) => {
      Dedup.lshPlan(s, nPerm = 16, threshold = 0.5, grid = 200)
        .orderBy(col("bands"))
    }),

    // incremental dedup: the "new crawl" (doc_id % 3 != 0) against the
    // already-ingested snapshot (doc_id % 3 == 0) — only content NOT
    // already in the corpus survives
    "q90b_dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.dedupAgainst(
          docs.filter(pmod(col("doc_id"), lit(3)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(3)) === 0),
          "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("fp"))
        .orderBy(col("doc_id"))
    }),

    // minhash signatures (nvtext minhash parity)
    "q91_minhash_sig" -> ((s, d) => {
      Dedup.minhashSignatures(Tables.documents(s, d), "doc_id", "text")
        .filter(col("doc_id") % 11 === 0)
        .select(
          col("doc_id"),
          element_at(col("sig"), 1).as("mh0"),
          element_at(col("sig"), 8).as("mh7"),
          element_at(col("sig"), 16).as("mh15"),
          array_join(transform(col("sig"), x => x.cast("string")), ",").as("sig_str"))
        .orderBy(col("doc_id"))
    }),

    // minhash + LSH banding near-dup pairs (M6b)
    "q92_dedup_minhash_lsh" -> ((s, d) => {
      Dedup.minhashCandidatePairs(Tables.documents(s, d), "doc_id", "text")
        .filter(col("est_jaccard") >= 0.9)
        .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // near-dup clusters: LSH pairs → connected components (M6b tail)
    "q92b_dedup_clusters" -> ((s, d) => {
      val pairs = Dedup.minhashCandidatePairs(Tables.documents(s, d), "doc_id", "text")
        .filter(col("est_jaccard") >= 0.9)
      Dedup.connectedComponents(pairs)
        .orderBy(col("id"))
    }),

    // same clusters via large-star/small-star edge rewriting — the
    // high-diameter-safe CC (O(log n) rounds vs label propagation's
    // O(diameter)); hash-gated against the same recursive-CTE oracle
    "q92d_clusters_star" -> ((s, d) => {
      val pairs = Dedup.minhashCandidatePairs(Tables.documents(s, d), "doc_id", "text")
        .filter(col("est_jaccard") >= 0.9)
      Dedup.connectedComponentsStar(pairs)
        .orderBy(col("id"))
    }),

    // the composed pipeline: exact dedup → minhash LSH on reps → CC →
    // per-row keep/drop verdicts (what a corpus-dedup user actually runs)
    "q92c_dedup_pipeline" -> ((s, d) => {
      Dedup.dedupCorpus(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // quality-aware dedup survivor (NEW r10): q92c's clusters, but the
    // survivor is the member with the MOST non-empty tokens (ties →
    // min doc_id) instead of the min id — keep the longest extraction
    // of a twice-crawled page. Argmax per cluster via max over
    // struct(quality, −id): map-side-combined, O(1) per cluster
    "q92g_dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_toks",
          size(filter(split(Dedup.normText(col("text")), " "),
            t => length(t) > 0)))
      Dedup.dedupCorpusKeepBest(docs, "doc_id", "text", "n_toks")
        .orderBy(col("doc_id"))
    }),

    // EXACT heavy-hitter tokens (NEW r11): every token above 2% corpus
    // frequency with its exact count — per-partition Misra–Gries
    // candidates + exact recount, so the output is partitioning-
    // independent and hash-gates against a plain GROUP BY / HAVING
    // while never shuffling the full token tail (stopword discovery
    // at corpus scale)
    "q228_heavy_hitter_tokens" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(Dedup.normText(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      graft.ops.Sketches.heavyHitters(toks, "tok", 50)
        .orderBy(col("value"))
    }),

    // per-source heavy hitters (NEW r11): q228 grouped — per-feed
    // boilerplate/stopword discovery at the same O(k·partitions)
    // sketch shuffle; per-group pigeonhole keeps exactness
    "q228b_heavy_hitters_by" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"),
          explode(split(Dedup.normText(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      graft.ops.Sketches.heavyHittersBy(toks, "source", "tok", 40)
        .orderBy(col("grp"), col("value"))
    }),

    // per-source token entropy in exact floor-nano nats (NEW r11):
    // the corpus-diversity dashboard — each term is an exact function
    // of (cnt, N) so the integer sum is association-order-free and
    // the whole frame hash-gates
    "q229_token_entropy_by" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"),
          explode(split(Dedup.normText(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      graft.ops.Corpus.tokenEntropyBy(toks, "source", "tok")
        .orderBy(col("grp"))
    }),

    // simhash signatures + near pairs
    "q93_simhash_sig" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"), simhash32(Dedup.normText(col("text"))).as("sh"))
        .orderBy(col("doc_id"))
    }),

    "q94_dedup_simhash" -> ((s, d) => {
      Dedup.simhashNearPairs(
          Tables.documents(s, d).withColumn("blk", lit(0)),
          "doc_id", "text", "blk", maxHamming = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // token n-gram jaccard near-dup pairs
    "q95_dedup_ngram_jaccard" -> ((s, d) => {
      Dedup.ngramJaccardPairs(
          Tables.documents(s, d).withColumn("blk", lit(0)),
          "doc_id", "text", "blk", ngram = 3, minJaccard = 0.3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // same pairs through the stop-gram-capped path (maxDf quarantines
    // hot posting lists — the 100 TB skew guard): the oracle is the SAME
    // exact full-jaccard SQL as q95, so the gate proves the cap changes
    // the plan, never the result
    "q95b_ngram_jaccard_capped" -> ((s, d) => {
      // maxUnsafeFrac=1.0: this query deliberately runs the cap on its
      // documented worst case (at sf0.1 every doc is hot-heavy under
      // maxDf=8, the shape the default guard exists to refuse) to prove
      // exactness; real pipelines keep the 0.5 default and scale maxDf
      // with the corpus (~a fixed df FRACTION, like 2% of docs).
      Dedup.ngramJaccardPairs(
          Tables.documents(s, d).withColumn("blk", lit(0)),
          "doc_id", "text", "blk", ngram = 3, minJaccard = 0.3, maxDf = 8,
          maxUnsafeFrac = 1.0)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // all-pairs TF-IDF cosine similarity join (Bayardo-style): sparse
    // tf-idf vectors, posting-list candidate generation, maxDf stop-term
    // cap bounding per-term fan-out; idf rounded before any product so
    // the DuckDB replay is deterministic
    "q95c_tfidf_cosine_pairs" -> ((s, d) => {
      Dedup.tfidfCosinePairs(Tables.documents(s, d), "doc_id", "text",
          minCosine = 0.3, maxDf = 100)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // embedding cosine near-dup pairs (exact tier)
    "q96_dedup_embedding" -> ((s, d) => {
      Dedup.embeddingNearPairs(Tables.embeddings(s, d), "vec_id", "embedding",
          minCosine = 0.4, blockBits = 0)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // the SCALE tier of the same op: signed-random-projection blocking
    // (q98's replayable bucket function) — only same-bucket pairs are
    // compared, so the quadratic term is bounded per bucket; the oracle
    // replays bucket assignment AND the within-bucket pair scan, so the
    // recall trade of the blocked tier is itself hash-gated
    "q96b_dedup_embedding_blocked" -> ((s, d) => {
      Dedup.embeddingNearPairs(Tables.embeddings(s, d), "vec_id", "embedding",
          minCosine = 0.4, blockBits = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- similarity search (M6c) ------------------------------------
    "q97_ann_bruteforce" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // mutual nearest-neighbor pairs (NEW r11): the bitext-mining
    // primitive — even-id vectors as corpus A, odd-id as corpus B;
    // emit (a, b) iff each is the other's top-1 across the split.
    // Scores computed once, two rank-1 windows, a semi-join keeps the
    // mutual pairs; rounded cosine → full hash gate
    // deterministic negative sampling (NEW r11): k=4 negatives per
    // anchor from the 2^32 hash ring — Knuth-multiplicative positions,
    // bucketed forward-successor lookup (one equi-join + argmin, no
    // RNG, no sorted structure), pure 64-bit integers → hash-gates
    "q240_negative_sample" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.negativeSampleRing(emb, "vec_id",
          emb.filter(col("vec_id") % 20 === 0), "vec_id",
          k = 4, bucketBits = 6)
        .orderBy(col("anchor_id"), col("j"))
    }),

    "q234_mutual_nn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.mutualNearestPairs(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding")
        .orderBy(col("a_id"))
    }),

    // margin-scored bitext mining (NEW r12): Artetxe & Schwenk's ratio
    // margin over the q234 split — rank-1 BY MARGIN per anchor, scored
    // against both endpoints' top-4 neighborhoods; micro-unit floors
    // make the neighborhood sums integer and the margin one integer
    // division, so the whole frame hash-gates
    "q244_margin_bitext" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.marginMinedPairs(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4, minMarginPpm = 1000000L)
        .orderBy(col("a_id"))
    }),

    // the SCALE tier of q244 (NEW r13): candidate pairs per direction
    // come from the IVF coarse quantizer (k-means on the searched
    // side, nProbe=2 probes) instead of the full a×b score matrix —
    // the oracle re-runs BOTH k-means chains, assignment, probe
    // selection, in-probe micro-unit scoring and the margin fold in
    // SQL, so the IVF recall trade is itself hash-gated (q96b's
    // discipline applied to bitext mining)
    "q244b_margin_bitext_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.marginMinedPairsIvf(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4, minMarginPpm = 1000000L,
          nClusters = 8, nProbe = 2, itersCoarse = 3)
        .orderBy(col("a_id"))
    }),

    // MMR diversity re-rank (NEW r8): brute-force top-10 candidates →
    // greedy λ·rel − (1−λ)·max-sim-to-selected, k=3. The re-rank step
    // between candidate generation and serving; oracle unrolls the
    // three greedy steps (argmax with the same lowest-n_id tie-break).
    "q97b_mmr_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cand = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3),
          "vec_id", "embedding", k = 10)
        .select(col("q_id"), col("n_id"), col("cos").as("rel"))
      Similarity.mmrRerank(cand, emb, "vec_id", "embedding", k = 3, lambda = 0.5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Reciprocal-rank fusion (NEW r8): exact brute-force top-5 fused
    // with the LSH-bucket top-3 — the hybrid-retrieval combiner.
    // Per-ranker 1/(60+rnk) terms summed in ranker order, fused score
    // floored to ppm before the final ordering.
    "q97c_rrf_fusion" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 3)
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5)
        .select(col("q_id"), col("n_id"), col("rnk"))
      val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", k = 3, nBits = 4)
        .select(col("q_id"), col("n_id"), col("rnk"))
      Similarity.rrfFuse(Seq(exact, lsh), k = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    "q98_ann_lsh_buckets" -> ((s, d) => {
      Similarity.withBucket(Tables.embeddings(s, d), "embedding", nBits = 4)
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    "q99_ann_lsh_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding",
          k = 3, nBits = 4)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // IVF ANN with a LEARNED coarse quantizer: deterministic k-means
    // (lowest-id seeds, fixed rounds) → nearest-centroid assignment →
    // probe nProbe clusters only. Fully hash-gated: the oracle unrolls
    // the same k-means in DuckDB CTEs (float-cast means absorb last-ulp
    // noise, as in q145) and replays probe + top-k; recall-vs-brute-
    // force stays asserted in OpsSpec.
    "q99b_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopKLearned(emb, emb.filter(col("vec_id") < 3),
          "vec_id", "embedding", k = 3, nClusters = 8, nProbe = 2)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // farthest-point-seeded IVF at FULL probe == the exact tier (NEW
    // r14): hash-anchored maxmin seeding replaces lowest-id seeds
    // (which collapse when ids correlate with embedding-space position
    // — OpsSpec has the collapsing fixture). Probing every cluster
    // makes the result seed-independent, so the exact brute-force
    // top-k is the oracle and the whole seeded chain (seed → assign →
    // centroid means → probe → search) is gated end-to-end.
    "q274_ann_ivf_seeded" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopKLearned(emb, emb.filter(col("vec_id") < 3),
          "vec_id", "embedding", k = 5, nClusters = 8, nProbe = 8,
          iters = 2, seeding = "farthest")
        .orderBy(col("q_id"), col("rnk"))
    }),

    // Product-quantization ANN (NEW r8): per-subspace deterministic
    // k-means codebooks → 8-byte-per-subspace codes → asymmetric-
    // distance top-k over the RECONSTRUCTED vectors. The scan side
    // reads 32 B of codes per vector instead of 256 B of floats — the
    // memory-bandwidth tier a 100 TB corpus runs. Fully hash-gated:
    // the oracle unrolls all four subspace k-means chains in DuckDB
    // CTEs and replays code assignment + the single index-order
    // dot(q, reconstruction) sum.
    "q99c_ann_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopKLearned(emb, emb.filter(col("vec_id") < 3),
          "vec_id", "embedding", dim = 64, k = 3, nSub = 4, nCodes = 8, iters = 2)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // IVF-PQ composition (NEW r8, FAISS IVFADC shape): learned coarse
    // quantizer prunes to nProbe clusters, ADC over PQ codes ranks
    // inside them. Hash-gated end-to-end: coarse k-means chain + all
    // four subspace chains + probe + reconstruction replayed in one
    // DuckDB WITH.
    "q99d_ann_ivfpq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfPqTopKLearned(emb, emb.filter(col("vec_id") < 3),
          "vec_id", "embedding", dim = 64, k = 3, nClusters = 8, nProbe = 2,
          nSub = 4, nCodes = 8)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // IVF-SQ composition (NEW r9, FAISS IVFScalarQuantizer shape):
    // learned coarse quantizer prunes to nProbe clusters, 1 B/dim SQ8
    // code-dots rank inside them — all-integer scores, so the whole
    // result hash-gates (IVF-PQ's double ADC needed ROUND); completes
    // the {flat, PQ, SQ8} × {exhaustive, IVF} tier matrix
    "q217_ann_ivfsq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfSqTopKLearned(emb, emb.filter(col("vec_id") < 3),
          "vec_id", "embedding", k = 3, nClusters = 8, nProbe = 2)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // SQ8 scalar quantization ANN (NEW r9): the simplest compression
    // tier — per-tensor symmetric int8 codes (ONE global scale; per-dim
    // affine is deliberately not offered for search, see sqAssign),
    // top-k by exact BIGINT code-dot. Unlike the float-cosine tiers the
    // ENTIRE result hash-gates (integer scores); recall is spec-gated
    "q213_ann_sq8" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.sqTopKLearned(emb, emb.filter(col("vec_id") < 3),
          "vec_id", "embedding", k = 5)
        .orderBy(col("q_id"), col("rnk"))
    }),

    // ---- text analysis (M6d) ----------------------------------------
    // code-switching profile (NEW r12): sentence-level language
    // mixture per doc — dominant language, its share in floor bp, and
    // mixture entropy in floor-nano nats; the filter doc-level langid
    // (q100) cannot provide
    "q258_code_switch" -> ((s, d) => {
      TextAnalysis.codeSwitchProfile(
          Tables.spread(Tables.documents(s, d), "doc_id"),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // corpus audit fingerprint (NEW r13): per-source row count + XOR
    // and SUM of the shared polynomial row hash — both folds
    // commutative/associative, so the fingerprint is identical under
    // any partitioning or shard merge: the one-scan "did the copy
    // preserve every row" integrity check a 100 TB migration runs on
    // both sides
    "q267_audit_fingerprint" -> ((s, d) => {
      graft.ops.Validate.auditFingerprint(Tables.documents(s, d),
          "source", Seq("doc_id", "text", "lang"))
        .orderBy(col("grp"))
    }),

    // PII scan (NEW r13): per-doc counts of emails / phones / IPv4s /
    // 16-digit card candidates with an integer Luhn checksum — the
    // pre-training privacy audit. The synthetic fixtures carry no real
    // PII, so the gate synthesizes every class deterministically from
    // the customer key space (built identically in the oracle); the
    // Luhn subset varies by key, so the checksum actually
    // discriminates
    "q265_pii_scan" -> ((s, d) => {
      TextAnalysis.piiScan(piiDocs(s, d), "c_custkey", "t")
        .orderBy(col("c_custkey"))
    }),

    // PII redaction (NEW r13): the write-side pass — fixed-order typed
    // placeholders, whole redacted text gated by md5
    "q265b_pii_redact" -> ((s, d) => {
      piiDocs(s, d)
        .select(col("c_custkey"),
          md5(TextAnalysis.piiRedact(col("t"))).as("redacted_md5"))
        .orderBy(col("c_custkey"))
    }),

    // extended PII classes (NEW r14, verdict item 7 + r13 ADVICE):
    // local NNN-NNN-NNNN phones, SSNs with the SSA issuable-range
    // split, IBANs with the mod-97 split — raw vs valid counts per
    // class, both engines computing the checksums independently
    "q265c_pii_extended" -> ((s, d) => {
      TextAnalysis.piiScanExtended(piiDocs2(s, d), "c_custkey", "t")
        .orderBy(col("c_custkey"))
    }),

    // redaction over the extended classes: <SSN>/<IBAN> placeholders
    // exercised, whole text md5-gated
    "q265d_pii_redact_extended" -> ((s, d) => {
      piiDocs2(s, d)
        .select(col("c_custkey"),
          md5(TextAnalysis.piiRedact(col("t"))).as("redacted_md5"))
        .orderBy(col("c_custkey"))
    }),

    "q100_text_langid" -> ((s, d) => {
      Tables.spread(Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langIdCol(col("text")).as("pred_lang"))
        .orderBy(col("doc_id"))
    }),

    "q101_text_quality" -> ((s, d) => {
      TextAnalysis.qualityColumns(Tables.spread(Tables.documents(s, d), "doc_id"), "text")
        .select(col("doc_id"), col("n_chars_m"), col("n_tokens"), col("ttr"),
          col("avg_tok_len"), col("stop_ratio"), col("digit_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Gopher/MassiveText quality-filter ruleset (NEW r8): per-rule
    // boolean verdicts over integer-exact counts; scan-only plan.
    "q101b_gopher_rules" -> ((s, d) => {
      TextAnalysis.gopherRules(Tables.spread(Tables.documents(s, d), "doc_id"),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Gopher/MassiveText REPETITION rules (NEW r15): the other half
    // of the published §A1.1 filter table — dup-line shares, top
    // 2/3/4-gram char share, dup 5..10-gram char share, all floor
    // basis points of exact integer counts, pass thresholds verbatim
    // from the paper. One (doc, n, gram) explode; argmax per (doc, n)
    // rides a doc-partitioned window
    "q297_gopher_repetition" -> ((s, d) => {
      TextAnalysis.gopherRepetition(
          Tables.documents(s, d).filter(col("doc_id") % 3 === 0),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // hash-keyed census tier of q297 (r15 verdict item 2): the gram
    // string never enters the exchange — polyHash + char count project
    // map-side, 8-byte keys shuffle, tie-break (cnt DESC, hash ASC).
    // Same doc slice as q297: absent hash collisions the outputs are
    // identical (TextAnalysisSpec asserts it); the oracle replays the
    // hash so the gate holds bit-for-bit even with collisions.
    "q297b_gopher_repetition_hashed" -> ((s, d) => {
      TextAnalysis.gopherRepetitionHashed(
          Tables.documents(s, d).filter(col("doc_id") % 3 === 0),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // distinct-n lexical diversity (NEW r15): dist-1/2/3 ratios — the
    // generation-side mirror of q297's filter shares; floor bp of
    // exact distinct/total n-gram counts, same lead/stack kernel
    "q299_distinct_ngrams" -> ((s, d) => {
      TextAnalysis.distinctNgramRatios(
          Tables.documents(s, d).filter(col("doc_id") % 5 === 0),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q102_text_tokens" -> ((s, d) => {
      Tables.spread(Tables.documents(s, d), "doc_id")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
          TextAnalysis.regexTokenCount(col("text")).as("n_re_tokens"),
          size(TextAnalysis.tokenNgrams(col("text"), 2)).as("n_bigrams"))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition quality filters (top-gram / dup-gram
    // fractions over non-distinct bigrams)
    "q104_text_repetition" -> ((s, d) => {
      TextAnalysis.repetitionStats(Tables.documents(s, d), "doc_id", "text", n = 2)
        .orderBy(col("doc_id"))
    }),

    "q103_text_fingerprint" -> ((s, d) => {
      Tables.spread(Tables.documents(s, d), "doc_id")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"),
          md5(Dedup.normText(col("text"))).as("md5_fp"))
        .orderBy(col("doc_id"))
    }),

    // nvtext character_ngrams parity
    "q106_char_ngrams" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") % 17 === 0)
        .select(col("doc_id"),
          size(TextAnalysis.charNgrams(col("text"), 3)).as("n3"),
          size(TextAnalysis.charNgrams(col("text"), 5)).as("n5"),
          array_join(slice(array_sort(TextAnalysis.charNgrams(col("text"), 3)), 1, 3), "|").as("first3"))
        .orderBy(col("doc_id"))
    }),

    // nvtext code_points parity
    "q107_code_points" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") % 29 === 0)
        .select(col("doc_id"),
          array_join(TextAnalysis.codePoints(substring(col("text"), 1, 40)), ",").as("cps"),
          size(TextAnalysis.codePoints(col("text"))).as("n_cp"))
        .orderBy(col("doc_id"))
    }),

    // nvtext porter_stemmer parity — no DuckDB-side stemmer offline (fts
    // extension can't install), so the gate stems the canonical Porter
    // 1980 golden words through the engine and the oracle IS the golden
    // table (VALUES list): any stemmer regression now hash-mismatches.
    "q108_porter_stem" -> ((s, d) => {
      import s.implicits._
      porterGolden.map(_._1).toDF("tok")
        .select(col("tok"), TextAnalysis.porterStem(col("tok")).as("stem"))
        .orderBy(col("tok"))
    }),

    // nvtext subword_tokenize parity: greedy longest-match-first
    // WordPiece against the embedded vocab, one compiled-UDF map stage;
    // oracle replays the SAME greedy walk as a DuckDB recursive CTE
    // over the distinct-word set
    "q109_subword_tokenize" -> ((s, d) => {
      TextAnalysis.wordpieceTokenize(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // tokenizer fertility report (NEW r8): per-source tokens-per-word,
    // chars-per-token and UNK rate of the wordpiece tokenizer — the
    // eval every tokenizer swap is judged by (fertility spikes on a
    // source = vocabulary mismatch = wasted sequence length there)
    "q196_tokenizer_fertility" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val wp = TextAnalysis.wordpieceTokenize(docs, "doc_id", "text")
      val chars = docs.select(col("doc_id"), col("source"),
        length(graft.ops.Dedup.normText(col("text"))).cast("long").as("n_chars"))
      wp.join(chars, "doc_id")
        .groupBy(col("source"))
        .agg(sum(col("n_words").cast("long")).as("words"),
          sum(col("n_tokens").cast("long")).as("tokens"),
          sum(col("n_unk").cast("long")).as("unks"),
          sum(col("n_chars")).as("chars"))
        .select(col("source"), col("words"), col("tokens"), col("unks"),
          col("chars"),
          expr("(10000 * tokens) div nullif(words, 0L)").as("fertility_bp"),
          expr("(100 * chars) div nullif(tokens, 0L)").as("chars_per_token_c"),
          expr("(10000 * unks) div nullif(tokens, 0L)").as("unk_bp"))
        .orderBy(col("source"))
    }),

    // BPE merge LEARNING (tokenizer training — the counterpart to
    // q109's vocab-driven application): 10 iterations over the
    // word-frequency dictionary; each = one bounded-key shuffle +
    // a 1-row driver argmax + a map-side replace. Oracle unrolls the
    // identical 10 iterations as MATERIALIZED CTE stages.
    "q162_bpe_learn" -> ((s, d) => {
      graft.ops.Bpe.learnMerges(Tables.documents(s, d), "text", nMerges = 10)
    }),

    // BPE encode with the just-learned rules: broadcast dictionary
    // join — the corpus text never shuffles
    "q162b_bpe_encode" -> ((s, d) => {
      graft.ops.Bpe.encode(Tables.documents(s, d), "doc_id", "text",
          nMerges = 10)
        .orderBy(col("doc_id"))
    }),

    // tokenizer fertility per language (NEW r17): subwords-per-word
    // under the just-learned BPE — THE multilingual tokenizer-eval
    // number (vocab-size / language-coverage decisions read it before
    // any model trains); pure composition of the gated encode with a
    // per-lang rollup, floor basis points
    "q162c_tokenizer_fertility" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Bpe.encode(docs, "doc_id", "text", nMerges = 10)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(col("n_subwords")).as("n_subwords"))
        .withColumn("fertility_bp", expr("(10000 * n_subwords) div n_words"))
        .orderBy(col("lang"))
    }),

    // nvtext replace_tokens parity: literal-map lookup in one
    // transform — codegen'd, scale-free
    "q163_replace_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") % 13 === 0)
        .select(col("doc_id"),
          TextAnalysis.replaceTokens(col("text"),
            Seq("the", "and", "of"), Seq("THE", "AND", "OF")).as("replaced"))
        .orderBy(col("doc_id"))
    }),

    // nvtext filter_tokens parity: both variants (drop vs marker)
    "q164_filter_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") % 13 === 0)
        .select(col("doc_id"),
          TextAnalysis.filterTokens(col("text"), 4).as("dropped"),
          TextAnalysis.filterTokens(col("text"), 4, "_").as("marked"))
        .orderBy(col("doc_id"))
    }),

    // nvtext character_tokenize parity: row-per-character with
    // position (bounded: first 25 chars of a doc slice)
    "q165_char_tokenize" -> ((s, d) => {
      TextAnalysis.characterTokenize(
          Tables.documents(s, d).filter(col("doc_id") % 29 === 0)
            .select(col("doc_id"), substring(col("text"), 1, 25).as("text")),
          "doc_id", "text")
        .orderBy(col("doc_id"), col("pos"))
    }),

    // nvtext detokenize parity: tokenize → detokenize round-trip must
    // reproduce the normalized text (identity oracle)
    "q166_detokenize" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(filter(
          split(TextAnalysis.norm(col("text")), " "),
          x => length(x) > 0)).as(Seq("pos", "tok")))
      TextAnalysis.detokenize(toks, "doc_id", "pos", "tok")
        .orderBy(col("doc_id"))
    }),

    // nvtext edit_distance_matrix parity: all-pairs Levenshtein over
    // the 25 nation names (N^2 by definition — bounded input)
    "q167_edit_distance_matrix" -> ((s, d) => {
      TextAnalysis.editDistanceMatrix(
          Tables.nation(s, d).select(lower(col("n_name")).as("v")), "v")
        .orderBy(col("a"), col("b"))
    }),

    // nvtext tokenize_with_vocabulary parity: top-40 corpus words by
    // (count desc, word) as the vocab, OOV -> -1; vocab broadcast,
    // corpus never shuffles before the id re-collect
    "q168_vocab_tokenize" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val vocab = docs
        .select(explode(filter(split(TextAnalysis.norm(col("text")), " "),
          x => length(x) > 0)).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word")).limit(40)
        .select(col("word"),
          (row_number().over(Window.orderBy(col("cnt").desc, col("word"))) - 1)
            .as("vocab_id"))
      TextAnalysis.tokenizeWithVocabulary(
          docs.filter(col("doc_id") % 13 === 0), "doc_id", "text", vocab)
        .orderBy(col("doc_id"))
    }),

    // Viterbi unigram segmentation (NEW r8): OPTIMAL (cost, pieces)-
    // lexicographic DP over a derived integer-cost vocabulary — the
    // SentencePiece-unigram counterpart of q168's greedy matcher.
    // Vocab: top-20 words @100, top-30 char bigrams @250, all chars
    // @300 (dupes keep min cost); integer costs make the DP bit-exact,
    // and the oracle enumerates every segmentation path of each
    // DISTINCT word via a recursive CTE and takes the same argmin.
    "q170_viterbi_tokenize" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d), "doc_id")
      val words = docs
        .select(explode(split(TextAnalysis.norm(col("text")), " ")).as("w"))
        .filter(length(col("w")) > 0)
      val topWords = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w").asc).limit(20)
        .select(col("w").as("piece"), lit(100L).as("cost"))
      val bigrams = words.filter(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("g").asc).limit(30)
        .select(col("g").as("piece"), lit(250L).as("cost"))
      val chars = words
        .select(explode(expr(
          "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("ch"))
        .distinct()
        .select(col("ch").as("piece"), lit(300L).as("cost"))
      val vocab = topWords.unionByName(bigrams).unionByName(chars)
        .groupBy(col("piece")).agg(min(col("cost")).as("cost"))
      TextAnalysis.viterbiSegment(docs, "doc_id", "text", vocab)
        .orderBy(col("doc_id"))
    }),

    // unigram-LM vocabulary TRAINING (NEW r15): the SentencePiece
    // ESTIMATOR q170 was missing — deterministic hard-EM (Viterbi-EM):
    // bounded seed (chars + top-40 bigrams + top-20 trigrams + top-10
    // words), 2 EM iterations of exact argmin-path segmentation with
    // the (cost, np, path) total-order tie-break, floor-micro log
    // costs, chars-always-kept prune to top-24 longer pieces. The
    // oracle unrolls BOTH EM iterations as recursive-CTE path
    // enumerations and takes the identical argmin — the learned
    // vocabulary table hash-gates bit-for-bit.
    "q292_unigram_train" -> ((s, d) => {
      graft.ops.Bpe.unigramTrainEm(Tables.documents(s, d), "text")
        .orderBy(col("piece"))
    }),

    // q170 re-gated over the LEARNED vocabulary (NEW r15): inference
    // with the vocabulary q292 just estimated — the full train→apply
    // loop a tokenizer pipeline runs, end-to-end in one plan
    "q292b_viterbi_learned" -> ((s, d) => {
      val docs = Tables.spread(Tables.documents(s, d), "doc_id")
      val vocab = graft.ops.Bpe.unigramTrainEm(docs, "text")
      TextAnalysis.viterbiSegment(docs, "doc_id", "text", vocab)
        .orderBy(col("doc_id"))
    }),

    // ---- multimodal plumbing (M6; REAL header decode since r14) -----
    // blobs carry byte-valid PNG/JPEG/GIF headers (correct magics, PNG
    // CRC32, JPEG marker segments) and the dims below are PARSED from
    // those bytes — the oracle replays the synthesis arithmetic, so a
    // parse that read the wrong offsets would hash-mismatch
    "q105_multimodal_features" -> ((s, d) => {
      val withMedia = Multimodal.withMediaColumn(Tables.documents(s, d), "doc_id", "text")
      Multimodal.extractFeatures(s, withMedia, "doc_id")
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("format"), col("width"),
          col("height"), round(col("brightness"), 6).as("brightness"))
        .orderBy(col("doc_id"))
    }),

    // aspect-preserving resize plan over the header-decoded dimensions
    "q105b_multimodal_resize" -> ((s, d) => {
      val withMedia = Multimodal.withMediaColumn(Tables.documents(s, d), "doc_id", "text")
      Multimodal.resizePlan(Multimodal.extractFeatures(s, withMedia, "doc_id").toDF())
        .orderBy(col("doc_id"))
    }),

    // malformed-header fallback: blobs truncated to doc_id % 24 bytes —
    // recognized magic with an incomplete header degrades to
    // (format, -1, -1), unrecognized magic to "unknown"; GIF's 13-byte
    // logical screen descriptor is the only header short enough to
    // still yield real dims under the truncation
    "q105e_media_malformed" -> ((s, d) => {
      val withMedia = Multimodal.withMediaColumn(Tables.documents(s, d), "doc_id", "text")
        .withColumn("media",
          expr("substring(media, 1, cast(doc_id % 24 as int))"))
      Multimodal.extractFeatures(s, withMedia, "doc_id").toDF()
        .select(col("doc_id"), col("n_bytes"), col("format"),
          col("width"), col("height"))
        .orderBy(col("doc_id"))
    }),

    // frame sampling: every 3rd 256-char frame of the blob
    "q105c_multimodal_frames" -> ((s, d) => {
      Multimodal.sampleFrames(
          Tables.documents(s, d).filter(col("doc_id") % 11 === 0), "doc_id", "text")
        .select(col("doc_id"), col("frame_idx"),
          length(col("frame")).as("frame_chars"),
          substring(col("frame"), 1, 12).as("head12"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // audio resample + training-window plan (metadata synthesized — no
    // codecs in this container; the plan arithmetic is the real logic)
    "q105d_audio_resample" -> ((s, d) => {
      Multimodal.audioResamplePlan(Tables.documents(s, d), "doc_id")
        .orderBy(col("doc_id"))
    }),

    // REAL WAV header decode (NEW r14, the audio counterpart of the
    // q105 image de-stub): blobs carry byte-valid RIFF/WAVE structure
    // and channels/rate/bits/frames below are PARSED via a chunk SCAN
    // (every 5th blob has a LIST chunk before fmt_, so a fixed-offset
    // reader would mis-parse); oracle replays the synthesis arithmetic
    "q288_audio_header" -> ((s, d) => {
      val withAudio = Multimodal.withAudioColumn(
        Tables.documents(s, d), "doc_id", "text")
      Multimodal.extractAudioFeatures(s, withAudio, "doc_id")
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("format"),
          col("channels"), col("sample_rate"), col("bits"),
          col("n_frames"), col("duration_ms"),
          round(col("amplitude"), 6).as("amplitude"))
        .orderBy(col("doc_id"))
    }),

    // REAL MP4 box-tree decode (NEW r15, the video leg of the de-stub
    // arc): blobs carry byte-valid ISO BMFF structure and every field
    // below is PARSED by the recursive box scan — moov→mvhd
    // (timescale/duration), trak→tkhd (16.16 dims), mdia→mdhd +
    // stbl→stts (fps and frame count). Every 5th blob has free/udta
    // boxes shifting offsets, so a fixed-offset reader mis-parses;
    // the oracle replays the synthesis arithmetic
    "q293_video_header" -> ((s, d) => {
      val withVideo = Multimodal.withVideoColumn(
        Tables.documents(s, d), "doc_id", "text")
      Multimodal.extractVideoFeatures(s, withVideo, "doc_id")
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("format"),
          col("movie_timescale"), col("duration_ms"), col("width"),
          col("height"), col("fps_milli"), col("n_frames"))
        .orderBy(col("doc_id"))
    }),

    // frame sampling driven by the PARSED stts/mdhd metadata (NEW
    // r15): q105c's plan with frame count and period read out of the
    // container instead of synthesized — every 4th frame index with
    // its integer presentation timestamp
    "q293b_video_frames" -> ((s, d) => {
      Multimodal.sampleVideoFrames(s,
          Tables.documents(s, d).filter(col("doc_id") % 7 === 0),
          "doc_id", "text")
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // ---- embedding linalg (PCA-whitening prep) -----------------------
    // distributed Gramian X^T X of the embedding table in integer
    // micro-units: one scan, per-partition local d(d+1)/2 accumulation,
    // shuffle size independent of row count
    "q172_gramian" -> ((s, d) => {
      Linalg.gramianMicro(Tables.embeddings(s, d), "embedding", dim = 64)
        .orderBy(col("i"), col("j"))
    }),

    // per-dimension sums + count (the mean vector of the same space)
    "q172b_column_sums" -> ((s, d) => {
      Linalg.columnSumsMicro(Tables.embeddings(s, d), "embedding", dim = 64)
        .orderBy(col("i"))
    }),

    // PCA top-component projection (NEW r10), fully hash-gated: the
    // eigenvector comes from INTEGER power iteration in milli-units
    // over the micro-unit Gramian (6 exact rounds, truncating rescale
    // by max|w|), the projection is Σ floor(x_i·1e6)·v_i — every step
    // 64-bit integer arithmetic the oracle unrolls bit-for-bit. The
    // deterministic upgrade of the spec-gated double topEigen tier
    "q222_pca_projection" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val gram = Linalg.gramianMicro(emb, "embedding", dim = 64)
      val v = Linalg.topEigenMilli(gram, dim = 64, iterations = 6)
      Linalg.projectMicroMilli(emb, "embedding", v)
        .select(col("vec_id"), col("proj"))
        .orderBy(col("vec_id"))
    }),

    // PCA WHITENING, self-proving gate (NEW r15): the full whitening
    // loop gramianMicro's scaladoc promised — top-8 eigenbasis by
    // subspace iteration over the exact integer Gramian, vectors
    // projected through √n/√λ-scaled components, then the IDENTITY
    // CLAIM (whitened Gramian = n·I) re-verified IN SPARK with the
    // exact integer Gramian of the whitened table. Flags gate (the
    // q209b discipline); one broken eigenvector/λ/orthogonality → 0
    "q296_pca_whiten" -> ((s, d) => {
      Linalg.pcaWhitenCheck(Tables.embeddings(s, d), "embedding",
          dim = 64, r = 8)
        .select(col("i"), col("j"), col("ok_identity"), col("ok_order"))
        .orderBy(col("i"), col("j"))
    }),

    // ---- multi-keyword tagging (Aho–Corasick, one text pass) ---------
    // literal patterns incl. a cross-word phrase and a mid-word
    // substring; non-overlapping replace-count semantics so REPLACE
    // replays it exactly
    "q173_keyword_tags" -> ((s, d) => {
      Keywords.tagKeywords(Tables.documents(s, d), "doc_id", "text",
          Seq("spark", "merge", "a a", "art", "customer query"))
        .orderBy(col("doc_id"), col("keyword"))
    }),

    // blocklist-score rollup of the same pass
    "q173b_keyword_summary" -> ((s, d) => {
      Keywords.keywordSummary(Tables.documents(s, d), "doc_id", "text",
          Seq("spark", "merge", "a a", "art", "customer query"))
        .orderBy(col("doc_id"))
    })
  )

  /** DuckDB CTE prefix replaying [[graft.ops.Bpe]] training: w0/t0 =
    * the char-tokenized word-frequency dictionary, then per iteration
    * k: pair counts (lateral index comprehension), the argmax rule
    * m{k} (same count-desc/(l,r)-asc tiebreak), and the two-pass
    * delimiter-guarded replace t{k}. MATERIALIZED keeps the
    * doubly-referenced t{k-1} from inlining exponentially.
    */
  private def bpeCtes(nMerges: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH w0 AS MATERIALIZED (SELECT w, COUNT(*) AS cnt FROM
         |    (SELECT unnest(string_split($sqlNorm, ' ')) AS w FROM documents)
         |  WHERE len(w) > 0 GROUP BY w),
         |t0 AS MATERIALIZED (SELECT w, cnt,
         |  TRIM(REGEXP_REPLACE(w, '(.)', '\\1 ', 'g')) AS toks FROM w0)""".stripMargin)
    for (k <- 1 to nMerges) {
      sb.append(s""",
         |x$k AS (SELECT string_split(toks, ' ') AS ls, cnt FROM t${k - 1}),
         |p$k AS (SELECT ls[u.i] AS l, ls[u.i + 1] AS r, SUM(cnt) AS c
         |  FROM x$k, UNNEST([i for i in range(1, len(ls))]) AS u(i)
         |  GROUP BY 1, 2),
         |m$k AS MATERIALIZED (SELECT l, r, CAST(c AS BIGINT) AS c FROM p$k
         |  ORDER BY c DESC, l ASC, r ASC LIMIT 1),
         |t$k AS MATERIALIZED (SELECT w, cnt, TRIM(REPLACE(REPLACE(
         |    ' ' || toks || ' ', ' ' || l || ' ' || r || ' ', ' ' || l || r || ' '),
         |    ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ')) AS toks
         |  FROM t${k - 1}, m$k)""".stripMargin)
    }
    sb.toString
  }

  override def oracle: Map[String, String] = {
    val minhashCtes = sqlMinhashCtes()
    // LSH pairs → min-id components via recursive CTE; shared verbatim
    // by q92b and q92d, whose two CC algorithms must agree exactly
    val clustersOracleSql = {
      val bandSelects = (0 until 4).map { b =>
        val key = (0 until 4).map(r => s"CAST(sig[${b * 4 + r + 1}] AS VARCHAR)").mkString(" || '-' || ")
        s"SELECT doc_id, $b AS band, $key AS bkey FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""WITH RECURSIVE $minhashCtes,
         |banded AS (
         |  $bandSelects
         |),
         |cpairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |),
         |near AS (
         |  SELECT id_a, id_b FROM cpairs p
         |  JOIN sig sa ON sa.doc_id = p.id_a JOIN sig sb ON sb.doc_id = p.id_b
         |  WHERE list_sum(list_transform(range(1, 17),
         |    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 16.0 >= 0.9
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM near
         |  UNION ALL SELECT id_b, id_a FROM near
         |),
         |reach(id, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
         |)
         |SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id ORDER BY id""".stripMargin
    }
    Map(
      "q255_record_linkage" ->
        // same null-safe equality (IS NOT DISTINCT FROM) and integer
        // weight sums; score cast BIGINT to match the Spark long
        """WITH c AS (SELECT c_custkey, c_nationkey, c_mktsegment,
          |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket
          |  FROM customer),
          |a AS (SELECT * FROM c WHERE c_custkey % 2 = 0),
          |b AS (SELECT * FROM c WHERE c_custkey % 2 = 1),
          |p AS (SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
          |    CAST(CASE WHEN a.c_mktsegment IS NOT DISTINCT FROM
          |        b.c_mktsegment THEN 1500 ELSE -800 END
          |      + CASE WHEN a.bal_bucket IS NOT DISTINCT FROM
          |        b.bal_bucket THEN 2500 ELSE -1200 END AS BIGINT)
          |      AS score_milli,
          |    CASE WHEN a.c_mktsegment IS NOT DISTINCT FROM
          |        b.c_mktsegment THEN 1 ELSE 0 END
          |      + CASE WHEN a.bal_bucket IS NOT DISTINCT FROM
          |        b.bal_bucket THEN 1 ELSE 0 END AS n_agree
          |  FROM a JOIN b ON a.c_nationkey = b.c_nationkey)
          |SELECT a_id, b_id, n_agree, score_milli FROM p
          |WHERE score_milli >= 1700 ORDER BY a_id, b_id""".stripMargin,

      // q255c: q255's pair replay at the both-agree threshold, then
      // the q92b recursive min-label closure and the entity census
      "q255c_entity_resolution" ->
        """WITH RECURSIVE c AS (SELECT c_custkey, c_nationkey,
          |    c_mktsegment,
          |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket
          |  FROM customer),
          |a AS (SELECT * FROM c WHERE c_custkey % 2 = 0),
          |b AS (SELECT * FROM c WHERE c_custkey % 2 = 1),
          |p AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
          |  FROM a JOIN b ON a.c_nationkey = b.c_nationkey
          |  WHERE (CASE WHEN a.c_mktsegment IS NOT DISTINCT FROM
          |      b.c_mktsegment THEN 1500 ELSE -800 END
          |    + CASE WHEN a.bal_bucket IS NOT DISTINCT FROM
          |      b.bal_bucket THEN 2500 ELSE -1200 END) >= 4000),
          |edges AS (SELECT id_a AS src, id_b AS dst FROM p
          |  UNION ALL SELECT id_b, id_a FROM p),
          |reach(id, lbl) AS (
          |  SELECT src, src FROM edges
          |  UNION
          |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
          |),
          |lab AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id)
          |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
          |  MAX(id) AS max_id
          |FROM lab GROUP BY cluster
          |ORDER BY n_members DESC, cluster LIMIT 100""".stripMargin,

      // q255b: the training fold replayed in SQL — agreement counts on
      // the labeled stripe pairs, add-half smoothed m/u, floor milli
      // log-ratios, then the q255 scoring join with the learned
      // weights; top-100 by (score DESC, ids)
      "q255b_linkage_learned" ->
        """WITH c AS (SELECT c_custkey, c_nationkey, c_mktsegment,
          |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
          |    SUBSTR(c_name, LENGTH(c_name), 1) AS name_tail
          |  FROM customer),
          |lab AS (SELECT
          |    (a.c_mktsegment = b.c_mktsegment) AS m,
          |    CASE WHEN a.bal_bucket IS NOT DISTINCT FROM b.bal_bucket
          |      THEN 1 ELSE 0 END AS ag1,
          |    CASE WHEN a.name_tail IS NOT DISTINCT FROM b.name_tail
          |      THEN 1 ELSE 0 END AS ag2
          |  FROM c a JOIN c b ON a.c_nationkey = b.c_nationkey
          |  WHERE a.c_custkey % 4 = 0 AND b.c_custkey % 4 = 1),
          |cnt AS (SELECT
          |    CAST(SUM(CASE WHEN m THEN ag1 ELSE 0 END) AS BIGINT) AS ma1,
          |    CAST(SUM(CASE WHEN NOT m THEN ag1 ELSE 0 END) AS BIGINT) AS ua1,
          |    CAST(SUM(CASE WHEN m THEN ag2 ELSE 0 END) AS BIGINT) AS ma2,
          |    CAST(SUM(CASE WHEN NOT m THEN ag2 ELSE 0 END) AS BIGINT) AS ua2,
          |    CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS nm,
          |    CAST(SUM(CASE WHEN NOT m THEN 1 ELSE 0 END) AS BIGINT) AS nu
          |  FROM lab),
          |w AS (SELECT
          |    CAST(FLOOR(LN(((ma1 + 0.5) / (nm + 1.0))
          |      / ((ua1 + 0.5) / (nu + 1.0))) * 1000) AS BIGINT) AS wa1,
          |    CAST(FLOOR(LN((1.0 - (ma1 + 0.5) / (nm + 1.0))
          |      / (1.0 - (ua1 + 0.5) / (nu + 1.0))) * 1000) AS BIGINT) AS wd1,
          |    CAST(FLOOR(LN(((ma2 + 0.5) / (nm + 1.0))
          |      / ((ua2 + 0.5) / (nu + 1.0))) * 1000) AS BIGINT) AS wa2,
          |    CAST(FLOOR(LN((1.0 - (ma2 + 0.5) / (nm + 1.0))
          |      / (1.0 - (ua2 + 0.5) / (nu + 1.0))) * 1000) AS BIGINT) AS wd2
          |  FROM cnt),
          |p AS (SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
          |    CASE WHEN a.bal_bucket IS NOT DISTINCT FROM b.bal_bucket
          |      THEN 1 ELSE 0 END AS g1,
          |    CASE WHEN a.name_tail IS NOT DISTINCT FROM b.name_tail
          |      THEN 1 ELSE 0 END AS g2
          |  FROM c a JOIN c b ON a.c_nationkey = b.c_nationkey
          |  WHERE a.c_custkey % 2 = 0 AND b.c_custkey % 2 = 1)
          |SELECT a_id, b_id, g1 + g2 AS n_agree,
          |  (CASE WHEN g1 = 1 THEN wa1 ELSE wd1 END
          |   + CASE WHEN g2 = 1 THEN wa2 ELSE wd2 END) AS score_milli
          |FROM p CROSS JOIN w
          |ORDER BY score_milli DESC, a_id, b_id LIMIT 100""".stripMargin,

      "q90_dedup_exact" ->
        s"""SELECT md5($sqlNorm) AS fp, COUNT(*) AS n_members, MIN(doc_id) AS keep_id
           |FROM documents GROUP BY fp ORDER BY fp LIMIT 100""".stripMargin,

      // q267: the same packed-row poly hash (U+0001 separators, U+0002
      // null sentinel), XOR/SUM folds replayed as aggregates
      "q267_audit_fingerprint" -> {
        val packed = "COALESCE(CAST(doc_id AS VARCHAR), CHR(2)) || CHR(1) || " +
          "COALESCE(text, CHR(2)) || CHR(1) || COALESCE(lang, CHR(2))"
        s"""WITH h AS (SELECT CAST(source AS VARCHAR) AS grp,
           |    ${sqlPoly(packed)} AS h
           |  FROM documents)
           |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(BIT_XOR(h) AS BIGINT) AS xor_h,
           |  CAST(SUM(h) AS BIGINT) AS sum_h
           |FROM h GROUP BY grp ORDER BY grp""".stripMargin
      },

      // q265: the synthesized text rebuilt verbatim, per-class match
      // counts via regexp_extract_all, Luhn filter as an integer list
      // fold — identical arithmetic to the Spark HOF
      "q265_pii_scan" -> {
        val em = graft.ops.TextAnalysis.piiEmailRe
        val ph = graft.ops.TextAnalysis.piiPhoneRe
        val ip = graft.ops.TextAnalysis.piiIpv4Re
        val cd = graft.ops.TextAnalysis.piiCardRe
        s"""WITH p AS (SELECT c_custkey, $sqlPiiText AS t FROM customer),
           |s AS (SELECT c_custkey,
           |  CAST(LEN(regexp_extract_all(t, '$em')) AS BIGINT) AS n_email,
           |  CAST(LEN(regexp_extract_all(t, '$ph')) AS BIGINT) AS n_phone,
           |  CAST(LEN(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ipv4,
           |  CAST(LEN(regexp_extract_all(t, '$cd')) AS BIGINT) AS n_card_raw,
           |  CAST(LEN(list_filter(regexp_extract_all(t, '$cd'), c ->
           |    list_sum(list_transform(range(1, 17), i ->
           |      CASE WHEN i % 2 = 0
           |        THEN CAST(c[17 - i] AS INTEGER) * 2
           |          - CASE WHEN CAST(c[17 - i] AS INTEGER) > 4
           |            THEN 9 ELSE 0 END
           |        ELSE CAST(c[17 - i] AS INTEGER) END)) % 10 = 0))
           |    AS BIGINT) AS n_card_luhn
           |  FROM p)
           |SELECT c_custkey, n_email, n_phone, n_ipv4, n_card_raw,
           |  n_card_luhn,
           |  n_email + n_phone + n_ipv4 + n_card_luhn AS pii_total
           |FROM s ORDER BY c_custkey""".stripMargin
      },

      "q265b_pii_redact" -> {
        val em = graft.ops.TextAnalysis.piiEmailRe
        val ph = graft.ops.TextAnalysis.piiPhoneRe
        val ip = graft.ops.TextAnalysis.piiIpv4Re
        val cd = graft.ops.TextAnalysis.piiCardRe
        val sn = graft.ops.TextAnalysis.piiSsnRe
        val ib = graft.ops.TextAnalysis.piiIbanRe
        s"""WITH p AS (SELECT c_custkey, $sqlPiiText AS t FROM customer)
           |SELECT c_custkey, MD5(
           |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           |    regexp_replace(regexp_replace(
           |    t, '$em', '<EMAIL>', 'g'), '$ph', '<PHONE>', 'g'),
           |    '$sn', '<SSN>', 'g'), '$cd', '<CARD>', 'g'),
           |    '$ib', '<IBAN>', 'g'), '$ip', '<IP>', 'g')) AS redacted_md5
           |FROM p ORDER BY c_custkey""".stripMargin
      },

      // q265c/q265d: IBAN mod-97 replayed in ONE HUGEINT modulo (the
      // Spark side folds mod 97 stepwise — same number theory, no
      // overflow either way); SSN issuable ranges as integer CASEs
      "q265c_pii_extended" -> {
        val ph = graft.ops.TextAnalysis.piiPhoneRe
        val sn = graft.ops.TextAnalysis.piiSsnRe
        val ib = graft.ops.TextAnalysis.piiIbanRe
        s"""WITH p AS (SELECT c_custkey, $sqlPiiText2 AS t FROM customer),
           |s AS (SELECT c_custkey,
           |  CAST(LEN(regexp_extract_all(t, '$ph')) AS BIGINT) AS n_phone,
           |  regexp_extract_all(t, '$sn') AS ssns,
           |  regexp_extract_all(t, '$ib') AS ibans
           |  FROM p)
           |SELECT c_custkey, n_phone,
           |  CAST(LEN(ssns) AS BIGINT) AS n_ssn_raw,
           |  CAST(LEN(list_filter(ssns, c ->
           |    CAST(c[1:3] AS INTEGER) NOT IN (0, 666)
           |    AND CAST(c[1:3] AS INTEGER) < 900
           |    AND CAST(c[5:6] AS INTEGER) != 0
           |    AND CAST(c[8:11] AS INTEGER) != 0)) AS BIGINT) AS n_ssn_valid,
           |  CAST(LEN(ibans) AS BIGINT) AS n_iban_raw,
           |  CAST(LEN(list_filter(ibans, c ->
           |    CAST(list_aggregate(list_transform(
           |      string_split(c[5:] || c[1:4], ''), ch ->
           |        CASE WHEN ch BETWEEN 'A' AND 'Z'
           |          THEN CAST(ascii(ch) - 55 AS VARCHAR) ELSE ch END),
           |      'string_agg', '') AS HUGEINT) % 97 = 1)) AS BIGINT)
           |    AS n_iban_valid
           |FROM s ORDER BY c_custkey""".stripMargin
      },

      "q265d_pii_redact_extended" -> {
        val em = graft.ops.TextAnalysis.piiEmailRe
        val ph = graft.ops.TextAnalysis.piiPhoneRe
        val ip = graft.ops.TextAnalysis.piiIpv4Re
        val cd = graft.ops.TextAnalysis.piiCardRe
        val sn = graft.ops.TextAnalysis.piiSsnRe
        val ib = graft.ops.TextAnalysis.piiIbanRe
        s"""WITH p AS (SELECT c_custkey, $sqlPiiText2 AS t FROM customer)
           |SELECT c_custkey, MD5(
           |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           |    regexp_replace(regexp_replace(
           |    t, '$em', '<EMAIL>', 'g'), '$ph', '<PHONE>', 'g'),
           |    '$sn', '<SSN>', 'g'), '$cd', '<CARD>', 'g'),
           |    '$ib', '<IBAN>', 'g'), '$ip', '<IP>', 'g')) AS redacted_md5
           |FROM p ORDER BY c_custkey""".stripMargin
      },

      "q237_dup_profile" ->
        s"""WITH cl AS (SELECT md5($sqlNorm) AS fp, CAST(COUNT(*) AS BIGINT) AS sz
           |  FROM documents GROUP BY fp),
           |b AS (SELECT CAST(LENGTH(BIN(sz)) - 1 AS INTEGER) AS bucket, sz
           |  FROM cl),
           |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM documents)
           |SELECT bucket, CAST(1 AS BIGINT) << bucket AS lo_sz,
           |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
           |  CAST(SUM(sz) AS BIGINT) AS n_docs,
           |  CAST(SUM(sz - 1) AS BIGINT) AS n_redundant,
           |  CAST(MAX(sz) AS BIGINT) AS max_sz,
           |  (10000 * CAST(SUM(sz) AS BIGINT)) // t.t AS docs_bp
           |FROM b, t GROUP BY bucket, t.t ORDER BY bucket""".stripMargin,

      "q90b_dedup_incremental" ->
        s"""SELECT doc_id, lang, md5($sqlNorm) AS fp
           |FROM documents
           |WHERE doc_id % 3 <> 0 AND md5($sqlNorm) NOT IN
           |  (SELECT md5($sqlNorm) FROM documents WHERE doc_id % 3 = 0)
           |ORDER BY doc_id""".stripMargin,

      "q91_minhash_sig" ->
        s"""WITH $minhashCtes
           |SELECT doc_id, sig[1] AS mh0, sig[8] AS mh7, sig[16] AS mh15,
           |  array_to_string(sig, ',') AS sig_str
           |FROM sig WHERE doc_id % 11 = 0 ORDER BY doc_id""".stripMargin,

      "q218_kmv_distinct" ->
        s"""WITH t AS (SELECT DISTINCT ${graft.ops.Sketches.kmvScrambleSql(sqlPoly(sqlNorm))} AS h
           |  FROM documents),
           |t2 AS (SELECT h FROM t WHERE h IS NOT NULL),
           |s AS (SELECT h FROM t2 ORDER BY h LIMIT 128),
           |agg AS (SELECT COUNT(*) AS n_sketch, MAX(h) AS hk FROM s),
           |ex AS (SELECT COUNT(*) AS n_exact FROM t2)
           |SELECT agg.n_sketch,
           |  CASE WHEN agg.n_sketch < 128 THEN agg.n_sketch
           |    ELSE (127 * CAST($P AS BIGINT)) // agg.hk END AS est_distinct,
           |  ex.n_exact
           |FROM agg CROSS JOIN ex""".stripMargin,

      "q218b_kmv_distinct_by" ->
        s"""WITH t AS (SELECT DISTINCT source AS grp,
           |    ${graft.ops.Sketches.kmvScrambleSql(sqlPoly(sqlNorm))} AS h
           |  FROM documents WHERE source IS NOT NULL),
           |t2 AS (SELECT grp, h FROM t WHERE h IS NOT NULL),
           |s AS (SELECT grp, h FROM (SELECT grp, h,
           |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rk
           |  FROM t2) WHERE rk <= 64),
           |agg AS (SELECT grp, COUNT(*) AS n_sketch, MAX(h) AS hk
           |  FROM s GROUP BY grp),
           |ex AS (SELECT grp, COUNT(*) AS n_exact FROM t2 GROUP BY grp)
           |SELECT agg.grp, agg.n_sketch,
           |  CASE WHEN agg.n_sketch < 64 THEN agg.n_sketch
           |    ELSE (63 * CAST($P AS BIGINT)) // agg.hk END AS est_distinct,
           |  ex.n_exact
           |FROM agg JOIN ex ON agg.grp = ex.grp
           |ORDER BY agg.grp""".stripMargin,

      "q219b_kmv_overlap_matrix" -> {
        val h = graft.ops.Sketches.kmvScrambleSql(sqlPoly(sqlNorm))
        s"""WITH base AS (SELECT doc_id, $h AS hh FROM documents),
           |sl AS (
           |  SELECT 's01' AS grp, hh FROM base WHERE doc_id % 4 IN (0, 1)
           |  UNION ALL
           |  SELECT 's12', hh FROM base WHERE doc_id % 4 IN (1, 2)
           |  UNION ALL
           |  SELECT 's23', hh FROM base WHERE doc_id % 4 IN (2, 3)),
           |t AS (SELECT DISTINCT grp, hh AS h FROM sl WHERE hh IS NOT NULL),
           |sk AS (SELECT grp, h FROM (SELECT grp, h,
           |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rk
           |  FROM t) WHERE rk <= 64),
           |grps AS (SELECT DISTINCT grp FROM sk),
           |pairs AS (SELECT x.grp AS grp_a, y.grp AS grp_b
           |  FROM grps x JOIN grps y ON x.grp < y.grp),
           |uni AS (SELECT DISTINCT p.grp_a, p.grp_b, s.h
           |  FROM pairs p JOIN sk s ON s.grp = p.grp_a OR s.grp = p.grp_b),
           |merged AS (SELECT grp_a, grp_b, h FROM (SELECT grp_a, grp_b, h,
           |    ROW_NUMBER() OVER (PARTITION BY grp_a, grp_b ORDER BY h) AS rk
           |  FROM uni) WHERE rk <= 64),
           |agg AS (SELECT m.grp_a, m.grp_b, COUNT(*) AS k_used,
           |    CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM sk a
           |        WHERE a.grp = m.grp_a AND a.h = m.h)
           |      AND EXISTS (SELECT 1 FROM sk b
           |        WHERE b.grp = m.grp_b AND b.h = m.h)
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
           |    MAX(m.h) AS hk
           |  FROM merged m GROUP BY m.grp_a, m.grp_b)
           |SELECT grp_a, grp_b, k_used,
           |  CASE WHEN k_used = 0 THEN 0
           |    ELSE (10000 * n_both) // k_used END AS jaccard_bp,
           |  CASE WHEN k_used < 64 THEN k_used
           |    ELSE (63 * CAST($P AS BIGINT)) // hk END AS est_union,
           |  ((CASE WHEN k_used = 0 THEN 0
           |      ELSE (10000 * n_both) // k_used END)
           |    * (CASE WHEN k_used < 64 THEN k_used
           |      ELSE (63 * CAST($P AS BIGINT)) // hk END)) // 10000
           |    AS est_intersect
           |FROM agg ORDER BY grp_a, grp_b""".stripMargin
      },

      "q219_kmv_overlap" -> {
        val est = s"CASE WHEN st.k_used < 128 THEN st.k_used" +
          s" ELSE (127 * CAST($P AS BIGINT)) // st.hk END"
        s"""WITH base AS (SELECT doc_id, ${graft.ops.Sketches.kmvScrambleSql(sqlPoly(sqlNorm))} AS h
           |  FROM documents),
           |a AS (SELECT h FROM (SELECT DISTINCT h FROM base
           |  WHERE doc_id % 3 != 0 AND h IS NOT NULL) ORDER BY h LIMIT 128),
           |b AS (SELECT h FROM (SELECT DISTINCT h FROM base
           |  WHERE doc_id % 3 != 1 AND h IS NOT NULL) ORDER BY h LIMIT 128),
           |m AS (SELECT h FROM (SELECT DISTINCT h FROM (
           |    SELECT h FROM a UNION ALL SELECT h FROM b))
           |  ORDER BY h LIMIT 128),
           |nb AS (SELECT COUNT(*) AS n_both FROM m
           |  WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)),
           |st AS (SELECT COUNT(*) AS k_used, MAX(h) AS hk FROM m)
           |SELECT st.k_used,
           |  (10000 * nb.n_both) // st.k_used AS jaccard_bp,
           |  $est AS est_union,
           |  (((10000 * nb.n_both) // st.k_used) * ($est)) // 10000
           |    AS est_intersect
           |FROM st CROSS JOIN nb""".stripMargin
      },

      // q273: q219's replay + per-side estimators + clamped differences
      "q273_kmv_set_algebra" -> {
        val estU = s"CASE WHEN st.k_used < 128 THEN st.k_used" +
          s" ELSE (127 * CAST($P AS BIGINT)) // st.hk END"
        def estS(t: String) = s"CASE WHEN s$t.k$t < 128 THEN s$t.k$t" +
          s" ELSE (127 * CAST($P AS BIGINT)) // s$t.hk$t END"
        s"""WITH base AS (SELECT doc_id, ${graft.ops.Sketches.kmvScrambleSql(sqlPoly(sqlNorm))} AS h
           |  FROM documents),
           |a AS (SELECT h FROM (SELECT DISTINCT h FROM base
           |  WHERE doc_id % 3 != 0 AND h IS NOT NULL) ORDER BY h LIMIT 128),
           |b AS (SELECT h FROM (SELECT DISTINCT h FROM base
           |  WHERE doc_id % 3 != 1 AND h IS NOT NULL) ORDER BY h LIMIT 128),
           |m AS (SELECT h FROM (SELECT DISTINCT h FROM (
           |    SELECT h FROM a UNION ALL SELECT h FROM b))
           |  ORDER BY h LIMIT 128),
           |nb AS (SELECT COUNT(*) AS n_both FROM m
           |  WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)),
           |st AS (SELECT COUNT(*) AS k_used, MAX(h) AS hk FROM m),
           |sa AS (SELECT COUNT(*) AS ka, MAX(h) AS hka FROM a),
           |sb AS (SELECT COUNT(*) AS kb, MAX(h) AS hkb FROM b),
           |f AS (SELECT st.k_used,
           |    CAST(${estS("a")} AS BIGINT) AS est_a,
           |    CAST(${estS("b")} AS BIGINT) AS est_b,
           |    CAST($estU AS BIGINT) AS est_union,
           |    (((10000 * nb.n_both) // st.k_used) * ($estU)) // 10000
           |      AS est_intersect,
           |    (10000 * nb.n_both) // st.k_used AS jaccard_bp
           |  FROM st CROSS JOIN nb CROSS JOIN sa CROSS JOIN sb)
           |SELECT k_used, est_a, est_b, est_union, est_intersect,
           |  GREATEST(0, est_a - est_intersect) AS est_a_only,
           |  GREATEST(0, est_b - est_intersect) AS est_b_only,
           |  jaccard_bp
           |FROM f""".stripMargin
      },

      "q92_dedup_minhash_lsh" -> {
        val bandSelects = (0 until 4).map { b =>
          val key = (0 until 4).map(r => s"CAST(sig[${b * 4 + r + 1}] AS VARCHAR)").mkString(" || '-' || ")
          s"SELECT doc_id, $b AS band, $key AS bkey FROM sig"
        }.mkString("\n  UNION ALL ")
        s"""WITH $minhashCtes,
           |banded AS (
           |  $bandSelects
           |),
           |pairs AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
           |)
           |SELECT p.id_a, p.id_b,
           |  ROUND(list_sum(list_transform(range(1, 17),
           |    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 16.0, 4) AS est_jaccard
           |FROM pairs p JOIN sig sa ON sa.doc_id = p.id_a JOIN sig sb ON sb.doc_id = p.id_b
           |WHERE list_sum(list_transform(range(1, 17),
           |    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 16.0 >= 0.9
           |ORDER BY id_a, id_b""".stripMargin
      },

      "q92e_neardup_incremental" -> {
        val bandSelects = (0 until 4).map { b =>
          val key = (0 until 4).map(r => s"CAST(sig[${b * 4 + r + 1}] AS VARCHAR)").mkString(" || '-' || ")
          s"SELECT doc_id, $b AS band, $key AS bkey FROM sig"
        }.mkString("\n  UNION ALL ")
        s"""WITH $minhashCtes,
           |banded AS (
           |  $bandSelects
           |),
           |pairs AS (
           |  SELECT DISTINCT f.doc_id AS fresh_id, g.doc_id AS ingested_id
           |  FROM banded f JOIN banded g ON f.band = g.band AND f.bkey = g.bkey
           |  WHERE f.doc_id % 3 <> 0 AND g.doc_id % 3 = 0
           |)
           |SELECT p.fresh_id, p.ingested_id,
           |  ROUND(list_sum(list_transform(range(1, 17),
           |    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 16.0, 4) AS est_jaccard
           |FROM pairs p JOIN sig sa ON sa.doc_id = p.fresh_id
           |  JOIN sig sb ON sb.doc_id = p.ingested_id
           |WHERE list_sum(list_transform(range(1, 17),
           |    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 16.0 >= 0.9
           |ORDER BY fresh_id, ingested_id""".stripMargin
      },

      "q90c_snapshot_diff" ->
        s"""WITH o AS (SELECT doc_id, md5($sqlNorm) AS fp FROM documents
           |  WHERE doc_id % 5 <> 4),
           |n0 AS (SELECT doc_id,
           |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
           |  FROM documents WHERE doc_id % 5 <> 0),
           |n AS (SELECT doc_id,
           |    md5(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))) AS fp
           |  FROM n0)
           |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           |  CASE WHEN o.doc_id IS NULL THEN 'added'
           |       WHEN n.doc_id IS NULL THEN 'removed'
           |       WHEN o.fp IS DISTINCT FROM n.fp THEN 'changed'
           |       ELSE 'unchanged' END AS verdict
           |FROM o FULL OUTER JOIN n ON n.doc_id = o.doc_id
           |ORDER BY doc_id""".stripMargin,

      // planner replay: same midpoint grid, same ppb floor-quantization
      // before the integer sums, same (score, bands) argmin tie-break
      "q92f_lsh_plan" ->
        s"""WITH pr AS (SELECT b AS bands, CAST(16 / b AS INTEGER) AS rows_per_band
           |  FROM (VALUES (1),(2),(4),(8),(16)) t(b)),
           |g AS (SELECT (CAST(i AS DOUBLE) + 0.5) / 200 AS s FROM range(0, 200) t(i)),
           |j AS (SELECT bands, rows_per_band, s,
           |  CAST(FLOOR((1 - POW(1 - POW(s, rows_per_band), bands)) * 1e9) AS BIGINT) AS p_ppb
           |  FROM pr, g),
           |a AS (SELECT bands, rows_per_band,
           |  CAST(SUM(CASE WHEN s <= 0.5 THEN p_ppb ELSE 0 END) AS BIGINT) AS fp_ppb,
           |  CAST(SUM(CASE WHEN s > 0.5 THEN 1000000000 - p_ppb ELSE 0 END) AS BIGINT) AS fn_ppb
           |  FROM j GROUP BY 1, 2)
           |SELECT bands, rows_per_band, fp_ppb, fn_ppb,
           |  fp_ppb + fn_ppb AS score_ppb,
           |  ROW_NUMBER() OVER (ORDER BY fp_ppb + fn_ppb ASC, bands ASC) = 1 AS chosen
           |FROM a ORDER BY bands""".stripMargin,

      // shared by q92b (label propagation) and q92d (star rewriting):
      // both must produce identical min-id clusters
      "q92b_dedup_clusters" -> clustersOracleSql,
      "q92d_clusters_star" -> clustersOracleSql,

      "q92c_dedup_pipeline" -> {
        val bandSelects = (0 until 4).map { b =>
          val key = (0 until 4).map(r => s"CAST(sig[${b * 4 + r + 1}] AS VARCHAR)").mkString(" || '-' || ")
          s"SELECT doc_id, $b AS band, $key AS bkey FROM sig"
        }.mkString("\n  UNION ALL ")
        val repCtes = sqlMinhashCtes(from =
          "(SELECT d.* FROM documents d JOIN grp g ON d.doc_id = g.rep)")
        s"""WITH RECURSIVE
           |t0 AS (SELECT doc_id, $sqlNorm AS s FROM documents),
           |alldocs AS (SELECT doc_id, md5(s) AS fp FROM t0),
           |grp AS (SELECT fp, MIN(doc_id) AS rep FROM alldocs GROUP BY fp),
           |withrep AS (SELECT a.doc_id, g.rep FROM alldocs a JOIN grp g USING (fp)),
           |$repCtes,
           |banded AS (
           |  $bandSelects
           |),
           |cpairs AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
           |),
           |near AS (
           |  SELECT id_a, id_b FROM cpairs p
           |  JOIN sig sa ON sa.doc_id = p.id_a JOIN sig sb ON sb.doc_id = p.id_b
           |  WHERE list_sum(list_transform(range(1, 17),
           |    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 16.0 >= 0.9
           |),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM near
           |  UNION ALL SELECT id_b, id_a FROM near
           |),
           |reach(id, lbl) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
           |),
           |cl AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id)
           |SELECT w.doc_id, COALESCE(cl.cluster, w.rep) AS canonical_id,
           |  CAST(CASE WHEN w.doc_id = COALESCE(cl.cluster, w.rep) THEN 1 ELSE 0 END AS INTEGER) AS keep
           |FROM withrep w LEFT JOIN cl ON cl.id = w.rep
           |ORDER BY w.doc_id""".stripMargin
      },

      // q92c's cluster structure + per-cluster argmax survivor: rn = 1
      // restates max(struct(n_toks, -doc_id))
      "q92g_dedup_keep_best" -> {
        val bandSelects = (0 until 4).map { b =>
          val key = (0 until 4).map(r => s"CAST(sig[${b * 4 + r + 1}] AS VARCHAR)").mkString(" || '-' || ")
          s"SELECT doc_id, $b AS band, $key AS bkey FROM sig"
        }.mkString("\n  UNION ALL ")
        val repCtes = sqlMinhashCtes(from =
          "(SELECT d.* FROM documents d JOIN grp g ON d.doc_id = g.rep)")
        s"""WITH RECURSIVE
           |t0 AS (SELECT doc_id, $sqlNorm AS s FROM documents),
           |alldocs AS (SELECT doc_id, md5(s) AS fp FROM t0),
           |grp AS (SELECT fp, MIN(doc_id) AS rep FROM alldocs GROUP BY fp),
           |withrep AS (SELECT a.doc_id, g.rep FROM alldocs a JOIN grp g USING (fp)),
           |$repCtes,
           |banded AS (
           |  $bandSelects
           |),
           |cpairs AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
           |),
           |near AS (
           |  SELECT id_a, id_b FROM cpairs p
           |  JOIN sig sa ON sa.doc_id = p.id_a JOIN sig sb ON sb.doc_id = p.id_b
           |  WHERE list_sum(list_transform(range(1, 17),
           |    i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 16.0 >= 0.9
           |),
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM near
           |  UNION ALL SELECT id_b, id_a FROM near
           |),
           |reach(id, lbl) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
           |),
           |cl AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id),
           |memb AS (SELECT w.doc_id, COALESCE(cl.cluster, w.rep) AS canonical_id
           |  FROM withrep w LEFT JOIN cl ON cl.id = w.rep),
           |ql AS (SELECT doc_id,
           |  len(list_filter(string_split(s, ' '), x -> len(x) > 0)) AS n_toks FROM t0),
           |bst AS (SELECT canonical_id, doc_id AS best_id FROM (
           |  SELECT m.canonical_id, m.doc_id,
           |    ROW_NUMBER() OVER (PARTITION BY m.canonical_id
           |      ORDER BY q.n_toks DESC, m.doc_id ASC) AS rn
           |  FROM memb m JOIN ql q USING (doc_id)) s WHERE rn = 1)
           |SELECT m.doc_id, m.canonical_id, b.best_id,
           |  CAST(CASE WHEN m.doc_id = b.best_id THEN 1 ELSE 0 END AS INTEGER) AS keep
           |FROM memb m JOIN bst b USING (canonical_id)
           |ORDER BY m.doc_id""".stripMargin
      },

      // plain GROUP BY + the same integer HAVING (cnt*k > N): the
      // MG-candidate pass is an optimization, not a semantics change
      "q228_heavy_hitter_tokens" ->
        s"""WITH w AS (SELECT unnest(string_split($sqlNorm, ' ')) AS v
           |  FROM documents),
           |t AS (SELECT v FROM w WHERE len(v) > 0 AND v IS NOT NULL),
           |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM t),
           |c AS (SELECT v AS value, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM t GROUP BY v)
           |SELECT value, cnt, n_total FROM c CROSS JOIN n
           |WHERE cnt * 50 > n_total ORDER BY value""".stripMargin,

      "q228b_heavy_hitters_by" ->
        s"""WITH w AS (SELECT source AS g,
           |    unnest(string_split($sqlNorm, ' ')) AS v FROM documents),
           |t AS (SELECT g, v FROM w
           |  WHERE len(v) > 0 AND v IS NOT NULL AND g IS NOT NULL),
           |n AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_total
           |  FROM t GROUP BY g),
           |c AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM t GROUP BY g, v)
           |SELECT c.g AS grp, c.v AS value, c.cnt, n.n_total
           |FROM c JOIN n USING (g)
           |WHERE c.cnt * 40 > n.n_total ORDER BY grp, value""".stripMargin,

      // the SAME entropyTermExpr spelling as the Spark op
      "q229_token_entropy_by" ->
        s"""WITH w AS (SELECT source AS grp,
           |    unnest(string_split($sqlNorm, ' ')) AS v FROM documents),
           |t AS (SELECT grp, v FROM w
           |  WHERE len(v) > 0 AND v IS NOT NULL AND grp IS NOT NULL),
           |c AS (SELECT grp, v, COUNT(*) AS cnt FROM t GROUP BY grp, v),
           |tot AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           |    CAST(COUNT(*) AS BIGINT) AS n_distinct FROM c GROUP BY grp)
           |SELECT c.grp, tot.n_tokens, tot.n_distinct,
           |  CAST(SUM(${graft.ops.Corpus.entropyTermExpr("c.cnt",
                "tot.n_tokens")}) AS BIGINT) AS entropy_nano
           |FROM c JOIN tot USING (grp)
           |GROUP BY c.grp, tot.n_tokens, tot.n_distinct
           |ORDER BY grp""".stripMargin,

      "q93_simhash_sig" ->
        s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
           |th AS (SELECT doc_id,
           |  list_transform(string_split(s, ' '), tk -> (${sqlPoly("tk")} * 2654435761) % 4294967296) AS hs
           |  FROM t)
           |SELECT doc_id, CAST($sqlSimhashFromHs AS BIGINT) AS sh
           |FROM th WHERE doc_id % 11 = 0 ORDER BY doc_id""".stripMargin,

      "q94_dedup_simhash" ->
        s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
           |th AS (SELECT doc_id,
           |  list_transform(string_split(s, ' '), tk -> (${sqlPoly("tk")} * 2654435761) % 4294967296) AS hs
           |  FROM t),
           |sh AS (SELECT doc_id, CAST($sqlSimhashFromHs AS BIGINT) AS sh FROM th)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
           |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.sh, b.sh)) <= 4
           |ORDER BY id_a, id_b""".stripMargin,

      "q95_dedup_ngram_jaccard" ->
        s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
           |toks AS (SELECT doc_id, string_split(s, ' ') AS tk FROM t),
           |g AS (SELECT doc_id, unnest(list_distinct(
           |  [array_to_string(tk[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') for i in range(1, LEN(tk) - 1)])) AS gram
           |  FROM toks),
           |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
           |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2
           |)
           |SELECT id_a, id_b,
           |  ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard
           |FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
           |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.3
           |ORDER BY id_a, id_b""".stripMargin,

      "q95b_ngram_jaccard_capped" ->
        s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
           |toks AS (SELECT doc_id, string_split(s, ' ') AS tk FROM t),
           |g AS (SELECT doc_id, unnest(list_distinct(
           |  [array_to_string(tk[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') for i in range(1, LEN(tk) - 1)])) AS gram
           |  FROM toks),
           |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
           |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2
           |)
           |SELECT id_a, id_b,
           |  ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard
           |FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
           |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.3
           |ORDER BY id_a, id_b""".stripMargin,

      "q95c_tfidf_cosine_pairs" ->
        s"""WITH d AS (SELECT doc_id, $sqlNorm AS s FROM documents),
           |terms AS (SELECT doc_id, unnest(string_split(s, ' ')) AS term FROM d),
           |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms
           |  WHERE length(term) > 0 GROUP BY 1, 2),
           |dfr AS (SELECT doc_id, term, tf,
           |    COUNT(*) OVER (PARTITION BY term) AS df FROM tf),
           |capped AS (SELECT * FROM dfr WHERE df <= 100),
           |nd AS (SELECT COUNT(*) AS n_docs FROM d
           |  WHERE len(string_split(s, ' ')) > 0),
           |w AS (SELECT doc_id, term,
           |    tf * ROUND(ln(CAST(n_docs AS DOUBLE) / df), 6) AS w
           |  FROM capped CROSS JOIN nd),
           |u AS (SELECT doc_id, term,
           |    w / sqrt(SUM(w * w) OVER (PARTITION BY doc_id)) AS uw
           |  FROM w),
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    SUM(a.uw * b.uw) AS cos
           |  FROM u a JOIN u b ON a.term = b.term AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT id_a, id_b, ROUND(cos, 6) AS cos FROM pairs
           |WHERE ROUND(cos, 6) >= 0.3 ORDER BY id_a, id_b""".stripMargin,

      "q96_dedup_embedding" ->
        s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND(${sqlDot("a", "b")}, 4) AS cos
           |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           |WHERE ${sqlDot("a", "b")} > 0.4
           |ORDER BY id_a, id_b""".stripMargin,

      "q96b_dedup_embedding_blocked" ->
        s"""WITH bk AS (SELECT vec_id, embedding, ${sqlRpBucket("embeddings", 4)} AS bucket FROM embeddings)
           |SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND(${sqlDot("a", "b")}, 4) AS cos
           |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |WHERE ${sqlDot("a", "b")} > 0.4
           |ORDER BY id_a, id_b""".stripMargin,

      "q97_ann_bruteforce" ->
        s"""SELECT q_id, rnk, n_id, ROUND(cos, 6) AS cos FROM (
           |  SELECT q.vec_id AS q_id, n.vec_id AS n_id, ${sqlDot("q", "n")} AS cos,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY ${sqlDot("q", "n")} DESC, n.vec_id ASC) AS INTEGER) AS rnk
           |  FROM embeddings q JOIN embeddings n ON n.vec_id != q.vec_id
           |  WHERE q.vec_id < 3
           |) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

      // full-probe IVF is seed-independent by construction, so the
      // oracle is the EXACT tier — identical SQL to q97; a probe or
      // assignment bug in the seeded chain would drop candidates and
      // hash-mismatch
      "q274_ann_ivf_seeded" ->
        s"""SELECT q_id, rnk, n_id, ROUND(cos, 6) AS cos FROM (
           |  SELECT q.vec_id AS q_id, n.vec_id AS n_id, ${sqlDot("q", "n")} AS cos,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY ${sqlDot("q", "n")} DESC, n.vec_id ASC) AS INTEGER) AS rnk
           |  FROM embeddings q JOIN embeddings n ON n.vec_id != q.vec_id
           |  WHERE q.vec_id < 3
           |) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

      // rank by the UNROUNDED dot both directions, keep mutual rank-1
      // pairs, emit the rounded cosine — the same tie-break
      // (lowest partner id) as the Spark windows
      "q240_negative_sample" ->
        // bit-for-bit ring replay: positions, probes, bucket division,
        // forward distance, (d, cid)-argmin via row_number. The Knuth
        // multiply uses the SAME 2x16-bit decomposition as the Spark
        // op, so the replay is overflow-free for any non-negative id
        """WITH cand AS (SELECT DISTINCT vec_id AS cid,
          |    ((((vec_id % 4294967296) // 65536) * 2654435761
          |        % 4294967296) * 65536 % 4294967296
          |      + ((vec_id % 4294967296) % 65536) * 2654435761
          |        % 4294967296) % 4294967296 AS cpos
          |  FROM embeddings WHERE vec_id >= 0),
          |cb AS (SELECT cid, cpos, cpos // 67108864 AS bkt FROM cand),
          |pm AS (SELECT a.vec_id AS aid, g.j,
          |    ((a.vec_id % 4294967296) * 37 + g.j * 1009 + 17)
          |      % 4294967296 AS x
          |  FROM embeddings a
          |  CROSS JOIN (SELECT unnest(range(4)) AS j) g
          |  WHERE a.vec_id % 20 = 0 AND a.vec_id >= 0),
          |pr AS (SELECT aid, j,
          |    (((x // 65536) * 2654435761 % 4294967296) * 65536
          |        % 4294967296
          |      + (x % 65536) * 2654435761 % 4294967296)
          |      % 4294967296 AS probe
          |  FROM pm),
          |pb AS (SELECT aid, j, probe, probe // 67108864 AS bkt FROM pr),
          |sc AS (SELECT pb.aid, pb.j, cb.cid,
          |    (cb.cpos - pb.probe + 4294967296) % 4294967296 AS d
          |  FROM pb JOIN cb ON pb.bkt = cb.bkt AND cb.cid != pb.aid)
          |SELECT aid AS anchor_id, j, cid AS neg_id, d AS ring_dist
          |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY aid, j
          |    ORDER BY d, cid) AS r FROM sc) WHERE r = 1
          |ORDER BY anchor_id, j""".stripMargin,

      "q234_mutual_nn" ->
        s"""WITH sc AS MATERIALIZED (
           |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           |    ${sqlDot("a", "b")} AS cos
           |  FROM embeddings a JOIN embeddings b
           |    ON a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
           |ta AS (SELECT a_id, b_id, cos FROM (SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY a_id
           |      ORDER BY cos DESC, b_id ASC) AS r FROM sc) WHERE r = 1),
           |tb AS (SELECT a_id, b_id FROM (SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY b_id
           |      ORDER BY cos DESC, a_id ASC) AS r FROM sc) WHERE r = 1)
           |SELECT ta.a_id, ta.b_id, ROUND(ta.cos, 6) AS cos
           |FROM ta JOIN tb ON ta.a_id = tb.a_id AND ta.b_id = tb.b_id
           |ORDER BY ta.a_id""".stripMargin,

      "q244_margin_bitext" ->
        // identical micro-unit floor, integer top-4 sums, one integer
        // division on positive operands (Spark div == DuckDB // there)
        s"""WITH sc AS MATERIALIZED (
           |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           |    CAST(FLOOR((${sqlDot("a", "b")}) * 1000000) AS BIGINT)
           |      AS cos_u6
           |  FROM embeddings a JOIN embeddings b
           |    ON a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
           |sa AS (SELECT a_id, CAST(SUM(cos_u6) AS BIGINT) AS sa FROM (SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY a_id
           |      ORDER BY cos_u6 DESC, b_id ASC) AS r FROM sc)
           |  WHERE r <= 4 GROUP BY a_id),
           |sb AS (SELECT b_id, CAST(SUM(cos_u6) AS BIGINT) AS sb FROM (SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY b_id
           |      ORDER BY cos_u6 DESC, a_id ASC) AS r FROM sc)
           |  WHERE r <= 4 GROUP BY b_id),
           |m AS (SELECT sc.a_id, sc.b_id, sc.cos_u6,
           |    (sc.cos_u6 * 8 * 1000000) // (sa.sa + sb.sb) AS margin_ppm
           |  FROM sc JOIN sa USING (a_id) JOIN sb USING (b_id)
           |  WHERE sc.cos_u6 > 0 AND sa.sa + sb.sb > 0)
           |SELECT a_id, b_id, cos_u6, margin_ppm FROM (SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY a_id
           |      ORDER BY margin_ppm DESC, b_id ASC) AS rm FROM m)
           |WHERE rm = 1 AND margin_ppm >= 1000000
           |ORDER BY a_id""".stripMargin,

      // q244b: both directions' k-means chains unrolled (u = centroids
      // on B for a→B probes, v = centroids on A for b→A probes), then
      // q244's margin arithmetic confined to the in-probe pair sets
      "q244b_margin_bitext_ivf" -> {
        def d2(a: String, ac: String, b: String, bc: String) =
          CorpusQueries.sqlDot(a, ac, b, bc)
        s"""WITH srcA AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
           |srcB AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
           |${CorpusQueries.sqlKmeansCtesOver("u", "srcB", 8, 3)},
           |${CorpusQueries.sqlKmeansCtesOver("v", "srcA", 8, 3)},
           |uasg AS (SELECT vec_id AS b_id, cl FROM (
           |  SELECT e.vec_id, c.cl, ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |    ORDER BY ${d2("e", "embedding", "c", "c_vec")} DESC, c.cl ASC) AS rn
           |  FROM srcB e, uc3 c) s WHERE rn = 1),
           |uprb AS (SELECT a_id, cl FROM (
           |  SELECT q.vec_id AS a_id, c.cl, ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |    ORDER BY ${d2("q", "embedding", "c", "c_vec")} DESC, c.cl ASC) AS p
           |  FROM srcA q, uc3 c) s WHERE p <= 2),
           |candab AS (SELECT up.a_id, ua.b_id,
           |    CAST(FLOOR((${d2("a", "embedding", "b", "embedding")}) * 1000000) AS BIGINT) AS cos_u6
           |  FROM uprb up JOIN uasg ua USING (cl)
           |  JOIN srcA a ON a.vec_id = up.a_id
           |  JOIN srcB b ON b.vec_id = ua.b_id),
           |vasg AS (SELECT vec_id AS a_id, cl FROM (
           |  SELECT e.vec_id, c.cl, ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |    ORDER BY ${d2("e", "embedding", "c", "c_vec")} DESC, c.cl ASC) AS rn
           |  FROM srcA e, vc3 c) s WHERE rn = 1),
           |vprb AS (SELECT b_id, cl FROM (
           |  SELECT q.vec_id AS b_id, c.cl, ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |    ORDER BY ${d2("q", "embedding", "c", "c_vec")} DESC, c.cl ASC) AS p
           |  FROM srcB q, vc3 c) s WHERE p <= 2),
           |candba AS (SELECT va.a_id, vp.b_id,
           |    CAST(FLOOR((${d2("a", "embedding", "b", "embedding")}) * 1000000) AS BIGINT) AS cos_u6
           |  FROM vprb vp JOIN vasg va USING (cl)
           |  JOIN srcA a ON a.vec_id = va.a_id
           |  JOIN srcB b ON b.vec_id = vp.b_id),
           |sa AS (SELECT a_id, CAST(SUM(cos_u6) AS BIGINT) AS sa FROM (SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY a_id
           |      ORDER BY cos_u6 DESC, b_id ASC) AS r FROM candab)
           |  WHERE r <= 4 GROUP BY a_id),
           |sb AS (SELECT b_id, CAST(SUM(cos_u6) AS BIGINT) AS sb FROM (SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY b_id
           |      ORDER BY cos_u6 DESC, a_id ASC) AS r FROM candba)
           |  WHERE r <= 4 GROUP BY b_id),
           |m AS (SELECT c.a_id, c.b_id, c.cos_u6,
           |    (c.cos_u6 * 8 * 1000000) // (sa.sa + sb.sb) AS margin_ppm
           |  FROM candab c JOIN sa USING (a_id) JOIN sb USING (b_id)
           |  WHERE c.cos_u6 > 0 AND sa.sa + sb.sb > 0)
           |SELECT a_id, b_id, cos_u6, margin_ppm FROM (SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY a_id
           |      ORDER BY margin_ppm DESC, b_id ASC) AS rm FROM m)
           |WHERE rm = 1 AND margin_ppm >= 1000000
           |ORDER BY a_id""".stripMargin
      },

      // MMR oracle: same top-10 candidate set as q97's (rank by the
      // UNROUNDED dot, emit the rounded rel), then the three greedy
      // steps unrolled — each an argmax over (score DESC, n_id ASC)
      // with sims as inline index-order dots; scores floored to ppm
      "q97b_mmr_rerank" -> {
        def d(a: String, b: String): String =
          s"list_sum(list_transform(range(1, 65), i -> " +
            s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
        s"""WITH cand AS (SELECT q_id, n_id, rel FROM (
           |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
           |    ROUND(${sqlDot("q", "n")}, 6) AS rel,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${sqlDot("q", "n")} DESC, n.vec_id ASC) AS rnk
           |  FROM embeddings q JOIN embeddings n ON n.vec_id != q.vec_id
           |  WHERE q.vec_id < 3) WHERE rnk <= 10),
           |cv AS (SELECT c.q_id, c.n_id, c.rel, e.embedding AS nv
           |  FROM cand c JOIN embeddings e ON e.vec_id = c.n_id),
           |s1 AS (SELECT q_id, n_id, rel, nv, sc FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
           |    ORDER BY sc DESC, n_id ASC) AS rn
           |  FROM (SELECT *, 0.5 * rel AS sc FROM cv)) WHERE rn = 1),
           |s2 AS (SELECT q_id, n_id, rel, nv, sc FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
           |    ORDER BY sc DESC, n_id ASC) AS rn
           |  FROM (SELECT c.q_id, c.n_id, c.rel, c.nv,
           |      0.5 * c.rel - 0.5 * ${d("c.nv", "s1.nv")} AS sc
           |    FROM cv c JOIN s1 ON s1.q_id = c.q_id
           |    WHERE c.n_id != s1.n_id)) WHERE rn = 1),
           |s3 AS (SELECT q_id, n_id, sc FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
           |    ORDER BY sc DESC, n_id ASC) AS rn
           |  FROM (SELECT c.q_id, c.n_id,
           |      0.5 * c.rel - 0.5 * GREATEST(${d("c.nv", "s1.nv")},
           |        ${d("c.nv", "s2.nv")}) AS sc
           |    FROM cv c JOIN s1 ON s1.q_id = c.q_id
           |      JOIN s2 ON s2.q_id = c.q_id
           |    WHERE c.n_id != s1.n_id AND c.n_id != s2.n_id)) WHERE rn = 1)
           |SELECT q_id, CAST(1 AS INTEGER) AS rank, n_id,
           |  CAST(FLOOR(sc * 1e6) AS BIGINT) AS score_ppm FROM s1
           |UNION ALL SELECT q_id, CAST(2 AS INTEGER), n_id,
           |  CAST(FLOOR(sc * 1e6) AS BIGINT) FROM s2
           |UNION ALL SELECT q_id, CAST(3 AS INTEGER), n_id,
           |  CAST(FLOOR(sc * 1e6) AS BIGINT) FROM s3
           |ORDER BY q_id, rank""".stripMargin
      },

      // RRF oracle: the q97 and q99 ranking CTEs verbatim, then the
      // fixed-order coalesce sum floored to ppm
      "q97c_rrf_fusion" ->
        s"""WITH ex AS (SELECT q_id, n_id, rnk FROM (
           |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${sqlDot("q", "n")} DESC, n.vec_id ASC) AS INTEGER) AS rnk
           |  FROM embeddings q JOIN embeddings n ON n.vec_id != q.vec_id
           |  WHERE q.vec_id < 3) WHERE rnk <= 5),
           |bk AS (SELECT vec_id, embedding, ${sqlRpBucket("embeddings", 4)} AS bucket FROM embeddings),
           |ls AS (SELECT q_id, n_id, rnk FROM (
           |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${sqlDot("q", "n")} DESC, n.vec_id ASC) AS INTEGER) AS rnk
           |  FROM bk q JOIN bk n ON n.bucket = q.bucket AND n.vec_id != q.vec_id
           |  WHERE q.vec_id < 3) WHERE rnk <= 3),
           |f AS (SELECT COALESCE(e.q_id, l.q_id) AS q_id,
           |    COALESCE(e.n_id, l.n_id) AS n_id,
           |    CAST(FLOOR((COALESCE(1.0 / (60 + e.rnk), 0.0) +
           |      COALESCE(1.0 / (60 + l.rnk), 0.0)) * 1e6) AS BIGINT) AS rrf_ppm
           |  FROM ex e FULL OUTER JOIN ls l
           |    ON l.q_id = e.q_id AND l.n_id = e.n_id)
           |SELECT q_id, rank, n_id, rrf_ppm FROM (
           |  SELECT q_id, n_id, rrf_ppm, CAST(ROW_NUMBER() OVER (
           |    PARTITION BY q_id ORDER BY rrf_ppm DESC, n_id ASC) AS INTEGER) AS rank
           |  FROM f) WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

      "q98_ann_lsh_buckets" ->
        s"""SELECT ${sqlRpBucket("embeddings", 4)} AS bucket, COUNT(*) AS n
           |FROM embeddings GROUP BY bucket ORDER BY bucket""".stripMargin,

      "q99_ann_lsh_topk" ->
        s"""WITH bk AS (SELECT vec_id, embedding, ${sqlRpBucket("embeddings", 4)} AS bucket FROM embeddings)
           |SELECT q_id, rnk, n_id, ROUND(cos, 6) AS cos FROM (
           |  SELECT q.vec_id AS q_id, n.vec_id AS n_id, ${sqlDot("q", "n")} AS cos,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY ${sqlDot("q", "n")} DESC, n.vec_id ASC) AS INTEGER) AS rnk
           |  FROM bk q JOIN bk n ON n.bucket = q.bucket AND n.vec_id != q.vec_id
           |  WHERE q.vec_id < 3
           |) WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,

      // full IVF oracle: the q145-style k-means unroll (same seeds, 3
      // rounds, float-cast means) → nearest-centroid assignment → the
      // PROBE centroids ivfTopK recomputes from the assignment → probe
      // the 2 best clusters → exact top-3 within the probed slices
      "q99b_ann_ivf" ->
        s"""WITH ${CorpusQueries.sqlKmeansCtes(k = 8, iters = 3)},
           |af AS (SELECT vec_id, embedding, cl FROM (
           |  SELECT e.vec_id, e.embedding, c.cl,
           |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${CorpusQueries.sqlDot("e", "embedding", "c", "c_vec")} DESC, c.cl ASC) AS rn
           |  FROM embeddings e, c3 c) s WHERE rn = 1),
           |cm AS (SELECT cl, i, CAST(AVG(CAST(embedding[i] AS DOUBLE)) AS FLOAT) AS m
           |  FROM af, range(1, 65) t(i) GROUP BY cl, i),
           |cc AS (SELECT cl, list(m ORDER BY i) AS c_vec FROM cm GROUP BY cl),
           |pr AS (SELECT q_id, q_vec, cl FROM (
           |  SELECT q.vec_id AS q_id, q.embedding AS q_vec, c.cl,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${CorpusQueries.sqlDot("q", "embedding", "c", "c_vec")} DESC, c.cl ASC) AS p
           |  FROM embeddings q, cc c WHERE q.vec_id < 3) s WHERE p <= 2),
           |cand AS (SELECT pr.q_id, e.vec_id AS n_id,
           |    ${CorpusQueries.sqlDot("pr", "q_vec", "e", "embedding")} AS cos
           |  FROM pr JOIN af e USING (cl) WHERE e.vec_id != pr.q_id)
           |SELECT q_id, rnk, n_id, ROUND(cos, 6) AS cos FROM (
           |  SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |    ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rnk FROM cand)
           |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,

      // IVF-SQ oracle: the q99b coarse-kmeans chain (c3) drives both
      // corpus assignment and probe selection, then the q213 SQ code
      // construction scores candidates in pure integers
      "q217_ann_ivfsq" ->
        s"""WITH ${CorpusQueries.sqlKmeansCtes(k = 8, iters = 3)},
           |af AS (SELECT vec_id, cl FROM (
           |  SELECT e.vec_id, c.cl,
           |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${CorpusQueries.sqlDot("e", "embedding", "c", "c_vec")} DESC, c.cl ASC) AS rn
           |  FROM embeddings e, c3 c) s WHERE rn = 1),
           |dims AS (SELECT CAST(r.i + 1 AS INTEGER) AS i FROM range(64) r(i)),
           |scale AS (SELECT MAX(ABS(embedding[i])) AS m
           |  FROM embeddings CROSS JOIN dims),
           |codes AS (SELECT vec_id, i,
           |    CASE WHEN m <= 0 THEN 0 ELSE
           |      LEAST(127, GREATEST(-127, CAST(FLOOR(
           |        CAST(embedding[i] AS DOUBLE) * 127.0
           |          / CAST(m AS DOUBLE)) AS INTEGER)))
           |    END AS c
           |  FROM embeddings CROSS JOIN dims CROSS JOIN scale),
           |pr AS (SELECT q_id, cl FROM (
           |  SELECT q.vec_id AS q_id, c.cl,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${CorpusQueries.sqlDot("q", "embedding", "c", "c_vec")} DESC, c.cl ASC) AS p
           |  FROM embeddings q, c3 c WHERE q.vec_id < 3) s WHERE p <= 2),
           |cand AS (SELECT pr.q_id, af.vec_id AS n_id
           |  FROM pr JOIN af USING (cl) WHERE af.vec_id != pr.q_id),
           |d AS (SELECT cand.q_id, cand.n_id,
           |    CAST(SUM(qc.c * nc.c) AS BIGINT) AS code_dot
           |  FROM cand JOIN codes qc ON qc.vec_id = cand.q_id
           |  JOIN codes nc ON nc.vec_id = cand.n_id AND nc.i = qc.i
           |  GROUP BY 1, 2),
           |rk AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |    ORDER BY code_dot DESC, n_id ASC) AS INTEGER) AS rnk FROM d)
           |SELECT q_id, rnk, n_id, code_dot FROM rk
           |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,

      // SQ8 oracle: corpus-wide max-abs scale, the same clamp-floor
      // symmetric code (identical IEEE double sequence on identical
      // operands), integer code-dot, window top-5
      "q213_ann_sq8" ->
        """WITH e AS (SELECT vec_id, embedding FROM embeddings),
          |dims AS (SELECT CAST(r.i + 1 AS INTEGER) AS i FROM range(64) r(i)),
          |scale AS (SELECT MAX(ABS(embedding[i])) AS m
          |  FROM e CROSS JOIN dims),
          |codes AS (SELECT vec_id, i,
          |    CASE WHEN m <= 0 THEN 0 ELSE
          |      LEAST(127, GREATEST(-127, CAST(FLOOR(
          |        CAST(embedding[i] AS DOUBLE) * 127.0
          |          / CAST(m AS DOUBLE)) AS INTEGER)))
          |    END AS c
          |  FROM e CROSS JOIN dims CROSS JOIN scale),
          |q AS (SELECT * FROM codes WHERE vec_id < 3),
          |d AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
          |    CAST(SUM(q.c * c.c) AS BIGINT) AS code_dot
          |  FROM q JOIN codes c ON q.i = c.i AND q.vec_id != c.vec_id
          |  GROUP BY 1, 2),
          |rk AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
          |    ORDER BY code_dot DESC, n_id ASC) AS INTEGER) AS rnk FROM d)
          |SELECT q_id, rnk, n_id, code_dot FROM rk
          |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

      // PQ ANN oracle: four independent subspace k-means chains (the
      // q99b unroll confined to embedding[off+1..off+16] each), final
      // code assignment per subspace, reconstruction = concatenated
      // codewords, then ONE index-order dot(q, reconstruction) — the
      // same single running sum the Spark ADC UDF accumulates.
      "q99c_ann_pq" -> {
        val subs = (0 until 4).map(s =>
          CorpusQueries.sqlKmeansCtesSub(s"s$s", off = s * 16, len = 16, k = 8, iters = 2))
        s"""WITH ${subs.mkString(",\n")},
           |rv AS (SELECT s0.vec_id,
           |    s0.c_vec || s1.c_vec || s2.c_vec || s3.c_vec AS rvec
           |  FROM s0sel s0 JOIN s1sel s1 USING (vec_id)
           |    JOIN s2sel s2 USING (vec_id) JOIN s3sel s3 USING (vec_id)),
           |cand AS (SELECT q.vec_id AS q_id, r.vec_id AS n_id,
           |    list_sum(list_transform(range(1, 65), i ->
           |      CAST(q.embedding[i] AS DOUBLE) * CAST(r.rvec[i] AS DOUBLE))) AS cos
           |  FROM embeddings q, rv r WHERE q.vec_id < 3 AND r.vec_id != q.vec_id)
           |SELECT q_id, rnk, n_id, ROUND(cos, 6) AS cos FROM (
           |  SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |    ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rnk FROM cand)
           |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin
      },

      // IVF-PQ oracle: q99b's coarse chain (assignment against the
      // LEARNED c3 centroids — both membership and probe, no mean
      // recompute) composed with q99c's subspace chains and
      // reconstruction; ranking = the same single index-order dot
      "q99d_ann_ivfpq" -> {
        val subs = (0 until 4).map(s =>
          CorpusQueries.sqlKmeansCtesSub(s"s$s", off = s * 16, len = 16, k = 8, iters = 2))
        s"""WITH ${CorpusQueries.sqlKmeansCtes(k = 8, iters = 3)},
           |af AS (SELECT vec_id, cl FROM (
           |  SELECT e.vec_id, c.cl,
           |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${CorpusQueries.sqlDot("e", "embedding", "c", "c_vec")} DESC, c.cl ASC) AS rn
           |  FROM embeddings e, c3 c) s WHERE rn = 1),
           |${subs.mkString(",\n")},
           |rv AS (SELECT s0.vec_id,
           |    s0.c_vec || s1.c_vec || s2.c_vec || s3.c_vec AS rvec
           |  FROM s0sel s0 JOIN s1sel s1 USING (vec_id)
           |    JOIN s2sel s2 USING (vec_id) JOIN s3sel s3 USING (vec_id)),
           |pr AS (SELECT q_id, q_vec, cl FROM (
           |  SELECT q.vec_id AS q_id, q.embedding AS q_vec, c.cl,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${CorpusQueries.sqlDot("q", "embedding", "c", "c_vec")} DESC, c.cl ASC) AS p
           |  FROM embeddings q, c3 c WHERE q.vec_id < 3) s WHERE p <= 2),
           |cand AS (SELECT pr.q_id, e.vec_id AS n_id,
           |    list_sum(list_transform(range(1, 65), i ->
           |      CAST(pr.q_vec[i] AS DOUBLE) * CAST(r.rvec[i] AS DOUBLE))) AS cos
           |  FROM pr JOIN af e USING (cl) JOIN rv r ON r.vec_id = e.vec_id
           |  WHERE e.vec_id != pr.q_id)
           |SELECT q_id, rnk, n_id, ROUND(cos, 6) AS cos FROM (
           |  SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |    ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rnk FROM cand)
           |WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin
      },

      // Gopher ruleset: every comparison divides two exact integers at
      // most once — bit-stable booleans, no rounded thresholds
      "q299_distinct_ngrams" ->
        s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents
           |  WHERE doc_id % 5 = 0),
           |l AS (SELECT doc_id,
           |    list_filter(string_split(s, ' '), w -> length(w) > 0) AS ws
           |  FROM t),
           |b AS (SELECT doc_id, ws, LEN(ws) AS nw FROM l),
           |g AS (SELECT doc_id, n.n,
           |    array_to_string(ws[CAST(i.i AS INTEGER):
           |      CAST(i.i + n.n - 1 AS INTEGER)], ' ') AS gram
           |  FROM b
           |  CROSS JOIN (SELECT unnest(range(1, 4)) AS n) n
           |  CROSS JOIN (SELECT unnest(range(1,
           |    CAST(COALESCE((SELECT MAX(nw) FROM b), 0) AS BIGINT) + 1))
           |    AS i) i
           |  WHERE i.i <= nw - n.n + 1),
           |pn AS (SELECT doc_id, n, COUNT(*) AS total,
           |    COUNT(DISTINCT gram) AS uniq FROM g GROUP BY doc_id, n),
           |pc AS (SELECT doc_id, n,
           |    (uniq * 10000) // total AS bp FROM pn),
           |cols AS (SELECT doc_id,
           |    MAX(CASE WHEN n = 1 THEN bp END) AS dist1_bp,
           |    MAX(CASE WHEN n = 2 THEN bp END) AS dist2_bp,
           |    MAX(CASE WHEN n = 3 THEN bp END) AS dist3_bp
           |  FROM pc GROUP BY doc_id)
           |SELECT b.doc_id, CAST(b.nw AS INTEGER) AS n_words,
           |  CAST(cols.dist1_bp AS BIGINT) AS dist1_bp,
           |  CAST(cols.dist2_bp AS BIGINT) AS dist2_bp,
           |  CAST(cols.dist3_bp AS BIGINT) AS dist3_bp
           |FROM b LEFT JOIN cols ON b.doc_id = cols.doc_id
           |ORDER BY b.doc_id""".stripMargin,

      // full integer replay of the repetition table: list-sliced word
      // n-grams (n = 2..10, positions derived from MAX word count),
      // per-(doc, n) ROW_NUMBER argmax with the (cnt DESC, gram ASC)
      // tie-break, dup shares as Σ cnt·chars, line shares over chr(10)
      // splits; q297b replays the SAME body with polyHash group keys
      // and the (cnt DESC, hash ASC) tie-break
      // (gopherRepetitionOracleSql)
      "q297_gopher_repetition" -> gopherRepetitionOracleSql(hashed = false),
      "q297b_gopher_repetition_hashed" ->
        gopherRepetitionOracleSql(hashed = true),

      "q101b_gopher_rules" ->
        s"""WITH t AS (SELECT doc_id, text, $sqlNorm AS s FROM documents),
           |tok AS (SELECT doc_id, text, string_split(s, ' ') AS tk FROM t),
           |f AS (SELECT doc_id,
           |  CAST(LEN(tk) AS INTEGER) AS n_words,
           |  CAST(list_sum(list_transform(tk, x -> CAST(LENGTH(x) AS BIGINT))) AS DOUBLE) AS tot_len,
           |  CAST(LENGTH(text) - LENGTH(REPLACE(text, '#', '')) AS BIGINT) AS n_hash,
           |  CAST((LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) // 3 AS BIGINT) AS n_ell,
           |  CAST(LEN(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS INTEGER) AS n_alpha,
           |  CAST(LEN(list_filter(['the','be','to','of','and','that','have','with'],
           |    st -> list_contains(tk, st))) AS INTEGER) AS n_stop,
           |  string_split(text, chr(10)) AS lines
           |FROM tok)
           |SELECT doc_id, n_words,
           |  n_words >= 50 AND n_words <= 100000 AS ok_words,
           |  tot_len / n_words >= 3.0 AND tot_len / n_words <= 10.0 AS ok_avg_len,
           |  CAST(n_hash + n_ell AS DOUBLE) / n_words <= 0.1 AS ok_symbol,
           |  CAST(n_alpha AS DOUBLE) / n_words >= 0.8 AS ok_alpha,
           |  n_stop >= 2 AS ok_stop,
           |  CAST(LEN(list_filter(lines, l -> starts_with(TRIM(l), '-')
           |    OR starts_with(TRIM(l), '*'))) AS DOUBLE) / LEN(lines) <= 0.9 AS ok_bullet,
           |  CAST(LEN(list_filter(lines, l -> ends_with(l, '...'))) AS DOUBLE) / LEN(lines) <= 0.3 AS ok_ellipsis,
           |  (n_words >= 50 AND n_words <= 100000)
           |    AND (tot_len / n_words >= 3.0 AND tot_len / n_words <= 10.0)
           |    AND (CAST(n_hash + n_ell AS DOUBLE) / n_words <= 0.1)
           |    AND (CAST(n_alpha AS DOUBLE) / n_words >= 0.8)
           |    AND (n_stop >= 2)
           |    AND (CAST(LEN(list_filter(lines, l -> starts_with(TRIM(l), '-')
           |      OR starts_with(TRIM(l), '*'))) AS DOUBLE) / LEN(lines) <= 0.9)
           |    AND (CAST(LEN(list_filter(lines, l -> ends_with(l, '...'))) AS DOUBLE) / LEN(lines) <= 0.3)
           |    AS gopher_pass
           |FROM f ORDER BY doc_id""".stripMargin,

      "q258_code_switch" -> {
        val scores = TextAnalysis.langMarkers.map { case (lang, m) =>
          val lst = m.map(w => s"'$w'").mkString(", ")
          s"LEN(list_filter(string_split(s, ' '), t -> list_contains([$lst], t))) AS s_$lang"
        }.mkString(",\n  ")
        val term = graft.ops.Corpus.entropyTermExpr("cnt", "n_sentences")
        s"""WITH sen AS (SELECT doc_id, TRIM(x) AS sent FROM (
           |    SELECT doc_id, UNNEST(regexp_split_to_array(text,
           |      '[.!?]+')) AS x FROM documents)
           |  WHERE LENGTH(TRIM(x)) > 0),
           |ns AS (SELECT doc_id,
           |    LOWER(TRIM(REGEXP_REPLACE(sent, '\\s+', ' ', 'g'))) AS s
           |  FROM sen),
           |sc AS (SELECT doc_id, $scores FROM ns),
           |lid AS (SELECT doc_id,
           |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
           |       WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
           |       WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
           |       WHEN s_fr >= s_zh THEN 'fr'
           |       ELSE 'zh' END AS slang FROM sc),
           |c AS (SELECT doc_id, slang, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM lid GROUP BY 1, 2),
           |t AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_sentences,
           |    CAST(COUNT(*) AS BIGINT) AS n_langs FROM c GROUP BY 1),
           |e AS (SELECT c.doc_id,
           |    CAST(SUM($term) AS BIGINT) AS entropy_nano
           |  FROM c JOIN t USING (doc_id) GROUP BY 1),
           |d AS (SELECT doc_id, slang, cnt, ROW_NUMBER() OVER (
           |    PARTITION BY doc_id ORDER BY cnt DESC, slang) AS rk FROM c)
           |SELECT t.doc_id, t.n_sentences, t.n_langs, d.slang AS dom_lang,
           |  (d.cnt * 10000) // t.n_sentences AS dom_bp, e.entropy_nano
           |FROM t JOIN d ON d.doc_id = t.doc_id AND d.rk = 1
           |JOIN e ON e.doc_id = t.doc_id
           |ORDER BY t.doc_id""".stripMargin
      },

      "q100_text_langid" -> {
        val scores = TextAnalysis.langMarkers.map { case (lang, m) =>
          val lst = m.map(w => s"'$w'").mkString(", ")
          s"LEN(list_filter(string_split(s, ' '), t -> list_contains([$lst], t))) AS s_$lang"
        }.mkString(",\n  ")
        s"""WITH t AS (SELECT doc_id, lang, $sqlNorm AS s FROM documents),
           |sc AS (SELECT doc_id, lang,
           |  $scores
           |FROM t)
           |SELECT doc_id, lang,
           |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
           |       WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
           |       WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
           |       WHEN s_fr >= s_zh THEN 'fr'
           |       ELSE 'zh' END AS pred_lang
           |FROM sc ORDER BY doc_id""".stripMargin
      },

      "q101_text_quality" ->
        s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
           |tok AS (SELECT doc_id, s, string_split(s, ' ') AS tk FROM t)
           |SELECT doc_id,
           |  CAST(LENGTH(s) AS INTEGER) AS n_chars_m,
           |  CAST(LEN(tk) AS INTEGER) AS n_tokens,
           |  ROUND(CAST(LEN(list_distinct(tk)) AS DOUBLE) / LEN(tk), 4) AS ttr,
           |  ROUND(list_sum(list_transform(tk, x -> CAST(LENGTH(x) AS DOUBLE))) / LEN(tk), 4) AS avg_tok_len,
           |  ROUND(CAST(LEN(list_filter(tk, x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE) / LEN(tk), 4) AS stop_ratio,
           |  ROUND(CAST(LENGTH(s) - LENGTH(REGEXP_REPLACE(s, '[0-9]', '', 'g')) AS DOUBLE) / LENGTH(s), 4) AS digit_ratio
           |FROM tok ORDER BY doc_id""".stripMargin,

      "q102_text_tokens" ->
        s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
           |tok AS (SELECT doc_id, s, string_split(s, ' ') AS tk FROM t)
           |SELECT doc_id,
           |  CAST(LEN(tk) AS INTEGER) AS n_ws_tokens,
           |  CAST(LEN(REGEXP_EXTRACT_ALL(s, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INTEGER) AS n_re_tokens,
           |  CAST(LEN(list_distinct(
           |    [array_to_string(tk[CAST(i AS INTEGER):CAST(i + 1 AS INTEGER)], ' ') for i in range(1, LEN(tk))])) AS INTEGER) AS n_bigrams
           |FROM tok ORDER BY doc_id""".stripMargin,

      "q104_text_repetition" ->
        s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
           |toks AS (SELECT doc_id, string_split(s, ' ') AS tk FROM t),
           |g AS (SELECT doc_id, unnest(
           |  [array_to_string(tk[CAST(i AS INTEGER):CAST(i + 1 AS INTEGER)], ' ') for i in range(1, LEN(tk))]) AS gram
           |  FROM toks),
           |c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
           |st AS (SELECT doc_id, SUM(c) AS total, MAX(c) AS top1, COUNT(*) AS nd
           |       FROM c GROUP BY doc_id)
           |SELECT doc_id, CAST(total AS INTEGER) AS n_grams,
           |  ROUND(top1 / total, 4) AS top_gram_frac,
           |  ROUND(1 - nd / total, 4) AS dup_gram_frac
           |FROM st ORDER BY doc_id""".stripMargin,

      "q103_text_fingerprint" ->
        s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents)
           |SELECT doc_id, ${sqlPoly("s")} AS fp, md5(s) AS md5_fp
           |FROM t ORDER BY doc_id""".stripMargin,

      "q106_char_ngrams" ->
        s"""WITH t AS (SELECT doc_id, $sqlNorm AS s FROM documents WHERE doc_id % 17 = 0),
           |g AS (SELECT doc_id,
           |  list_distinct([substr(s, CAST(i AS INTEGER), 3) for i in range(1, LEN(s) - 1)]) AS g3,
           |  list_distinct([substr(s, CAST(i AS INTEGER), 5) for i in range(1, LEN(s) - 3)]) AS g5
           |FROM t)
           |SELECT doc_id, CAST(LEN(g3) AS INTEGER) AS n3, CAST(LEN(g5) AS INTEGER) AS n5,
           |  array_to_string(list_sort(g3)[1:3], '|') AS first3
           |FROM g ORDER BY doc_id""".stripMargin,

      "q107_code_points" ->
        """SELECT doc_id,
          |  array_to_string(list_transform(string_split(substr(text, 1, 40), ''), c -> unicode(c)), ',') AS cps,
          |  CAST(LENGTH(text) AS INTEGER) AS n_cp
          |FROM documents WHERE doc_id % 29 = 0 ORDER BY doc_id""".stripMargin,

      "q108_porter_stem" -> {
        val values = porterGolden.map { case (w, st) => s"('$w', '$st')" }.mkString(", ")
        s"""SELECT tok, stem FROM (VALUES $values) AS g(tok, stem)
           |ORDER BY tok""".stripMargin
      },

      "q109_subword_tokenize" ->
        s"""WITH RECURSIVE
           |$sqlWordpieceCtes
           |SELECT t.doc_id, CAST(len(t.wl) AS INTEGER) AS n_words,
           |  CAST(coalesce(len(f.ids), 0) AS INTEGER) AS n_tokens,
           |  CAST(coalesce(len(list_filter(f.ids, x -> x = 0)), 0) AS INTEGER) AS n_unk,
           |  coalesce(array_to_string(f.ids, ' '), '') AS token_ids
           |FROM t LEFT JOIN flat f USING (doc_id) ORDER BY doc_id""".stripMargin,

      "q196_tokenizer_fertility" ->
        s"""WITH RECURSIVE
           |$sqlWordpieceCtes,
           |m AS (SELECT t.doc_id, CAST(len(t.wl) AS BIGINT) AS n_words,
           |    CAST(coalesce(len(f.ids), 0) AS BIGINT) AS n_tokens,
           |    CAST(coalesce(len(list_filter(f.ids, x -> x = 0)), 0) AS BIGINT) AS n_unk
           |  FROM t LEFT JOIN flat f USING (doc_id)),
           |ch AS (SELECT doc_id, source,
           |    CAST(length(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))))
           |      AS BIGINT) AS n_chars
           |  FROM documents),
           |g AS (SELECT ch.source, CAST(SUM(m.n_words) AS BIGINT) AS words,
           |    CAST(SUM(m.n_tokens) AS BIGINT) AS tokens,
           |    CAST(SUM(m.n_unk) AS BIGINT) AS unks,
           |    CAST(SUM(ch.n_chars) AS BIGINT) AS chars
           |  FROM m JOIN ch USING (doc_id) GROUP BY ch.source)
           |SELECT source, words, tokens, unks, chars,
           |  (10000 * tokens) // NULLIF(words, 0) AS fertility_bp,
           |  (100 * chars) // NULLIF(tokens, 0) AS chars_per_token_c,
           |  (10000 * unks) // NULLIF(tokens, 0) AS unk_bp
           |FROM g ORDER BY source""".stripMargin,

      "q162_bpe_learn" -> {
        val n = 10
        s"""${bpeCtes(n)}
           |${(1 to n).map(k =>
              s"SELECT $k AS iter, l AS l_tok, r AS r_tok, c AS pair_cnt FROM m$k")
              .mkString("\nUNION ALL ")}
           |ORDER BY iter""".stripMargin
      },

      "q162b_bpe_encode" -> {
        val n = 10
        s"""${bpeCtes(n)},
           |dict AS (SELECT w, len(string_split(toks, ' ')) AS n_sub FROM t$n),
           |dw AS (SELECT doc_id, unnest(string_split($sqlNorm, ' ')) AS w FROM documents)
           |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           |  CAST(SUM(n_sub) AS BIGINT) AS n_subwords
           |FROM dw JOIN dict USING (w) WHERE len(w) > 0
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      },

      // the per-doc encode rolled up per lang — same CTEs, one more join
      "q162c_tokenizer_fertility" -> {
        val n = 10
        s"""${bpeCtes(n)},
           |dict AS (SELECT w, len(string_split(toks, ' ')) AS n_sub FROM t$n),
           |dw AS (SELECT doc_id, unnest(string_split($sqlNorm, ' ')) AS w FROM documents),
           |enc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           |    CAST(SUM(n_sub) AS BIGINT) AS n_subwords
           |  FROM dw JOIN dict USING (w) WHERE len(w) > 0 GROUP BY doc_id)
           |SELECT d.lang, COUNT(*) AS n_docs,
           |  CAST(SUM(e.n_words) AS BIGINT) AS n_words,
           |  CAST(SUM(e.n_subwords) AS BIGINT) AS n_subwords,
           |  CAST((10000 * SUM(e.n_subwords)) // SUM(e.n_words) AS BIGINT) AS fertility_bp
           |FROM enc e JOIN documents d USING (doc_id)
           |GROUP BY d.lang ORDER BY d.lang""".stripMargin
      },

      "q163_replace_tokens" ->
        s"""SELECT doc_id, array_to_string(list_transform(
           |    string_split($sqlNorm, ' '),
           |    t -> CASE WHEN t = 'the' THEN 'THE' WHEN t = 'and' THEN 'AND'
           |              WHEN t = 'of' THEN 'OF' ELSE t END), ' ') AS replaced
           |FROM documents WHERE doc_id % 13 = 0 ORDER BY doc_id""".stripMargin,

      "q164_filter_tokens" ->
        s"""SELECT doc_id,
           |  array_to_string(list_filter(string_split($sqlNorm, ' '),
           |    t -> len(t) >= 4), ' ') AS dropped,
           |  array_to_string(list_transform(string_split($sqlNorm, ' '),
           |    t -> CASE WHEN len(t) >= 4 THEN t ELSE '_' END), ' ') AS marked
           |FROM documents WHERE doc_id % 13 = 0 ORDER BY doc_id""".stripMargin,

      "q165_char_tokenize" ->
        """WITH t AS (SELECT doc_id, string_split(substr(text, 1, 25), '') AS cs
          |  FROM documents WHERE doc_id % 29 = 0)
          |SELECT doc_id, CAST(generate_subscripts(cs, 1) AS INTEGER) AS pos,
          |  unnest(cs) AS ch
          |FROM t ORDER BY doc_id, pos""".stripMargin,

      "q166_detokenize" ->
        s"""WITH t AS (SELECT doc_id,
           |    list_filter(string_split($sqlNorm, ' '), x -> len(x) > 0) AS wl
           |  FROM documents)
           |SELECT doc_id, array_to_string(wl, ' ') AS text
           |FROM t WHERE len(wl) > 0 ORDER BY doc_id""".stripMargin,

      "q167_edit_distance_matrix" ->
        """WITH v AS (SELECT DISTINCT LOWER(n_name) AS v FROM nation)
          |SELECT a.v AS a, b.v AS b,
          |  CAST(levenshtein(a.v, b.v) AS INTEGER) AS dist
          |FROM v a JOIN v b ON a.v < b.v ORDER BY a, b""".stripMargin,

      "q168_vocab_tokenize" ->
        s"""WITH w AS (SELECT unnest(list_filter(string_split($sqlNorm, ' '),
           |    x -> len(x) > 0)) AS word FROM documents),
           |c AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY 1),
           |vocab AS (SELECT word,
           |    CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, word) - 1 AS INTEGER) AS vocab_id
           |  FROM c ORDER BY cnt DESC, word LIMIT 40),
           |tok AS (SELECT doc_id,
           |    unnest(list_filter(string_split($sqlNorm, ' '), x -> len(x) > 0)) AS word,
           |    generate_subscripts(list_filter(string_split($sqlNorm, ' '),
           |      x -> len(x) > 0), 1) AS pos
           |  FROM documents WHERE doc_id % 13 = 0),
           |j AS (SELECT t.doc_id, t.pos, COALESCE(v.vocab_id, -1) AS tid
           |  FROM tok t LEFT JOIN vocab v USING (word))
           |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_tokens,
           |  string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY pos) AS token_ids
           |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // Viterbi oracle: rebuild the identical integer-cost vocabulary,
      // then enumerate EVERY segmentation path of each distinct word
      // with a recursive CTE (pos strictly increases → terminates;
      // piece alphabet = chars+bigrams+words keeps the path count
      // Fibonacci-bounded per word) and take the same (cost, pieces)
      // lexicographic argmin the DP takes
      "q170_viterbi_tokenize" ->
        s"""WITH RECURSIVE t AS (SELECT doc_id, $sqlNorm AS s FROM documents),
           |w0 AS (SELECT doc_id, unnest(string_split(s, ' ')) AS w FROM t),
           |words AS (SELECT doc_id, w FROM w0 WHERE LENGTH(w) > 0),
           |topw AS (SELECT w AS piece, CAST(100 AS BIGINT) AS cost FROM (
           |  SELECT w, COUNT(*) AS c FROM words GROUP BY w
           |  ORDER BY c DESC, w ASC LIMIT 20)),
           |bg AS (SELECT g AS piece, CAST(250 AS BIGINT) AS cost FROM (
           |  SELECT substr(w, CAST(i AS INTEGER), 2) AS g, COUNT(*) AS c
           |  FROM words, range(1, 200) t2(i)
           |  WHERE LENGTH(w) >= 2 AND i <= LENGTH(w) - 1
           |  GROUP BY g ORDER BY c DESC, g ASC LIMIT 30)),
           |chp AS (SELECT DISTINCT substr(w, CAST(i AS INTEGER), 1) AS piece,
           |    CAST(300 AS BIGINT) AS cost
           |  FROM words, range(1, 200) t2(i) WHERE i <= LENGTH(w)),
           |pieces AS (SELECT piece, MIN(cost) AS cost FROM (
           |  SELECT * FROM topw UNION ALL SELECT * FROM bg
           |  UNION ALL SELECT * FROM chp) GROUP BY piece),
           |dw AS (SELECT DISTINCT w FROM words),
           |seg AS (
           |  SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS cost, CAST(0 AS BIGINT) AS np
           |  FROM dw
           |  UNION ALL
           |  SELECT s.w, s.pos + LENGTH(p.piece), s.cost + p.cost, s.np + 1
           |  FROM seg s JOIN pieces p
           |    ON s.pos + LENGTH(p.piece) <= LENGTH(s.w)
           |   AND substr(s.w, s.pos + 1, LENGTH(p.piece)) = p.piece),
           |best AS (SELECT w, cost, np FROM (
           |  SELECT w, cost, np,
           |    ROW_NUMBER() OVER (PARTITION BY w ORDER BY cost ASC, np ASC) AS rn
           |  FROM seg WHERE pos = LENGTH(w)) WHERE rn = 1)
           |SELECT wo.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           |  CAST(SUM(b.cost) AS BIGINT) AS total_cost,
           |  CAST(SUM(b.np) AS BIGINT) AS total_pieces
           |FROM words wo JOIN best b USING (w)
           |GROUP BY wo.doc_id ORDER BY wo.doc_id""".stripMargin,

      // the learned vocabulary table itself: both EM iterations
      // unrolled (path-enumeration argmin == the Spark DP's stored
      // candidate by the equal-length path-string argument), floor
      // micro-log costs, chars-kept prune — bit-for-bit
      "q292_unigram_train" ->
        s"""WITH RECURSIVE $unigramTrainCtes
           |SELECT piece, cnt, cost FROM v2 ORDER BY piece""".stripMargin,

      // inference over the LEARNED vocab: same training chain, then
      // q170's enumeration machinery with v2 pieces + the unk-char
      // fallback arm (cost 10000 for single chars absent from v2 —
      // viterbiSegment's unkCost), argmin on (cost, np)
      "q292b_viterbi_learned" ->
        s"""WITH RECURSIVE $unigramTrainCtes,
           |wa AS MATERIALIZED (SELECT doc_id, w FROM (
           |  SELECT doc_id, unnest(string_split(s, ' ')) AS w FROM t)
           |  WHERE LENGTH(w) > 0),
           |dwa AS MATERIALIZED (SELECT DISTINCT w FROM wa),
           |pf AS MATERIALIZED (SELECT piece, cost FROM v2
           |  UNION ALL
           |  SELECT DISTINCT substr(w, CAST(i AS INTEGER), 1) AS piece,
           |    CAST(10000 AS BIGINT) AS cost
           |  FROM dwa, range(1, 65) r(i)
           |  WHERE i <= LENGTH(w)
           |    AND substr(w, CAST(i AS INTEGER), 1) NOT IN
           |      (SELECT piece FROM v2)),
           |segf AS (SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS cost,
           |    CAST(0 AS BIGINT) AS np FROM dwa
           |  UNION ALL
           |  SELECT s.w, s.pos + LENGTH(p.piece), s.cost + p.cost,
           |    s.np + 1
           |  FROM segf s JOIN pf p
           |    ON s.pos + LENGTH(p.piece) <= LENGTH(s.w)
           |   AND substr(s.w, s.pos + 1, LENGTH(p.piece)) = p.piece),
           |bestf AS MATERIALIZED (SELECT w, cost, np FROM (
           |  SELECT w, cost, np, ROW_NUMBER() OVER (PARTITION BY w
           |      ORDER BY cost ASC, np ASC) AS rn
           |  FROM segf WHERE pos = LENGTH(w)) WHERE rn = 1)
           |SELECT wa.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           |  CAST(SUM(b.cost) AS BIGINT) AS total_cost,
           |  CAST(SUM(b.np) AS BIGINT) AS total_pieces
           |FROM wa JOIN bestf b USING (w)
           |GROUP BY wa.doc_id ORDER BY wa.doc_id""".stripMargin,

      // the Spark side PARSES width/height/format out of synthesized
      // header BYTES (PNG IHDR / JPEG SOF0 scan / GIF LSD); the oracle
      // replays the synthesis arithmetic — a parse reading the wrong
      // offsets or endianness hash-mismatches. Header sizes: png 33
      // (sig+IHDR+CRC), jpeg 43 (SOI+APP0+SOF0+SOS), gif 13 (hdr+LSD).
      // brightness = mean byte of the post-header payload = the text.
      "q105_multimodal_features" ->
        s"""WITH t AS (SELECT doc_id, text, octet_length(encode(text)) AS n,
           |  list_sum(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))) AS bsum
           |FROM documents)
           |SELECT doc_id,
           |  CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 43 ELSE 13 END + n AS INTEGER) AS n_bytes,
           |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format,
           |  CAST(64 + (doc_id * 13) % 577 AS INTEGER) AS width,
           |  CAST(64 + (doc_id * 7) % 409 AS INTEGER) AS height,
           |  CASE WHEN n = 0 THEN 0.0
           |       ELSE ROUND(CAST(bsum AS DOUBLE) / n / 255.0, 6) END AS brightness
           |FROM t ORDER BY doc_id""".stripMargin,

      "q105b_multimodal_resize" ->
        s"""WITH d AS (SELECT doc_id, 64 + (doc_id * 13) % 577 AS w,
           |  64 + (doc_id * 7) % 409 AS h FROM documents),
           |s AS (SELECT doc_id, w, h, LEAST(128.0 / w, 128.0 / h) AS sc FROM d)
           |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           |  CAST(FLOOR(w * sc) AS INTEGER) AS new_w,
           |  CAST(FLOOR(h * sc) AS INTEGER) AS new_h,
           |  ROUND(sc, 6) AS scale
           |FROM s ORDER BY doc_id""".stripMargin,

      // truncation thresholds mirror HeaderDecoder's structural minimums:
      // png sig 8 / full-dims 24+, jpeg SOI 2, gif magic 6 / full LSD 13.
      // k2 = effective blob length after LEAST(k, header+payload)
      "q105e_media_malformed" ->
        s"""WITH t AS (SELECT doc_id, octet_length(encode(text)) AS n,
           |  doc_id % 24 AS k, doc_id % 3 AS f FROM documents),
           |u AS (SELECT doc_id, f,
           |  LEAST(k, CASE f WHEN 0 THEN 33 WHEN 1 THEN 43 ELSE 13 END + n) AS k2 FROM t)
           |SELECT doc_id,
           |  CAST(k2 AS INTEGER) AS n_bytes,
           |  CASE WHEN f = 0 THEN (CASE WHEN k2 < 8 THEN 'unknown' ELSE 'png' END)
           |       WHEN f = 1 THEN (CASE WHEN k2 < 2 THEN 'unknown' ELSE 'jpeg' END)
           |       ELSE (CASE WHEN k2 < 6 THEN 'unknown' ELSE 'gif' END) END AS format,
           |  CASE WHEN f = 2 AND k2 >= 13 THEN CAST(64 + (doc_id * 13) % 577 AS INTEGER)
           |       ELSE -1 END AS width,
           |  CASE WHEN f = 2 AND k2 >= 13 THEN CAST(64 + (doc_id * 7) % 409 AS INTEGER)
           |       ELSE -1 END AS height
           |FROM u ORDER BY doc_id""".stripMargin,

      "q105d_audio_resample" ->
        """WITH t AS (SELECT doc_id,
          |    ([8000, 16000, 22050, 44100])[CAST(doc_id % 4 AS INTEGER) + 1] AS in_rate,
          |    (doc_id * 2654435761) % 480000 + 8000 AS n_samples
          |  FROM documents)
          |SELECT doc_id, CAST(in_rate AS INTEGER) AS in_rate, n_samples,
          |  ROUND(n_samples * 1000.0 / in_rate, 4) AS duration_ms,
          |  CAST(CEIL(n_samples * 16000.0 / in_rate) AS BIGINT) AS out_samples,
          |  CAST(CEIL(CEIL(n_samples * 16000.0 / in_rate) / 4000.0) AS BIGINT) AS n_windows
          |FROM t ORDER BY doc_id""".stripMargin,

      // replay of synthesizeWavBlob's id-derived parameters: header =
      // 44 + 12 (every 5th id's LIST chunk) bytes, blockAlign =
      // ch*bits/8 (always integral for bits in {8,16,24}), frames/
      // duration as the same integer floor divisions
      "q288_audio_header" ->
        s"""WITH t AS (SELECT doc_id, octet_length(encode(text)) AS n,
           |  list_sum(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))) AS bsum,
           |  CASE WHEN doc_id % 5 = 0 THEN 12 ELSE 0 END AS lst,
           |  1 + doc_id % 2 AS ch,
           |  8000 + 100 * ((doc_id * 17) % 361) AS rate,
           |  8 + 8 * (doc_id % 3) AS bits
           |FROM documents),
           |u AS (SELECT doc_id, n, bsum, lst, ch, rate, bits,
           |  (ch * bits) // 8 AS ba FROM t)
           |SELECT doc_id, CAST(44 + lst + n AS INTEGER) AS n_bytes,
           |  'wav' AS format, CAST(ch AS INTEGER) AS channels,
           |  CAST(rate AS INTEGER) AS sample_rate, CAST(bits AS INTEGER) AS bits,
           |  CAST(n // ba AS BIGINT) AS n_frames,
           |  CAST(((n // ba) * 1000) // rate AS BIGINT) AS duration_ms,
           |  CASE WHEN n = 0 THEN 0.0
           |       ELSE ROUND(CAST(bsum AS DOUBLE) / n / 255.0, 6) END AS amplitude
           |FROM u ORDER BY doc_id""".stripMargin,

      // the Spark side PARSES every field from synthesized ISO BMFF
      // bytes (recursive box scan); the oracle replays the synthesis
      // arithmetic — wrong offsets/endianness/16.16 handling would
      // hash-mismatch. Fixed box sizes: ftyp 16, mvhd 108, tkhd 92,
      // mdhd 32, stts 24 → moov 296 (+12 udta every 5th, +16 free)
      "q293_video_header" ->
        s"""SELECT doc_id,
           |  CAST(CASE WHEN doc_id % 5 = 0 THEN 348 ELSE 320 END
           |    + octet_length(encode(text)) AS INTEGER) AS n_bytes,
           |  'mp4' AS format,
           |  CAST(1000 AS BIGINT) AS movie_timescale,
           |  CAST(((24 + (doc_id * 7) % 721) * 1000)
           |    // (12 + doc_id % 19) AS BIGINT) AS duration_ms,
           |  CAST(128 + (doc_id * 11) % 1793 AS INTEGER) AS width,
           |  CAST(72 + (doc_id * 5) % 1009 AS INTEGER) AS height,
           |  CAST((12 + doc_id % 19) * 1000 AS BIGINT) AS fps_milli,
           |  CAST(24 + (doc_id * 7) % 721 AS BIGINT) AS n_frames
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q293b_video_frames" ->
        s"""WITH f AS (SELECT doc_id,
           |    24 + (doc_id * 7) % 721 AS nf,
           |    (12 + doc_id % 19) * 1000 AS fpsm,
           |    ((24 + (doc_id * 7) % 721) * 1000)
           |      // (12 + doc_id % 19) AS dms,
           |    128 + (doc_id * 11) % 1793 AS w,
           |    72 + (doc_id * 5) % 1009 AS h
           |  FROM documents WHERE doc_id % 7 = 0)
           |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
           |  CAST((i * 1000000) // fpsm AS BIGINT) AS ts_ms,
           |  CAST(nf AS BIGINT) AS n_frames,
           |  CAST(fpsm AS BIGINT) AS fps_milli,
           |  CAST(dms AS BIGINT) AS duration_ms,
           |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height
           |FROM f, UNNEST(range(0, nf, 4)) AS u(i)
           |ORDER BY doc_id, frame_idx""".stripMargin,

      "q105c_multimodal_frames" ->
        s"""WITH t AS (SELECT doc_id, text,
           |  CAST(CEIL(LENGTH(text) / 256.0) AS INTEGER) AS nf
           |  FROM documents WHERE doc_id % 11 = 0)
           |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
           |  CAST(LENGTH(SUBSTR(text, i * 256 + 1, 256)) AS INTEGER) AS frame_chars,
           |  SUBSTR(text, i * 256 + 1, 12) AS head12
           |FROM t, UNNEST(range(0, nf, 3)) AS u(i)
           |ORDER BY doc_id, frame_idx""".stripMargin,

      // Gramian: replay the float→double products with the same
      // left-assoc multiply order and micro-unit floor pre-sum; the
      // integer sum is association-order-free so DuckDB's plan choice
      // cannot drift
      "q172_gramian" ->
        """WITH x AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
          |    FROM embeddings, range(1, 65) t(i)),
          |p AS (SELECT a.i AS ai, b.i AS bi,
          |    CAST(FLOOR(a.v * b.v * 1000000.0) AS BIGINT) AS q
          |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i)
          |SELECT CAST(ai - 1 AS INTEGER) AS i, CAST(bi - 1 AS INTEGER) AS j,
          |  CAST(SUM(q) AS BIGINT) AS g_micro
          |FROM p GROUP BY 1, 2 ORDER BY i, j""".stripMargin,

      "q172b_column_sums" ->
        """WITH x AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
          |    FROM embeddings, range(1, 65) t(i))
          |SELECT CAST(i - 1 AS INTEGER) AS i,
          |  CAST(SUM(CAST(FLOOR(v * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_micro,
          |  COUNT(*) AS n
          |FROM x GROUP BY 1 ORDER BY i""".stripMargin,

      // integer power iteration unrolled: w = G·v exact BIGINT, rescale
      // v ← trunc(w·1000/max|w|) with the sign split because // floors
      // while the Spark side truncates toward zero
      // the whitened basis itself is double-valued and never crosses
      // engines; the oracle restates the self-proving flags as literal
      // 1s over the same (i ≤ j < 8) grid — any flag the Spark side
      // fails to earn reddens the gate (q209b pattern)
      "q296_pca_whiten" ->
        """SELECT CAST(a.i AS INTEGER) AS i, CAST(b.j AS INTEGER) AS j,
          |  1 AS ok_identity, 1 AS ok_order
          |FROM range(8) a(i), range(8) b(j) WHERE a.i <= b.j
          |ORDER BY i, j""".stripMargin,

      "q222_pca_projection" -> {
        val iters = (1 to 6).map { k =>
          s"""w$k AS MATERIALIZED (SELECT g2.i,
             |    CAST(SUM(g2.g_micro * v${k - 1}.v) AS BIGINT) AS w
             |  FROM g2 JOIN v${k - 1} ON g2.j = v${k - 1}.i GROUP BY 1),
             |m$k AS (SELECT MAX(ABS(w)) AS m FROM w$k),
             |v$k AS MATERIALIZED (SELECT i,
             |    CAST(CASE WHEN w < 0 THEN -(((-w) * 1000) // m)
             |      ELSE (w * 1000) // m END AS BIGINT) AS v
             |  FROM w$k CROSS JOIN m$k)""".stripMargin
        }.mkString(",\n")
        s"""WITH x AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS xv
           |    FROM embeddings, range(1, 65) t(i)),
           |p AS (SELECT a.i AS ai, b.i AS bi,
           |    CAST(FLOOR(a.xv * b.xv * 1000000.0) AS BIGINT) AS q
           |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i),
           |g AS MATERIALIZED (SELECT ai - 1 AS i, bi - 1 AS j,
           |    CAST(SUM(q) AS BIGINT) AS g_micro
           |  FROM p GROUP BY 1, 2),
           |g2 AS MATERIALIZED (SELECT i, j, g_micro FROM g
           |  UNION ALL SELECT j, i, g_micro FROM g WHERE i < j),
           |v0 AS (SELECT i, CAST(1000 AS BIGINT) AS v FROM range(0, 64) t(i)),
           |$iters
           |SELECT e.vec_id,
           |  CAST(SUM(CAST(FLOOR(CAST(e.embedding[t.i + 1] AS DOUBLE)
           |    * 1000000.0) AS BIGINT) * v6.v) AS BIGINT) AS proj
           |FROM embeddings e CROSS JOIN range(0, 64) t(i)
           |JOIN v6 ON v6.i = t.i
           |GROUP BY e.vec_id ORDER BY vec_id""".stripMargin
      },

      "q173_keyword_tags" ->
        """WITH k AS (SELECT kw FROM (VALUES ('spark'), ('merge'), ('a a'),
          |    ('art'), ('customer query')) AS v(kw)),
          |c AS (SELECT doc_id, kw,
          |    CAST((LENGTH(text) - LENGTH(REPLACE(text, kw, ''))) // LENGTH(kw)
          |      AS BIGINT) AS n_hits
          |  FROM documents CROSS JOIN k)
          |SELECT doc_id, kw AS keyword, n_hits FROM c
          |WHERE n_hits > 0 ORDER BY doc_id, keyword""".stripMargin,

      "q173b_keyword_summary" ->
        """WITH k AS (SELECT kw FROM (VALUES ('spark'), ('merge'), ('a a'),
          |    ('art'), ('customer query')) AS v(kw)),
          |c AS (SELECT doc_id, kw,
          |    CAST((LENGTH(text) - LENGTH(REPLACE(text, kw, ''))) // LENGTH(kw)
          |      AS BIGINT) AS n_hits
          |  FROM documents CROSS JOIN k)
          |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_keywords,
          |  CAST(SUM(n_hits) AS BIGINT) AS total_hits
          |FROM c WHERE n_hits > 0 GROUP BY doc_id ORDER BY doc_id""".stripMargin
    )
  }
}
