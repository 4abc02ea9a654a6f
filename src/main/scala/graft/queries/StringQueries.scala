package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** String function surface — SURVEY.md §2.7 (`Series.str.*` families:
  * case/shape, measure, predicate, find, extract, replace, slice, split,
  * strip/pad, combine, convert) plus the JSON accessors (§2.7 json row:
  * `get_json_object` / `from_json` over events.props).
  *
  * Reference anchors: [python/cudf/cudf/core/column/string.py :: class
  * StringMethods], kernels [cpp/src/strings/]. Elementwise ⇒ embarrassingly
  * parallel; everything here stays inside WholeStageCodegen (no UDFs).
  *
  * Dialect notes (verified against DuckDB 1.0 this session):
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark's
  *    replace-all; its backrefs are \1 vs Spark's $1.
  *  - DuckDB has no initcap — emulated with upper(substr(..,1,1))||...
  *  - locate/instr and strpos are both 1-based (SURVEY §2.7 flagged the
  *    off-by-one; it applies to cudf's 0-based find, not DuckDB).
  */
object StringQueries extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    // case/shape + measure + strip/pad + combine families
    "q40_str_case_pad" -> ((s, d) => {
      Tables.customer(s, d)
        .filter(col("c_custkey") % 37 === 0)
        .select(
          col("c_custkey"),
          lower(col("c_name")).as("lo_name"),
          upper(col("c_mktsegment")).as("up_seg"),
          initcap(lower(col("c_mktsegment"))).as("cap_seg"),
          length(col("c_name")).as("name_len"),
          octet_length(col("c_name")).as("name_bytes"),
          reverse(col("c_mktsegment")).as("rev_seg"),
          lpad(col("c_nationkey").cast("string"), 4, "0").as("nk_pad"),
          rpad(col("c_mktsegment"), 12, ".").as("seg_rpad"),
          trim(lit("  pad  ")).as("trimmed"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
          repeat(lit("ab"), 3).as("rep"))
        .orderBy(col("c_custkey"))
    }),

    // predicate family: contains/startswith/endswith/is-classes
    "q41_str_predicates" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") % 13 === 0)
        .select(
          col("p_partkey"),
          col("p_name").contains("ring").cast("int").as("has_ring"),
          col("p_name").startsWith("small").cast("int").as("starts_small"),
          col("p_name").endsWith("bolt").cast("int").as("ends_bolt"),
          col("p_name").rlike("^[a-z ]+$").cast("int").as("is_alpha_space"),
          col("p_brand").rlike("[0-9]").cast("int").as("brand_has_digit"),
          col("p_name").like("%red%").cast("int").as("like_red"))
        .orderBy(col("p_partkey"))
    }),

    // find + slice + split families
    "q42_str_find_slice" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") % 13 === 0)
        .select(
          col("p_partkey"),
          instr(col("p_name"), " ").as("sp_pos"),
          substring(col("p_name"), 1, 4).as("head4"),
          expr("substring(p_name, -3, 3)").as("tail3"),
          substring_index(col("p_name"), " ", 1).as("first_word"),
          substring_index(col("p_name"), " ", -1).as("last_word"))
        .orderBy(col("p_partkey"))
    }),

    // replace family: regexp_replace (global), literal replace, translate
    // slice_replace (str.slice_replace — overwrite a character range)
    "q42b_overlay" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") % 13 === 0)
        .select(
          col("p_partkey"),
          overlay(col("p_name"), lit("XX"), lit(2), lit(3)).as("mid_replaced"),
          overlay(col("p_name"), lit("> "), lit(1), lit(0)).as("prefixed"))
        .orderBy(col("p_partkey"))
    }),

    "q43_str_replace" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") % 13 === 0)
        .select(
          col("p_partkey"),
          regexp_replace(col("p_brand"), "[0-9]+", "#").as("brand_masked"),
          expr("replace(p_name, ' ', '_')").as("snake_name"),
          translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
          regexp_replace(col("p_name"), "(\\w+) (\\w+)", "$2 $1").as("swapped"))
        .orderBy(col("p_partkey"))
    }),

    // pandas str.count(pat): non-overlapping regex match count
    // (Spark regexp_count vs DuckDB len(regexp_extract_all) — two
    // independent regex engines agreeing on the count)
    "q43b_str_count" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") % 13 === 0)
        .select(
          col("p_partkey"),
          expr("regexp_count(p_name, '[aeiou]')").as("n_vowels"),
          expr("regexp_count(p_name, '[a-z]+')").as("n_words"),
          expr("regexp_count(p_brand, '[0-9]')").as("n_digits"))
        .orderBy(col("p_partkey"))
    }),

    // extract family: regexp_extract groups + findall count
    "q44_str_extract" -> ((s, d) => {
      Tables.customer(s, d)
        .filter(col("c_custkey") % 37 === 0)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "Customer#(\\d+)", 1).as("id_str"),
          regexp_extract(col("c_name"), "(\\d+)", 1).cast("long").as("id_num"),
          size(regexp_extract_all(col("c_name"), lit("[0-9]"), lit(0))).as("n_digits"))
        .orderBy(col("c_custkey"))
    }),

    // split family + token array ops on documents
    "q45_str_split" -> ((s, d) => {
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens"),
          element_at(split(col("text"), " "), 1).as("first_tok"),
          element_at(split(col("text"), " "), -1).as("last_tok"))
        .orderBy(col("doc_id"))
    }),

    // convert family: string<->number, hex, conv
    // ip2int / int2ip (reference convert family): dotted-quad strings
    // synthesized deterministically from the key, packed to the 32-bit
    // int and unpacked back via shifts+masks
    "q46b_ip_convert" -> ((s, d) => {
      val df = Tables.part(s, d).filter(pmod(col("p_partkey"), lit(7)) === 0)
        .withColumn("ip", concat_ws(".", lit(10),
          pmod(col("p_partkey"), lit(250)),
          pmod(col("p_partkey"), lit(100)),
          pmod(col("p_partkey"), lit(256))))
      val p = split(col("ip"), "\\.")
      df.select(col("p_partkey"), col("ip"),
          (element_at(p, 1).cast("long") * 16777216L +
            element_at(p, 2).cast("long") * 65536L +
            element_at(p, 3).cast("long") * 256L +
            element_at(p, 4).cast("long")).as("ip_int"))
        .withColumn("ip_roundtrip", concat_ws(".",
          shiftright(col("ip_int"), 24).bitwiseAND(lit(255L)),
          shiftright(col("ip_int"), 16).bitwiseAND(lit(255L)),
          shiftright(col("ip_int"), 8).bitwiseAND(lit(255L)),
          col("ip_int").bitwiseAND(lit(255L))))
        .orderBy(col("p_partkey"))
    }),

    // normalize_characters analog: accent-fold via codepoint translate
    // (accents injected deterministically first — the fixture is ASCII)
    "q107b_normalize_chars" -> ((s, d) => {
      Tables.documents(s, d).filter(pmod(col("doc_id"), lit(17)) === 0)
        .select(col("doc_id"), substring(col("text"), 1, 30).as("s"))
        .withColumn("accented",
          translate(col("s"), "aeiouAEIOU", "àéîöüÀÉÎÖÜ"))
        .withColumn("normalized",
          lower(translate(col("accented"),
            "àéîöüÀÉÎÖÜ", "aeiouAEIOU")))
        .withColumn("norm_ok",
          (col("normalized") === lower(col("s"))).cast("int"))
        .orderBy(col("doc_id"))
    }),

    "q46_str_convert" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") % 13 === 0)
        .select(
          col("p_partkey"),
          regexp_extract(col("p_brand"), "(\\d+)", 1).cast("int").as("brand_num"),
          hex(col("p_partkey")).as("key_hex"),
          conv(hex(col("p_partkey")), 16, 10).cast("long").as("key_roundtrip"),
          ascii(substring(col("p_name"), 1, 1)).as("first_cp"),
          expr("chr(97)").as("chr_a"))
        .orderBy(col("p_partkey"))
    }),

    // edit distance (nvtext family; Spark built-in levenshtein)
    "q47_str_levenshtein" -> ((s, d) => {
      val a = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 20).as("head_a"))
      val b = Tables.documents(s, d)
        .select((col("doc_id") - 1).as("doc_id"), substring(col("text"), 1, 20).as("head_b"))
      a.join(b, Seq("doc_id"))
        .select(col("doc_id"), levenshtein(col("head_a"), col("head_b")).as("edit_dist"))
        .orderBy(col("doc_id"))
    }),

    // JSON accessors over events.props
    "q48_json" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_id") % 101 === 0)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k_struct"))
        .orderBy(col("event_id"))
    }),

    // title-case + delimited-field accessors (reference str.title /
    // str.istitle and nvtext detokenize-adjacent slicing). Whitespace is
    // normalized first so both engines tokenize identically.
    "q49_str_title" -> ((s, d) => {
      val norm = regexp_replace(col("text"), "\\s+", " ")
      Tables.documents(s, d).filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"),
          initcap(lower(substring(norm, 1, 40))).as("title40"),
          substring_index(norm, " ", 3).as("first3"),
          split_part(norm, lit(" "), lit(2)).as("word2"))
        .orderBy(col("doc_id"))
    }),

    // str.slice with step≠1 (reference slice(start, stop, step) —
    // SURVEY §7.3 long-tail row): every-kth-char via backreference
    // regex, so it stays a codegen'd built-in instead of a UDF
    "q42c_slice_step" -> ((s, d) => {
      val win = substring(col("text"), 3, 20)
      Tables.documents(s, d).filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"),
          win.as("base"),
          regexp_replace(win, "(.).", "$1").as("step2"),
          regexp_replace(win, "(.)..", "$1").as("step3"))
        .orderBy(col("doc_id"))
    }),

    // banded edit distance (NEW r8): exact Levenshtein when <= bound,
    // -1 past it — the O(bound·len) pair-scoring kernel
    // (EditDistanceBounded, codegen'd); the oracle disagrees-or-agrees
    // via DuckDB's INDEPENDENT full-matrix levenshtein
    "q198_edit_distance_bounded" -> ((s, d) => {
      import graft.expressions.TextHashes
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_name"), col("c_mktsegment"))
      c.as("a").join(c.as("b"), col("a.k") + 1 === col("b.k"))
        .select(col("a.k").as("k"),
          TextHashes.edit_distance_bounded(
            col("a.c_name"), col("b.c_name"), 3).as("d_names"),
          TextHashes.edit_distance_bounded(
            col("a.c_name"), col("a.c_mktsegment"), 5).as("d_name_seg"))
        .orderBy(col("k"))
    }),

    // URL decomposition + domain blocklist (corpus filtering pass) —
    // TextAnalysis.urlParts, pure codegen'd regexp chains
    "q149_url_parse" -> ((s, d) => {
      import s.implicits._
      val p = graft.ops.TextAnalysis.urlParts(col("url"))
      urlFixture.toDF("uid", "url")
        .select(col("uid"), col("url"), p.as("p"))
        .select(col("uid"), col("url"),
          col("p.scheme").as("scheme"), col("p.host").as("host"),
          col("p.port").as("port"), col("p.path").as("path"),
          col("p.query").as("query"), col("p.tld").as("tld"),
          col("p.domain").as("domain"),
          col("p.path_depth").cast("int").as("path_depth"),
          col("p.domain").isin(urlBlocklist: _*).cast("int").as("blocked"))
        .orderBy(col("uid"))
    }),

    // URL canonicalization + dedup census (NEW r8): the crawl-frontier
    // normalizer — tracking params, fragments, default ports, www,
    // scheme/host case all collapse; grouped to (canonical,
    // n_variants, keep_id). VALUES fixture gated by independent
    // engine implementations of the same steps (q149's pattern)
    "q195_url_canonical" -> ((s, d) => {
      import s.implicits._
      graft.ops.TextAnalysis.canonicalUrlGroups(
          canonFixture.toDF("uid", "url"), "uid", "url")
        .orderBy(col("canonical"))
    }),

    // unicode-script profile (NEW r8): per-doc script codepoint counts
    // + floor-bp shares + dominant script, on a mixed-script VALUES
    // fixture (the documents fixture is all-latin — it would gate
    // nothing); both engines count via the same explicit ranges
    "q193_script_profile" -> ((s, d) => {
      import s.implicits._
      val p = graft.ops.TextAnalysis.scriptProfile(col("text"))
      scriptFixture.toDF("sid", "text")
        .select(col("sid"), p.as("p"))
        .select(col("sid"), col("p.latin").as("latin"),
          col("p.cyrillic").as("cyrillic"), col("p.cjk").as("cjk"),
          col("p.arabic").as("arabic"), col("p.latin_bp").as("latin_bp"),
          col("p.cyrillic_bp").as("cyrillic_bp"),
          col("p.cjk_bp").as("cjk_bp"), col("p.arabic_bp").as("arabic_bp"),
          col("p.dominant").as("dominant"))
        .orderBy(col("sid"))
    })
  )

  /** Mixed-script fixture for q193 (VALUES both sides). */
  private val scriptFixture: Seq[(Int, String)] = Seq(
    1 -> "hello plain english text",
    2 -> "привет мир mixed with latin",
    3 -> "中文文本と日本語",
    4 -> "مرحبا world",
    5 -> "1234 !!! ...",
    6 -> "")

  /** Canonicalization fixture for q195: each group of surface forms
    * must collapse to one canonical URL.
    */
  private val canonFixture: Seq[(Int, String)] = Seq(
    1 -> "https://www.example.com/Page?utm_source=x&id=1",
    2 -> "HTTPS://EXAMPLE.COM/Page?id=1#section",
    3 -> "https://example.com:443/Page?id=1",
    4 -> " https://example.com/Page?id=1&utm_campaign=spring ",
    5 -> "http://shop.example.net/list?gclid=abc123",
    6 -> "http://shop.example.net:80/list",
    7 -> "https://other.org/a?fbclid=zz&q=2&ref=tw",
    8 -> "https://other.org/a?q=2",
    9 -> "http://unique.io/solo",
    10 -> "https://example.com/page",  // path case differs from /Page — stays separate
    // r9 adversarial rows (advice): params/paths the old UNANCHORED
    // tracking regex mangled — 'href='/'pref=' must survive, a
    // '/ref=' path segment must survive, and a run of tracking params
    // must collapse cleanly
    11 -> "https://other.org/a?href=tw&q=2",
    12 -> "https://shop.example.com/dp/B01/ref=sr_1_1?pref=keep&utm_source=x",
    13 -> "https://shop.example.com/dp/B01/ref=sr_1_1?pref=keep",
    14 -> "https://track.example.org/p?utm_aa=1&utm_bb=2&gclid=g",
    15 -> "https://track.example.org/p")

  /** URL fixture shared by q149 and its oracle (VALUES on both sides,
    * like q108): each engine parses independently with the SAME
    * RE2-safe patterns, so any divergence in the regex kernels gates.
    */
  private val urlFixture: Seq[(Int, String)] = Seq(
    1 -> "https://www.example.com/a/b/c?x=1&y=2",
    2 -> "http://spam.bad-site.org/landing",
    3 -> "https://sub.shop.example.co/products/",
    4 -> "ftp://files.archive.net:2121/pub/data.bin",
    5 -> "https://example.com",
    6 -> "http://ads.tracker.io/p?id=9#frag",
    7 -> "https://docs.example.com:8443/kb/how-to",
    8 -> "http://bad-site.org/",
    9 -> "https://en.wiki.example.org/wiki/Main_Page",
    10 -> "http://example.net/x//y/")

  private val urlBlocklist = Seq("bad-site.org", "tracker.io")

  override def oracle: Map[String, String] = Map(
    "q40_str_case_pad" ->
      """SELECT c_custkey,
        |  LOWER(c_name) AS lo_name,
        |  UPPER(c_mktsegment) AS up_seg,
        |  UPPER(SUBSTR(LOWER(c_mktsegment),1,1)) || SUBSTR(LOWER(c_mktsegment),2) AS cap_seg,
        |  LENGTH(c_name) AS name_len,
        |  STRLEN(c_name) AS name_bytes,
        |  REVERSE(c_mktsegment) AS rev_seg,
        |  LPAD(CAST(c_nationkey AS VARCHAR), 4, '0') AS nk_pad,
        |  RPAD(c_mktsegment, 12, '.') AS seg_rpad,
        |  TRIM('  pad  ') AS trimmed,
        |  CONCAT_WS('|', c_mktsegment, c_name) AS joined,
        |  REPEAT('ab', 3) AS rep
        |FROM customer WHERE c_custkey % 37 = 0 ORDER BY c_custkey""".stripMargin,

    "q41_str_predicates" ->
      """SELECT p_partkey,
        |  CAST(CONTAINS(p_name, 'ring') AS INTEGER) AS has_ring,
        |  CAST(STARTS_WITH(p_name, 'small') AS INTEGER) AS starts_small,
        |  CAST(p_name LIKE '%bolt' AS INTEGER) AS ends_bolt,
        |  CAST(REGEXP_MATCHES(p_name, '^[a-z ]+$') AS INTEGER) AS is_alpha_space,
        |  CAST(REGEXP_MATCHES(p_brand, '[0-9]') AS INTEGER) AS brand_has_digit,
        |  CAST(p_name LIKE '%red%' AS INTEGER) AS like_red
        |FROM part WHERE p_partkey % 13 = 0 ORDER BY p_partkey""".stripMargin,

    "q42_str_find_slice" ->
      """SELECT p_partkey,
        |  STRPOS(p_name, ' ') AS sp_pos,
        |  SUBSTR(p_name, 1, 4) AS head4,
        |  SUBSTR(p_name, LENGTH(p_name) - 2, 3) AS tail3,
        |  SPLIT_PART(p_name, ' ', 1) AS first_word,
        |  SPLIT_PART(p_name, ' ', LEN(STRING_SPLIT(p_name, ' '))) AS last_word
        |FROM part WHERE p_partkey % 13 = 0 ORDER BY p_partkey""".stripMargin,

    "q42b_overlay" ->
      """SELECT p_partkey,
        |  substr(p_name, 1, 1) || 'XX' || substr(p_name, 5) AS mid_replaced,
        |  '> ' || p_name AS prefixed
        |FROM part WHERE p_partkey % 13 = 0 ORDER BY p_partkey""".stripMargin,

    "q43_str_replace" ->
      """SELECT p_partkey,
        |  REGEXP_REPLACE(p_brand, '[0-9]+', '#', 'g') AS brand_masked,
        |  REPLACE(p_name, ' ', '_') AS snake_name,
        |  TRANSLATE(p_name, 'aeiou', 'AEIOU') AS vowels_up,
        |  REGEXP_REPLACE(p_name, '(\w+) (\w+)', '\2 \1', 'g') AS swapped
        |FROM part WHERE p_partkey % 13 = 0 ORDER BY p_partkey""".stripMargin,

    "q43b_str_count" ->
      """SELECT p_partkey,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(p_name, '[aeiou]')) AS INTEGER) AS n_vowels,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(p_name, '[a-z]+')) AS INTEGER) AS n_words,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(p_brand, '[0-9]')) AS INTEGER) AS n_digits
        |FROM part WHERE p_partkey % 13 = 0 ORDER BY p_partkey""".stripMargin,

    "q44_str_extract" ->
      """SELECT c_custkey,
        |  REGEXP_EXTRACT(c_name, 'Customer#(\d+)', 1) AS id_str,
        |  CAST(REGEXP_EXTRACT(c_name, '(\d+)', 1) AS BIGINT) AS id_num,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(c_name, '[0-9]')) AS INTEGER) AS n_digits
        |FROM customer WHERE c_custkey % 37 = 0 ORDER BY c_custkey""".stripMargin,

    "q45_str_split" ->
      """SELECT doc_id,
        |  CAST(LEN(STRING_SPLIT(text, ' ')) AS INTEGER) AS n_tokens,
        |  STRING_SPLIT(text, ' ')[1] AS first_tok,
        |  STRING_SPLIT(text, ' ')[-1] AS last_tok
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q46b_ip_convert" ->
      """WITH t AS (SELECT p_partkey,
        |    '10.' || (p_partkey % 250) || '.' || (p_partkey % 100) || '.'
        |      || (p_partkey % 256) AS ip
        |  FROM part WHERE p_partkey % 7 = 0),
        |i AS (SELECT p_partkey, ip,
        |    CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
        |      + CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
        |      + CAST(string_split(ip, '.')[3] AS BIGINT) * 256
        |      + CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_int
        |  FROM t)
        |SELECT p_partkey, ip, ip_int,
        |  ((ip_int >> 24) & 255) || '.' || ((ip_int >> 16) & 255) || '.'
        |    || ((ip_int >> 8) & 255) || '.' || (ip_int & 255) AS ip_roundtrip
        |FROM i ORDER BY p_partkey""".stripMargin,

    "q107b_normalize_chars" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 30) AS s FROM documents
        |  WHERE doc_id % 17 = 0),
        |a AS (SELECT doc_id, s,
        |    translate(s, 'aeiouAEIOU', 'àéîöüÀÉÎÖÜ') AS accented FROM t)
        |SELECT doc_id, s, accented,
        |  LOWER(translate(accented, 'àéîöüÀÉÎÖÜ', 'aeiouAEIOU')) AS normalized,
        |  CAST(LOWER(translate(accented, 'àéîöüÀÉÎÖÜ', 'aeiouAEIOU'))
        |    = LOWER(s) AS INTEGER) AS norm_ok
        |FROM a ORDER BY doc_id""".stripMargin,

    "q46_str_convert" ->
      """SELECT p_partkey,
        |  CAST(REGEXP_EXTRACT(p_brand, '(\d+)', 1) AS INTEGER) AS brand_num,
        |  UPPER(TO_HEX(p_partkey)) AS key_hex,
        |  CAST(p_partkey AS BIGINT) AS key_roundtrip,
        |  ASCII(SUBSTR(p_name, 1, 1)) AS first_cp,
        |  CHR(97) AS chr_a
        |FROM part WHERE p_partkey % 13 = 0 ORDER BY p_partkey""".stripMargin,

    "q47_str_levenshtein" ->
      """SELECT a.doc_id, LEVENSHTEIN(SUBSTR(a.text,1,20), SUBSTR(b.text,1,20)) AS edit_dist
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY a.doc_id""".stripMargin,

    "q48_json" ->
      """SELECT event_id,
        |  JSON_EXTRACT_STRING(props, '$.k') AS k_str,
        |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k_struct
        |FROM events WHERE event_id % 101 = 0 ORDER BY event_id""".stripMargin,

    // DuckDB has no initcap/substring_index: title-case via per-word
    // transform, first-N-fields via slice+join
    "q49_str_title" ->
      """SELECT doc_id,
        |  ARRAY_TO_STRING(LIST_TRANSFORM(
        |    STRING_SPLIT(LOWER(SUBSTR(REGEXP_REPLACE(text, '\s+', ' ', 'g'), 1, 40)), ' '),
        |    w -> UPPER(w[1:1]) || w[2:]), ' ') AS title40,
        |  ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(REGEXP_REPLACE(text, '\s+', ' ', 'g'), ' '), 1, 3), ' ') AS first3,
        |  SPLIT_PART(REGEXP_REPLACE(text, '\s+', ' ', 'g'), ' ', 2) AS word2
        |FROM documents WHERE doc_id % 11 = 0 ORDER BY doc_id""".stripMargin,

    "q42c_slice_step" ->
      """SELECT doc_id,
        |  SUBSTR(text, 3, 20) AS base,
        |  REGEXP_REPLACE(SUBSTR(text, 3, 20), '(.).', '\1', 'g') AS step2,
        |  REGEXP_REPLACE(SUBSTR(text, 3, 20), '(.)..', '\1', 'g') AS step3
        |FROM documents WHERE doc_id % 11 = 0 ORDER BY doc_id""".stripMargin,

    "q149_url_parse" -> {
      val vals = urlFixture.map { case (i, u) => s"($i, '$u')" }.mkString(", ")
      val block = urlBlocklist.map(dm => s"'$dm'").mkString(", ")
      s"""WITH u AS (SELECT * FROM (VALUES $vals) AS v(uid, url)),
         |p AS (SELECT uid, url,
         |  regexp_extract(url, '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
         |  regexp_extract(url, '^[a-z][a-z0-9+.-]*://(?:[^/?#]*@)?([a-z0-9.-]+)', 1) AS host,
         |  regexp_extract(url, '^[a-z][a-z0-9+.-]*://[a-z0-9.-]*:([0-9]+)', 1) AS port,
         |  regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
         |  regexp_extract(url, '\\?([^#]*)', 1) AS query FROM u)
         |SELECT uid, url, scheme, host, port, path, query,
         |  regexp_extract(host, '\\.([a-z0-9-]+)$$', 1) AS tld,
         |  regexp_extract(host, '([a-z0-9-]+\\.[a-z0-9-]+)$$', 1) AS domain,
         |  CAST(len(list_filter(string_split(path, '/'), x -> x <> '')) AS INTEGER) AS path_depth,
         |  CAST(regexp_extract(host, '([a-z0-9-]+\\.[a-z0-9-]+)$$', 1) IN ($block) AS INTEGER) AS blocked
         |FROM p ORDER BY uid""".stripMargin
    },

    "q198_edit_distance_bounded" ->
      """WITH c AS (SELECT c_custkey AS k, c_name, c_mktsegment FROM customer),
        |p AS (SELECT a.k AS k, a.c_name AS n1, b.c_name AS n2,
        |    a.c_mktsegment AS ad
        |  FROM c a JOIN c b ON a.k + 1 = b.k)
        |SELECT k,
        |  CASE WHEN levenshtein(n1, n2) <= 3
        |    THEN CAST(levenshtein(n1, n2) AS INTEGER)
        |    ELSE CAST(-1 AS INTEGER) END AS d_names,
        |  CASE WHEN levenshtein(n1, ad) <= 5
        |    THEN CAST(levenshtein(n1, ad) AS INTEGER)
        |    ELSE CAST(-1 AS INTEGER) END AS d_name_seg
        |FROM p ORDER BY k""".stripMargin,

    "q195_url_canonical" -> {
      val vals = canonFixture.map { case (i, u) => s"($i, '$u')" }.mkString(", ")
      // independent DuckDB implementation of the same canonicalization
      // steps (RE2 dialect: \\1 backrefs, 'g' for global)
      s"""WITH u AS (SELECT * FROM (VALUES $vals) AS v(uid, url)),
         |s1 AS (SELECT uid, regexp_replace(trim(url), '#.*$$', '') AS c FROM u),
         |s2 AS (SELECT uid, CASE
         |    WHEN regexp_extract(c, '^[^/]*//[^/]*') = '' THEN c
         |    ELSE lower(regexp_extract(c, '^[^/]*//[^/]*'))
         |      || regexp_replace(c, '^[^/]*//[^/]*', '') END AS c FROM s1),
         |s3 AS (SELECT uid, regexp_replace(c,
         |    '^([a-z][a-z0-9+.-]*://)www\\.', '\\1') AS c FROM s2),
         |s4 AS (SELECT uid, regexp_replace(c,
         |    '^([a-z][a-z0-9+.-]*://[^/:]+):(?:80|443)(/|$$)', '\\1\\2') AS c
         |  FROM s3),
         |s5 AS (SELECT uid, regexp_replace(c,
         |    '([?&])(utm_[a-z]+|gclid|fbclid|ref)=[^&#]*', '\\1', 'g') AS c
         |  FROM s4),
         |s6 AS (SELECT uid, regexp_replace(regexp_replace(regexp_replace(c,
         |    '&&+', '&', 'g'), '\\?&', '?'), '[?&]+$$', '') AS c FROM s5)
         |SELECT c AS canonical, COUNT(*) AS n_variants,
         |  CAST(MIN(uid) AS BIGINT) AS keep_id
         |FROM s6 GROUP BY c ORDER BY c""".stripMargin
    },

    "q193_script_profile" -> {
      val vals = scriptFixture.map { case (i, t) => s"($i, '$t')" }.mkString(", ")
      def cnt(r: String) = s"CAST(length(regexp_replace(text, '[^$r]', '', 'g')) AS BIGINT)"
      val latin = cnt("a-zA-Z")
      val cyr = cnt("\\x{0400}-\\x{04FF}")
      val cjk = cnt("\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}")
      val arab = cnt("\\x{0600}-\\x{06FF}")
      s"""WITH u AS (SELECT * FROM (VALUES $vals) AS v(sid, text)),
         |c AS (SELECT sid, $latin AS latin, $cyr AS cyrillic,
         |    $cjk AS cjk, $arab AS arabic FROM u),
         |t AS (SELECT *, latin + cyrillic + cjk + arabic AS letters FROM c)
         |SELECT sid, latin, cyrillic, cjk, arabic,
         |  CASE WHEN letters > 0 THEN (10000 * latin) // letters ELSE 0 END AS latin_bp,
         |  CASE WHEN letters > 0 THEN (10000 * cyrillic) // letters ELSE 0 END AS cyrillic_bp,
         |  CASE WHEN letters > 0 THEN (10000 * cjk) // letters ELSE 0 END AS cjk_bp,
         |  CASE WHEN letters > 0 THEN (10000 * arabic) // letters ELSE 0 END AS arabic_bp,
         |  CASE WHEN letters = 0 THEN 'other'
         |    WHEN latin >= cyrillic AND latin >= cjk AND latin >= arabic THEN 'latin'
         |    WHEN cyrillic >= cjk AND cyrillic >= arabic THEN 'cyrillic'
         |    WHEN cjk >= arabic THEN 'cjk'
         |    ELSE 'arabic' END AS dominant
         |FROM t ORDER BY sid""".stripMargin
    }
  )
}
