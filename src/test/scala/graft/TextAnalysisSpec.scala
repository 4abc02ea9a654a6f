package graft

import org.apache.spark.sql.functions._
import graft.ops.{Porter, TextAnalysis}

/** nvtext long-tail parity: Porter stemmer golden values (canonical
  * examples from Porter 1980), char n-grams, code points.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("viterbiSegment finds the optimal split greedy longest-match misses") {
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    // greedy longest-first takes "abc"=100; the DP takes "ab"+"c"=20
    val vocab = Seq(("ab", 10L), ("abc", 100L), ("c", 10L),
      ("a", 300L), ("b", 300L)).toDF("piece", "cost")
    val r = TextAnalysis.viterbiSegment(docs, "doc_id", "text", vocab).head()
    assert(r.getAs[Long]("total_cost") == 20 && r.getAs[Long]("total_pieces") == 2)
  }

  test("viterbiSegment: equal-cost tie prefers fewer pieces; unknown chars cost unkCost") {
    val docs = Seq((1L, "ab"), (2L, "xq xq")).toDF("doc_id", "text")
    val vocab = Seq(("ab", 20L), ("a", 10L), ("b", 10L)).toDF("piece", "cost")
    val r = TextAnalysis.viterbiSegment(docs, "doc_id", "text", vocab, unkCost = 7L)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    // "ab": whole piece (cost 20, 1 piece) beats a+b (cost 20, 2 pieces)
    assert(r(1L).getAs[Long]("total_cost") == 20 && r(1L).getAs[Long]("total_pieces") == 1)
    // two OOV words of two unknown chars each: 4 × unkCost, 4 pieces
    assert(r(2L).getAs[Long]("n_words") == 2)
    assert(r(2L).getAs[Long]("total_cost") == 28 && r(2L).getAs[Long]("total_pieces") == 4)
  }

  test("gopherRules: each rule fires on its crafted violation") {
    val longOk = (1 to 60).map(i => s"word${i % 7} and the").mkString(" ")
    val docs = Seq(
      (1L, longOk),                                   // passes everything
      (2L, "too short but the and of"),               // fails ok_words only
      (3L, longOk + " " + (1 to 30).map(_ => "###### ......").mkString(" ")), // symbols
      (4L, (1 to 60).map(_ => "the supercalifragilisticexpialidocious and").mkString(" ")), // avg len > 10
      (5L, (1 to 60).map(i => s"w$i x$i").mkString(" "))  // no stopword pair
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("gopher_pass"))
    assert(!r(2L).getAs[Boolean]("ok_words") && r(2L).getAs[Boolean]("ok_stop"))
    assert(!r(3L).getAs[Boolean]("ok_symbol"))
    assert(!r(4L).getAs[Boolean]("ok_avg_len"))
    assert(!r(5L).getAs[Boolean]("ok_stop") && r(5L).getAs[Boolean]("ok_words"))
    assert(Seq(2L, 3L, 4L, 5L).forall(i => !r(i).getAs[Boolean]("gopher_pass")))
  }

  test("gopherRules: line-based rules fire on bullet/ellipsis-heavy docs") {
    val body = (1 to 60).map(_ => "the and of words here").mkString(" ")
    val bullets = (1 to 10).map(i => s"- item $i the and").mkString("\n")
    val ell = (1 to 10).map(i => s"line $i the and trails...").mkString("\n")
    val docs = Seq((1L, body), (2L, bullets), (3L, ell)).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "doc_id", "text", minWords = 10)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("ok_bullet") && r(1L).getAs[Boolean]("ok_ellipsis"))
    assert(!r(2L).getAs[Boolean]("ok_bullet"))
    assert(!r(3L).getAs[Boolean]("ok_ellipsis"))
  }

  test("porter stemmer matches canonical examples") {
    val golden = Map(
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
    val bad = golden.filter { case (in, want) => Porter.stem(in) != want }
      .map { case (in, want) => s"$in: got ${Porter.stem(in)}, want $want" }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("porter stemmer runs as a column expression") {
    val res = Seq("running", "flies", "denied").toDF("w")
      .select(TextAnalysis.porterStem(col("w"))).as[String].collect().toSeq
    assert(res == Seq("run", "fli", "deni"))
  }

  test("char ngrams are distinct sliding windows over normalized text") {
    val res = Seq("abcabc").toDF("t")
      .select(TextAnalysis.charNgrams(col("t"), 3)).as[Seq[String]].head()
    assert(res == Seq("abc", "bca", "cab"))
  }

  test("code points round-trip ascii") {
    val res = Seq("Ab z").toDF("t")
      .select(TextAnalysis.codePoints(col("t"))).as[Seq[Int]].head()
    assert(res == Seq(65, 98, 32, 122))
  }

  test("wordpiece greedy longest-match-first: golden splits") {
    val v = TextAnalysis.wordpieceVocab
    def pieces(w: String): List[String] =
      TextAnalysis.wordpieceWord(w).map(v)
    assert(pieces("the") == List("the"))            // full-word hit
    assert(pieces("fast") == List("fast"))          // beats prefix 'fa'
    assert(pieces("faster") == List("fast", "##er"))
    assert(pieces("slow") == List("sl", "##ow"))    // beats single 's'
    assert(pieces("window") == List("wind", "##ow"))
    assert(pieces("customer") == List("cust", "##omer"))
    assert(pieces("scan") == List("sca", "##n"))    // single-char cont
    assert(pieces("a") == List("a"))
    assert(pieces("x9z") == List("[UNK]"))          // digit kills WHOLE word
    assert(pieces("zzz") == List("z", "##z", "##z"))
    assert(pieces("##ow") == List("[UNK]"))         // no cont piece at pos 0
  }

  test("wordpieceTokenize emits per-doc counts and the id stream") {
    val df = Seq((1L, "The  FAST window"), (2L, ""), (3L, "x9z scan"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.wordpieceTokenize(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val v = TextAnalysis.wordpieceVocab
    val ids = Seq(v.indexOf("the"), v.indexOf("fast"),
      v.indexOf("wind"), v.indexOf("##ow")).mkString(" ")
    assert(r(0).getAs[Int]("n_words") == 3 &&
      r(0).getAs[String]("token_ids") == ids)
    assert(r(1).getAs[Int]("n_tokens") == 0 &&
      r(1).getAs[String]("token_ids") == "")
    assert(r(2).getAs[Int]("n_unk") == 1) // x9z -> [UNK], scan -> 2 ids
    assert(r(2).getAs[Int]("n_tokens") == 3)
  }

  test("replaceTokens swaps whole tokens only") {
    val df = Seq("the theater of The and sand").toDF("text")
    val got = df.select(TextAnalysis.replaceTokens(col("text"),
      Seq("the", "and", "of"), Seq("THE", "AND", "OF"))).first.getString(0)
    // 'theater'/'sand' untouched; norm lowercases 'The' first
    assert(got == "THE theater OF THE AND sand")
  }

  test("filterTokens drops or marks short tokens") {
    val df = Seq("a big cat leaps up").toDF("text")
    assert(df.select(TextAnalysis.filterTokens(col("text"), 4))
      .first.getString(0) == "leaps")
    assert(df.select(TextAnalysis.filterTokens(col("text"), 3, "_"))
      .first.getString(0) == "_ big cat leaps _")
  }

  test("characterTokenize rows carry 1-based positions") {
    val df = Seq((1L, "ab"), (2L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.characterTokenize(df, "doc_id", "text")
      .orderBy("doc_id", "pos").collect()
    assert(r.map(x => (x.getLong(0), x.getInt(1), x.getString(2))).toSeq ==
      Seq((1L, 1, "a"), (1L, 2, "b"), (2L, 1, "")))
  }

  test("detokenize reassembles by position within each id") {
    val toks = Seq((1L, 2, "c"), (1L, 0, "a"), (1L, 1, "b"), (2L, 0, "z"))
      .toDF("doc_id", "pos", "tok")
    val r = TextAnalysis.detokenize(toks, "doc_id", "pos", "tok")
      .orderBy("doc_id").collect()
    assert(r.map(_.getString(1)).toSeq == Seq("a b c", "z"))
  }

  test("editDistanceMatrix emits the upper triangle with exact distances") {
    val df = Seq("kitten", "sitting", "kitten").toDF("v") // dup collapses
    val r = TextAnalysis.editDistanceMatrix(df, "v").collect()
    assert(r.length == 1 &&
      r(0).getString(0) == "kitten" && r(0).getInt(2) == 3)
  }

  test("editDistanceMatrix fail-fasts corpus-sized input; maxN overrides") {
    val big = spark.range(50).selectExpr("CAST(id AS STRING) AS v")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.editDistanceMatrix(big, "v", maxN = 10)
    }
    assert(e.getMessage.contains("all-pairs O(N²)") &&
      e.getMessage.contains("maxN=10"), e.getMessage)
    // explicit larger cap runs the quadratic join knowingly
    assert(TextAnalysis.editDistanceMatrix(big, "v", maxN = 50).count() ==
      50L * 49 / 2)
  }

  test("tokenizeWithVocabulary maps OOV to the default id in order") {
    val docs = Seq((1L, "big cat zz big")).toDF("doc_id", "text")
    val vocab = Seq(("big", 0), ("cat", 1)).toDF("word", "vocab_id")
    val r = TextAnalysis.tokenizeWithVocabulary(docs, "doc_id", "text", vocab)
      .first
    assert(r.getAs[Int]("n_tokens") == 4 &&
      r.getAs[String]("token_ids") == "0 1 -1 0")
  }

  test("canonicalUrl collapses tracking, fragments, ports, www, case") {
    import org.apache.spark.sql.functions.col
    val urls = Seq(
      "https://www.example.com/Page?utm_source=x&id=1",
      "HTTPS://EXAMPLE.COM/Page?id=1#section",
      "https://example.com:443/Page?id=1",
      " https://example.com/Page?id=1&utm_campaign=spring ")
    val out = urls.toDF("url")
      .select(TextAnalysis.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("https://example.com/Page?id=1"))
    // path case is significant and kept; bare strings pass through
    val keep = Seq("https://example.com/page", "not a url")
      .toDF("url").select(TextAnalysis.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(keep == Set("https://example.com/page", "not a url"))
  }

  test("canonicalUrl tracking regex is boundary-anchored (r8 advice)") {
    import org.apache.spark.sql.functions.col
    def canon(urls: String*): Seq[String] =
      urls.toDF("url").select(TextAnalysis.canonicalUrl(col("url")).as("c"))
        .collect().map(_.getString(0)).toSeq
    // href=/pref= params and a /ref= path segment must SURVIVE; only
    // whole ?/&-anchored tracking param names are stripped
    assert(canon("https://other.org/a?href=tw&q=2")
      == Seq("https://other.org/a?href=tw&q=2"))
    assert(canon("https://s.example.com/dp/B01/ref=sr_1_1?pref=keep&utm_source=x")
      == Seq("https://s.example.com/dp/B01/ref=sr_1_1?pref=keep"))
    // runs of tracking params collapse with clean separators
    assert(canon("https://t.org/p?utm_aa=1&utm_bb=2&gclid=g")
      == Seq("https://t.org/p"))
    assert(canon("https://t.org/p?ref=x&q=1&utm_z=2")
      == Seq("https://t.org/p?q=1"))
  }

  test("scriptProfile: counts, bp shares, dominant per script") {
    import org.apache.spark.sql.functions.col
    val df = Seq("abc мир", "中文", "!!!").toDF("text")
      .select(TextAnalysis.scriptProfile(col("text")).as("p"))
      .select(col("p.latin"), col("p.cyrillic"), col("p.cjk"),
        col("p.latin_bp"), col("p.dominant"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    assert(df == Set(
      (3L, 3L, 0L, 5000L, "latin"),   // tie latin/cyrillic → latin
      (0L, 0L, 2L, 0L, "cjk"),
      (0L, 0L, 0L, 0L, "other")))
  }

  test("codeSwitchProfile: mixed doc entropy, monolingual zero, dominant tiebreak") {
    import spark.implicits._
    // doc 1: two 'en' sentences ("the fast" markers) + two 'es'
    // ("data query") -> 50/50 mix, entropy = ln 2 in floor-nano
    // (2 * floor(1e9 * 0.5 * ln 2)); tie at 2-2 -> dominant 'en'
    // (lexicographically smallest). doc 2: monolingual -> entropy 0.
    val docs = Seq(
      (1L, "the fast one. data query here! the slow way? sort data city"),
      (2L, "the a fast. the slow a")).toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis.codeSwitchProfile(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3),
        x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      (1L, 4L, 2L, "en", 5000L, 693147180L),
      (2L, 2L, 1L, "en", 10000L, 0L)), r.mkString(","))
  }

  test("piiScan: per-class counts, Luhn discrimination, null text") {
    import spark.implicits._
    val docs = Seq(
      // 4111111111111111 is the classic Luhn-valid test PAN;
      // 4111111111111112 fails the checksum
      (1L, "mail a.b@x.co and c@d.org ip 10.0.0.1 call 12-345-678-9012 " +
        "card 4111111111111111 and 4111111111111112"),
      (2L, "no pii here, just 123 and 1.2.3 and a@b (no tld dot)"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis.piiScan(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6)))
    assert(r.toSeq == Seq(
      (1L, 2L, 1L, 1L, 2L, 1L, 5L),
      (2L, 0L, 0L, 0L, 0L, 0L, 0L),
      (3L, 0L, 0L, 0L, 0L, 0L, 0L)), r.mkString(","))
  }

  test("piiRedact: fixed-order typed placeholders, non-PII text preserved") {
    import spark.implicits._
    val docs = Seq((1L,
      "hi a@b.co call 12-345-678-9012 card 4111111111111112 ip 10.0.0.1 end"))
      .toDF("doc_id", "text")
    val out = docs.select(
        graft.ops.TextAnalysis.piiRedact(col("text")).as("t"))
      .head().getString(0)
    assert(out ==
      "hi <EMAIL> call <PHONE> card <CARD> ip <IP> end", out)
  }

  test("piiPhoneRe matches both NNN-NNN-NNNN and NN(N)-NNN-NNN-NNNN; SSN shape does not cross-match") {
    import spark.implicits._
    val docs = Seq(
      (1L, "tel 123-456-7890 end"),               // local shape -> 1
      (2L, "intl 12-345-678-9012 end"),           // 4-part -> 1 (one match, not two)
      (3L, "both 123-456-7890 and 44-555-666-7777"), // -> 2
      (4L, "ssn 123-45-6789 only"),               // SSN is NOT a phone -> 0
      (5L, "digits 1234567890 undashed")          // -> 0
    ).toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis.piiScan(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(x => (x.getLong(0), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 0L), (5L, 0L)),
      r.mkString(","))
  }

  test("piiScanExtended: SSN issuable ranges and IBAN mod-97 discriminate; phone is not an SSN") {
    import spark.implicits._
    val docs = Seq(
      // GB82WEST12345698765432 is the ISO 13616 example IBAN (valid);
      // flipping the last digit breaks the mod-97 residue
      (1L, "iban GB82WEST12345698765432 ok"),
      (2L, "iban GB82WEST12345698765433 bad"),
      (3L, "ssn 219-09-9999 fine"),        // issuable
      (4L, "ssn 000-12-3456 bad area"),
      (5L, "ssn 666-12-3456 bad area"),
      (6L, "ssn 900-12-3456 bad area"),    // >= 900
      (7L, "ssn 219-00-3456 bad group"),
      (8L, "ssn 219-09-0000 bad serial"),
      (9L, "tel 555-123-4567 not an ssn"),
      (10L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis.piiScanExtended(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))
    // (id, n_phone, n_ssn_raw, n_ssn_valid, n_iban_raw, n_iban_valid)
    assert(r.toSeq == Seq(
      (1L, 0L, 0L, 0L, 1L, 1L),
      (2L, 0L, 0L, 0L, 1L, 0L),
      (3L, 0L, 1L, 1L, 0L, 0L),
      (4L, 0L, 1L, 0L, 0L, 0L),
      (5L, 0L, 1L, 0L, 0L, 0L),
      (6L, 0L, 1L, 0L, 0L, 0L),
      (7L, 0L, 1L, 0L, 0L, 0L),
      (8L, 0L, 1L, 0L, 0L, 0L),
      (9L, 1L, 0L, 0L, 0L, 0L),
      (10L, 0L, 0L, 0L, 0L, 0L)), r.mkString(","))
  }

  test("piiRedact extended order: SSN and IBAN get typed placeholders") {
    import spark.implicits._
    val docs = Seq((1L,
      "s 219-09-9999 i GB82WEST12345698765432 p 555-123-4567 end"))
      .toDF("doc_id", "text")
    val out = docs.select(
        graft.ops.TextAnalysis.piiRedact(col("text")).as("t"))
      .head().getString(0)
    assert(out == "s <SSN> i <IBAN> p <PHONE> end", out)
  }

  test("piiScan \\b semantics: digits glued to word chars do NOT match (identical in Java and RE2)") {
    import spark.implicits._
    // \b separates word from non-word chars; letters AND digits are
    // both word chars, so 'x4111111111111111' has no boundary before
    // the 4 and must NOT count as a card — pinning this keeps the
    // Spark (Java regex) and DuckDB (RE2) engines on the same subset
    val docs = Seq(
      (1L, "x4111111111111111 glued"),        // no boundary -> 0
      (2L, "id4111111111111111x"),             // glued both sides -> 0
      (3L, "(4111111111111111)"),              // punct boundaries -> 1
      (4L, "a@b.co.uk tail"),                  // multi-dot domain -> 1
      (5L, "ip 999.0.0.1 over")                // octet 999 -> 0 ipv4
    ).toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis.piiScan(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(3), x.getLong(4)))
    // (id, n_email, n_ipv4, n_card_raw)
    assert(r.toSeq == Seq(
      (1L, 0L, 0L, 0L), (2L, 0L, 0L, 0L), (3L, 0L, 0L, 1L),
      (4L, 1L, 0L, 0L), (5L, 0L, 0L, 0L)), r.mkString(","))
  }

  test("luhnValid16 matches a reference Luhn implementation") {
    import spark.implicits._
    def refLuhn(s: String): Boolean = {
      val sum = s.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
      }.sum
      sum % 10 == 0
    }
    val cands = Seq("4111111111111111", "4111111111111112",
      "4444444444444448", "1234567812345670", "9999999999999999")
    val got = cands.toDF("c")
      .select(col("c"), graft.ops.TextAnalysis.luhnValid16(col("c")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cands.foreach(c => assert(got(c) == refLuhn(c), c))
  }

  test("gopherRepetition: hand-checked shares on a stuffed vs clean doc") {
    import graft.ops.TextAnalysis
    // doc 0: "spam ham " x 5 -> 10 words, 35 chars (sans spaces);
    //   2-grams: "spam ham" x5, "ham spam" x4 -> top = "spam ham"
    //   cnt 5, chars 7 -> top2_bp = 5*7*10000 // 35 = 10000
    //   5-grams: "s h s h s" at pos 1,3,5 (18 chars) and "h s h s h"
    //   at pos 2,4,6 (17 chars) -> dup5 = (3*18 + 3*17)*10000 // 35
    //   = 30000 — overlap counting pushes a fully-stuffed doc PAST
    //   10000 bp (documented; monotone in repetition, which is all
    //   the threshold needs)
    // doc 1: ten distinct words -> every 5-gram unique -> dup 0
    val df = Seq(
      (0L, ("spam ham " * 5).trim),
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "a\nb\na\nc")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRepetition(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d0 = out(0L)
    assert(d0.getAs[Long]("top2_bp") == 10000L, d0.toString)
    assert(d0.getAs[Long]("dup5_bp") == 30000L, d0.toString)
    assert(d0.getAs[Long]("dup9_bp") == 0L, d0.toString)
    assert(!d0.getAs[Boolean]("rep_pass"), d0.toString)
    val d1 = out(1L)
    // every 2-gram unique: top cnt 1; words 3+3+5+4+4+3+5+5+4+3=39
    // chars; the tie-break picks "eight nine" (9 chars) ->
    // 1*9*10000//39 = 2307 -> fails the 2000 threshold by stuffing
    // arithmetic even on a clean doc THIS short (documented: the
    // Gopher thresholds assume >=50-word docs; the rule table is
    // faithful, the pass flag composes with ok_words)
    assert(d1.getAs[Long]("dup5_bp") == 0L, d1.toString)
    assert(d1.getAs[Long]("dup10_bp") == 0L, d1.toString)
    // doc 2: lines a,b,a,c -> dup_line_bp = 2*10000//4 = 5000,
    // chars: dup 2 of 4 -> 5000
    val d2 = out(2L)
    assert(d2.getAs[Long]("dup_line_bp") == 5000L, d2.toString)
    assert(d2.getAs[Long]("dup_line_char_bp") == 5000L, d2.toString)
  }

  test("gopherRepetitionHashed: dup/line shares identical; top shares " +
      "identical off count-ties") {
    import graft.ops.TextAnalysis
    // the hash-keyed 100 TB tier: dup*/line* columns sum over the
    // census (order-free) so they are value-identical absent polyHash
    // collisions (~0 over a few thousand grams at P = 1e9+7); top*_bp
    // matches whenever the per-(doc, n) argmax is UNIQUE by count —
    // under a tie the two tie-breaks (gram ASC vs hash ASC) may crown
    // winners of different char length (scaladoc; the oracle replays
    // the hash tie-break so q297b still gates bit-for-bit)
    val hand = Seq(
      (0L, ("spam ham " * 5).trim),   // unique argmax at every n
      (2L, "a\nb\na\nc")
    ).toDF("doc_id", "text")
    val fixture = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sumCols = Seq("doc_id", "n_words", "dup_line_bp",
      "dup_line_char_bp") ++ (5 to 10).map(n => s"dup${n}_bp")
    for (df <- Seq(hand, fixture)) {
      val s = TextAnalysis.gopherRepetition(df, "doc_id", "text")
      val h = TextAnalysis.gopherRepetitionHashed(df, "doc_id", "text")
      assert(s.schema == h.schema)
      val sd = s.select(sumCols.map(col): _*)
      val hd = h.select(sumCols.map(col): _*)
      assert(hd.exceptAll(sd).isEmpty && sd.exceptAll(hd).isEmpty)
    }
    // hand doc 0 has a unique-by-count top gram at every n -> FULL row
    // equality including top*_bp and rep_pass
    val s0 = TextAnalysis.gopherRepetition(hand, "doc_id", "text")
      .filter(col("doc_id") === 0)
    val h0 = TextAnalysis.gopherRepetitionHashed(hand, "doc_id", "text")
      .filter(col("doc_id") === 0)
    assert(h0.exceptAll(s0).isEmpty && s0.exceptAll(h0).isEmpty)
  }

  test("distinctNgramRatios: hand-checked dist-n on repeated vs unique docs") {
    import graft.ops.TextAnalysis
    // doc 0: "a b a b" -> 1-grams 4 total 2 uniq = 5000; 2-grams
    // [a b, b a, a b] 3 total 2 uniq = 6666; 3-grams [a b a, b a b]
    // 2 total 2 uniq = 10000
    // doc 1: all distinct words -> all 10000
    // doc 2: one word -> dist1 10000, dist2/3 NULL
    val df = Seq((0L, "a b a b"), (1L, "p q r s"), (2L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.distinctNgramRatios(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def opt(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    assert((opt(out(0L), 2), opt(out(0L), 3), opt(out(0L), 4)) ==
      ((Some(5000L), Some(6666L), Some(10000L))), out(0L).toString)
    assert((opt(out(1L), 2), opt(out(1L), 3), opt(out(1L), 4)) ==
      ((Some(10000L), Some(10000L), Some(10000L))), out(1L).toString)
    assert((opt(out(2L), 2), opt(out(2L), 3), opt(out(2L), 4)) ==
      ((Some(10000L), None, None)), out(2L).toString)
  }
}
