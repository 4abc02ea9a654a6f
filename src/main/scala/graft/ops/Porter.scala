package graft.ops

/** Classic Porter stemming algorithm (Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980 — public domain specification).
  * Parity target: nvtext porter_stemmer [cpp/src/text/stemmer.cu],
  * exposed via [python/cudf/cudf/core/column/string.py (nvtext
  * section)]. Pure function on a lowercase word; no locale behavior.
  */
object Porter {

  private def isVowel(w: CharSequence, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** m = number of VC sequences in the [C](VC)^m[V] decomposition. */
  private def measure(w: CharSequence): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowel(w, i)) i += 1
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && !isVowel(w, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(w: CharSequence): Boolean =
    (0 until w.length).exists(isVowel(w, _))

  private def endsDoubleConsonant(w: String): Boolean = {
    val n = w.length
    n >= 2 && w(n - 1) == w(n - 2) && !isVowel(w, n - 1)
  }

  /** *o condition: ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
      !"wxy".contains(w(n - 1))
  }

  private def stemOf(w: String, suffix: String): Option[String] =
    if (w.endsWith(suffix)) Some(w.dropRight(suffix.length)) else None

  /** Replace `suffix` with `repl` if the remaining stem has measure > `mGt`. */
  private def rule(w: String, suffix: String, repl: String, mGt: Int): Option[String] =
    stemOf(w, suffix).filter(measure(_) > mGt).map(_ + repl)

  private def firstRule(w: String, mGt: Int, rules: (String, String)*): Option[String] =
    rules.view
      .flatMap { case (s, r) => stemOf(w, s).map((s, r, _)) }
      .headOption // longest-match is by listing order, per the paper's tables
      .map { case (_, r, stem) => if (measure(stem) > mGt) stem + r else w }

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word

    // Step 1a
    w =
      if (w.endsWith("sses")) w.dropRight(2)
      else if (w.endsWith("ies")) w.dropRight(2)
      else if (w.endsWith("ss")) w
      else if (w.endsWith("s")) w.dropRight(1)
      else w

    // Step 1b
    var step1bFired = false
    stemOf(w, "eed") match {
      case Some(stem) => if (measure(stem) > 0) w = stem + "ee"
      case None =>
        stemOf(w, "ed").filter(hasVowel(_)) match {
          case Some(stem) => w = stem; step1bFired = true
          case None =>
            stemOf(w, "ing").filter(hasVowel(_)).foreach { stem =>
              w = stem; step1bFired = true
            }
        }
    }
    if (step1bFired) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (endsDoubleConsonant(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (measure(w) == 1 && endsCvc(w)) w += "e"
    }

    // Step 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // Step 2 (m > 0)
    w = firstRule(w, 0,
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble"
    ).getOrElse(w)

    // Step 3 (m > 0)
    w = firstRule(w, 0,
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> ""
    ).getOrElse(w)

    // Step 4 (m > 1); (m>1 and (*S or *T)) ION
    val step4Suffixes = Seq("al", "ance", "ence", "er", "ic", "able", "ible",
      "ant", "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous",
      "ive", "ize")
    val ionStem = stemOf(w, "ion")
      .filter(s => s.nonEmpty && (s.last == 's' || s.last == 't') && measure(s) > 1)
    w = ionStem.getOrElse {
      step4Suffixes.view.flatMap(s => stemOf(w, s)).headOption match {
        case Some(stem) if measure(stem) > 1 => stem
        case _ => w
      }
    }

    // Step 5a
    stemOf(w, "e").foreach { stem =>
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }

    // Step 5b: (m > 1 and *d and *L) → single letter
    if (measure(w) > 1 && endsDoubleConsonant(w) && w.last == 'l')
      w = w.dropRight(1)

    w
  }
}
