package graft.analyze

/** Porter stemmer — M.F. Porter, "An algorithm for suffix stripping",
  * Program 14(3), 1980 (public algorithm). Backs the `en_stem`
  * tokenizer: the reference's per-column tokenizer DDL accepts the
  * tantivy default-registry names, of which `en_stem` = default
  * analysis + English stemming (apis/mod.rs:211-213; tokenizer names
  * parse-accepted at lnx-query/src/sql.rs:110).
  *
  * Operates on already-lowercased tokens (the analyzer lowercases first).
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word
    w = step1a(w)
    w = step1b(w)
    w = step1c(w)
    w = step2(w)
    w = step3(w)
    w = step4(w)
    w = step5(w)
    w
  }

  /** A letter is a consonant unless it is a/e/i/o/u, or a y preceded by
    * a consonant (paper §2).
    */
  private def isCons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** The measure m of [C](VC)^m[V]. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && isCons(w, i)) i += 1 // optional leading C run
    while (i < n) {
      while (i < n && !isCons(w, i)) i += 1 // V run
      if (i < n) { m += 1; while (i < n && isCons(w, i)) i += 1 } // C run closes a VC
    }
    m
  }

  private def hasVowel(w: String): Boolean = w.indices.exists(!isCons(w, _))

  /** *d: ends with a double consonant. */
  private def endsDoubleCons(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isCons(w, w.length - 1)

  /** *o: ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean =
    w.length >= 3 && isCons(w, w.length - 3) && !isCons(w, w.length - 2) &&
      isCons(w, w.length - 1) && !"wxy".contains(w.charAt(w.length - 1))

  private def stemOf(w: String, suffix: String): String =
    w.substring(0, w.length - suffix.length)

  private def step1a(w: String): String =
    if (w.endsWith("sses")) stemOf(w, "es")
    else if (w.endsWith("ies")) stemOf(w, "es")
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) stemOf(w, "s")
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      if (measure(stemOf(w, "eed")) > 0) stemOf(w, "d") else w
    } else {
      val stripped =
        if (w.endsWith("ed") && hasVowel(stemOf(w, "ed"))) Some(stemOf(w, "ed"))
        else if (w.endsWith("ing") && hasVowel(stemOf(w, "ing"))) Some(stemOf(w, "ing"))
        else None
      stripped match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleCons(s) && !"lsz".contains(s.charAt(s.length - 1)))
            s.substring(0, s.length - 1)
          else if (measure(s) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && hasVowel(stemOf(w, "y"))) stemOf(w, "y") + "i" else w

  private val rules2 = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val rules3 = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def applyFirst(w: String, rules: Seq[(String, String)], minM: Int): String = {
    rules.collectFirst {
      case (suf, rep) if w.endsWith(suf) =>
        val s = stemOf(w, suf)
        if (measure(s) > minM - 1) s + rep else w
    }.getOrElse(w)
  }

  private def step2(w: String): String = applyFirst(w, rules2, 1)
  private def step3(w: String): String = applyFirst(w, rules3, 1)

  private val suffixes4 = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(w: String): String = {
    // longest-match first within the fixed list order of the paper:
    // the list is scanned for the first suffix that matches (the paper's
    // rule list is disjoint on longest-match; "ement" before "ment"
    // before "ent" preserves that)
    suffixes4.collectFirst {
      case suf if w.endsWith(suf) =>
        val s = stemOf(w, suf)
        val ok = measure(s) > 1 &&
          (suf != "ion" || (s.nonEmpty && "st".contains(s.charAt(s.length - 1))))
        if (ok) s else w
    }.getOrElse(w)
  }

  private def step5(w: String): String = {
    // 5a
    var s = w
    if (s.endsWith("e")) {
      val stem = stemOf(s, "e")
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) s = stem
    }
    // 5b
    if (measure(s) > 1 && endsDoubleCons(s) && s.endsWith("ll"))
      s = s.substring(0, s.length - 1)
    s
  }
}
