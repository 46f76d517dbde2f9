package graft.analyze

/** Snowball English stemmer ("Porter2" — M.F. Porter, published at
  * snowballstem.org/algorithms/english/stemmer.html): the algorithm
  * tantivy's `en_stem` token filter runs (rust-stemmers'
  * Algorithm::English, pinned by the reference's Cargo.lock), so terms
  * indexed here match the reference engine's cross-system. It diverges
  * from the original Porter 1980 stemmer on many words — e.g.
  * quickly -> quick (Porter1: quickli), agreed -> agree (Porter1:
  * agre) — which is why the r03 Porter1 implementation was replaced.
  *
  * Implementation notes: R1/R2 are computed ONCE after y-marking and
  * kept as fixed positions while suffixes are replaced — the exact
  * semantics of the generated Snowball runtimes (their I_p1/I_p2 marks
  * are not adjusted by suffix replacements either), and the source of
  * outputs like generation -> generat.
  */
object SnowballStemmer {

  /** Whole-word special cases + invariants (exception1 in the spec). */
  private val Exceptional: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  /** Invariant if the word looks like this after step 1a (exception2). */
  private val InvariantAfter1a: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  /** Valid li- endings for the step-2 `li` deletion. */
  private final val LiEnding = "cdeghkmnrt"

  /** Step 2 suffix table, longest first (longest MATCH binds even when
    * its R1/side condition then fails — Snowball `among` semantics).
    */
  private val Step2: Seq[(String, String)] = Seq(
    "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
    "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
    "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
    "alism" -> "al", "aliti" -> "al", "ousli" -> "ous", "iviti" -> "ive",
    "fulli" -> "ful", "ation" -> "ate", "enci" -> "ence", "anci" -> "ance",
    "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
    "bli" -> "ble", "ogi" -> "og", "li" -> "")

  private val Step3: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
    "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
    "ness" -> "", "ful" -> "")

  private val Step4: Seq[String] = Seq(
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")

  // y is a vowel only in its lowercase form; consonant-y is marked 'Y'
  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  private def endsWith(s: StringBuilder, suf: String): Boolean = {
    val n = s.length
    val m = suf.length
    if (n < m) return false
    var i = 0
    while (i < m) { if (s.charAt(n - m + i) != suf.charAt(i)) return false; i += 1 }
    true
  }

  /** Position after the first non-vowel following a vowel, from `from`. */
  private def regionAfter(s: StringBuilder, from: Int): Int = {
    var i = from
    while (i < s.length && !isVowel(s.charAt(i))) i += 1
    while (i < s.length && isVowel(s.charAt(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  private def isDouble(s: StringBuilder): Boolean = {
    val n = s.length
    n >= 2 && s.charAt(n - 1) == s.charAt(n - 2) &&
      "bdfgmnprt".indexOf(s.charAt(n - 1)) >= 0
  }

  /** Ends in a short syllable: non-vowel + vowel + non-vowel(not w/x/Y),
    * or a word-initial vowel + non-vowel.
    */
  private def endsShortSyllable(s: StringBuilder): Boolean = {
    val n = s.length
    if (n == 2) isVowel(s.charAt(0)) && !isVowel(s.charAt(1))
    else if (n >= 3) {
      val c = s.charAt(n - 1)
      !isVowel(s.charAt(n - 3)) && isVowel(s.charAt(n - 2)) && !isVowel(c) &&
        c != 'w' && c != 'x' && c != 'Y'
    } else false
  }

  private def containsVowel(s: StringBuilder, until: Int): Boolean = {
    var i = 0
    while (i < until) { if (isVowel(s.charAt(i))) return true; i += 1 }
    false
  }

  def stem(word: String): String = {
    var w = word
    if (w.startsWith("'")) w = w.substring(1)
    if (w.length <= 2) return w
    Exceptional.get(w) match { case Some(r) => return r; case None => }

    val sb = new StringBuilder(w)
    // consonant-y marking: initial y, or y after a vowel, becomes Y
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    val r1 =
      if (w.startsWith("gener")) 5
      else if (w.startsWith("commun")) 6
      else if (w.startsWith("arsen")) 5
      else regionAfter(sb, 0)
    val r2 = regionAfter(sb, math.min(r1, sb.length))
    def inR1(start: Int): Boolean = start >= r1
    def inR2(start: Int): Boolean = start >= r2

    // step 0: longest of 's' 's ' — apostrophe suffixes
    Seq("'s'", "'s", "'").find(endsWith(sb, _))
      .foreach(s => sb.setLength(sb.length - s.length))

    // step 1a
    if (endsWith(sb, "sses")) sb.setLength(sb.length - 2)
    else if (endsWith(sb, "ied") || endsWith(sb, "ies")) {
      if (sb.length > 4) sb.setLength(sb.length - 2) // >1 preceding letter -> i
      else sb.setLength(sb.length - 1) //  one preceding letter -> ie
    } else if (endsWith(sb, "us") || endsWith(sb, "ss")) ()
    else if (endsWith(sb, "s")) {
      // delete when a vowel exists NOT immediately before the s
      if (containsVowel(sb, sb.length - 2)) sb.setLength(sb.length - 1)
    }
    if (InvariantAfter1a.contains(sb.toString)) return sb.toString

    // step 1b
    Seq("eedly", "ingly", "edly", "eed", "ing", "ed").find(endsWith(sb, _)) match {
      case Some(s @ ("eedly" | "eed")) =>
        if (inR1(sb.length - s.length)) {
          sb.setLength(sb.length - s.length); sb.append("ee")
        }
      case Some(s) =>
        val stemEnd = sb.length - s.length
        if (containsVowel(sb, stemEnd)) {
          sb.setLength(stemEnd)
          if (endsWith(sb, "at") || endsWith(sb, "bl") || endsWith(sb, "iz")) sb.append('e')
          else if (isDouble(sb)) sb.setLength(sb.length - 1)
          else if (endsShortSyllable(sb) && r1 >= sb.length) sb.append('e') // short word
        }
      case None =>
    }

    // step 1c: y/Y -> i after a non-vowel that is not the first letter
    if (sb.length > 2) {
      val last = sb.charAt(sb.length - 1)
      if ((last == 'y' || last == 'Y') && !isVowel(sb.charAt(sb.length - 2)))
        sb.setCharAt(sb.length - 1, 'i')
    }

    // step 2 (in R1)
    Step2.find { case (s, _) => endsWith(sb, s) } match {
      case Some((s, r)) =>
        val start = sb.length - s.length
        val condition = s match {
          case "ogi" => start > 0 && sb.charAt(start - 1) == 'l'
          case "li" => start > 0 && LiEnding.indexOf(sb.charAt(start - 1)) >= 0
          case _ => true
        }
        if (inR1(start) && condition) { sb.setLength(start); sb.append(r) }
      case None =>
    }

    // step 3 (in R1; 'ative' additionally requires R2)
    Step3.find { case (s, _) => endsWith(sb, s) } match {
      case Some((s, r)) =>
        val start = sb.length - s.length
        if (inR1(start) && (s != "ative" || inR2(start))) {
          sb.setLength(start); sb.append(r)
        }
      case None =>
    }

    // step 4 (in R2; 'ion' only after s/t)
    Step4.find(endsWith(sb, _)) match {
      case Some(s) =>
        val start = sb.length - s.length
        val condition = s != "ion" ||
          (start > 0 && (sb.charAt(start - 1) == 's' || sb.charAt(start - 1) == 't'))
        if (inR2(start) && condition) sb.setLength(start)
      case None =>
    }

    // step 5
    if (sb.nonEmpty && sb.charAt(sb.length - 1) == 'e') {
      val start = sb.length - 1
      if (inR2(start)) sb.setLength(start)
      else if (inR1(start)) {
        sb.setLength(start) // delete unless that leaves a short syllable
        if (endsShortSyllable(sb)) sb.append('e')
      }
    } else if (sb.length > 1 && sb.charAt(sb.length - 1) == 'l' &&
        inR2(sb.length - 1) && sb.charAt(sb.length - 2) == 'l')
      sb.setLength(sb.length - 1)

    i = 0
    while (i < sb.length) {
      if (sb.charAt(i) == 'Y') sb.setCharAt(i, 'y')
      i += 1
    }
    sb.toString
  }
}
