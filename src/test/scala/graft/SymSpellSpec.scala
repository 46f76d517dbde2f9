package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analyze.{Levenshtein, SymSpell}

class SymSpellSpec extends AnyFunSuite {

  test("levenshtein distance basics") {
    assert(Levenshtein.distance("abc", "abc", 2) === 0)
    assert(Levenshtein.distance("abc", "abd", 2) === 1)
    assert(Levenshtein.distance("serach", "search", 2) === 2)
    assert(Levenshtein.distance("abc", "xyz", 2) === 3) // capped at max+1
    assert(Levenshtein.distance("", "ab", 2) === 2)
    assert(Levenshtein.distance("kitten", "sitting", 3) === 3)
  }

  test("delete-variant candidate generation is complete for distance <= 2") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefgh"
    def mutate(s: String): String = rnd.nextInt(3) match {
      case 0 if s.nonEmpty => // delete
        val i = rnd.nextInt(s.length); s.substring(0, i) + s.substring(i + 1)
      case 1 => // insert
        val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) + alphabet(rnd.nextInt(alphabet.length)) + s.substring(i)
      case _ if s.nonEmpty => // substitute
        val i = rnd.nextInt(s.length)
        s.substring(0, i) + alphabet(rnd.nextInt(alphabet.length)) + s.substring(i + 1)
      case _ => s
    }
    // explicit short-token cases: 2-char tokens at distance 2 share
    // only the EMPTY variant, which a length-1 string must emit
    assert(SymSpell.deletes("ab").intersect(SymSpell.deletes("cd")).nonEmpty,
      "d(ab,cd)=2 needs the empty-string variant")
    assert(SymSpell.deletes("a").intersect(SymSpell.deletes("b")).nonEmpty,
      "d(a,b)=1 needs the empty-string variant")
    for (_ <- 0 until 300) {
      val base = (0 until (1 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      var other = base
      val edits = rnd.nextInt(3)
      for (_ <- 0 until edits) other = mutate(other)
      val d = Levenshtein.distance(base, other, 2)
      if (d <= 2) {
        // SymSpell guarantee: delete sets intersect
        assert(SymSpell.deletes(base).intersect(SymSpell.deletes(other)).nonEmpty,
          s"no shared delete variant for '$base' ~ '$other' (d=$d)")
      }
    }
  }

  test("pickBest: min distance, then max df, then lexicographic") {
    val cands = Seq(("search", 100L), ("serach", 5L), ("sea", 1000L), ("zebra", 9L))
    // 'serach' itself at distance 0 wins over higher-df 'search'
    assert(SymSpell.pickBest("serach", cands) === Some("serach"))
    // distance ties broken by df
    assert(SymSpell.pickBest("searcq", Seq(("search", 100L), ("searcx", 5L))) === Some("search"))
    // df ties broken lexicographically
    assert(SymSpell.pickBest("searcq", Seq(("searcz", 7L), ("searca", 7L))) === Some("searca"))
    assert(SymSpell.pickBest("qqqqqq", Seq(("ab", 1L))) === None)
  }

  test("property: banded distance == full-DP distance clamped at max+1 (seeded pairs)") {
    // the banded early-exit (row-min > max => bail) and the |len diff|
    // shortcut must never change the CLAMPED value the callers compare
    // against; a small alphabet makes the whole 0..max+1 spectrum dense
    def fullDp(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(20260820L)
    val alpha = "abcd"
    def str(): String =
      Seq.fill(rnd.nextInt(11))(alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 2000; max <- 0 to 3) {
      val a = str(); val b = str()
      val expect = math.min(fullDp(a, b), max + 1)
      assert(Levenshtein.distance(a, b, max) === expect, s"a='$a' b='$b' max=$max")
    }
  }
}
