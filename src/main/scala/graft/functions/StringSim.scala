package graft.functions

/** Jaro–Winkler string similarity (Winkler 1990, public) — the fuzzy
  * matcher entity-resolution pipelines pair with Levenshtein: insensitive
  * to transpositions, prefix-weighted. Standard parameterization: match
  * window ⌊max(|a|,|b|)/2⌋−1, transpositions = half the out-of-order
  * matches, prefix scale 0.1 over ≤ 4 common-prefix chars applied only
  * above the classic 0.7 boost threshold — the same choices DuckDB's
  * native `jaro_winkler_similarity` makes, which is what lets the gate
  * compare two INDEPENDENT implementations digit for digit.
  */
object StringSim {

  def jaro(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val (a, b) = (s1.toCharArray, s2.toCharArray)
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val aMatch = new Array[Boolean](a.length)
    val bMatch = new Array[Boolean](b.length)
    var m = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in order
    var t = 0
    var j = 0
    i = 0
    while (i < a.length) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a(i) != b(j)) t += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / a.length + md / b.length + (md - t / 2.0) / md) / 3.0
  }

  def jaroWinkler(s1: String, s2: String, prefixScale: Double = 0.1,
                  boostThreshold: Double = 0.7): Double = {
    val j = jaro(s1, s2)
    if (j <= boostThreshold) j
    else {
      var l = 0
      val max = math.min(4, math.min(s1.length, s2.length))
      while (l < max && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * prefixScale * (1.0 - j)
    }
  }
}
