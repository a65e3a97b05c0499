package graft.sources

/** Per-path data-array filter rules (reference
  * `domains/mesh/sources/_key_filter.py:45-166`): a file's include/exclude
  * array set is selected by glob match against its full path, the LONGEST
  * matching pattern winning (most specific); ties keep the earliest rule.
  * Matching is fnmatch-style — `*` crosses `/`, `?` is any one char,
  * `[seq]` / `[!seq]` are classes — applied to the whole path string.
  */
object KeyFilters {

  /** One rule: glob over the file path, include XOR exclude of array names. */
  final case class KeyFilterRule(pathPattern: String, mode: String, keys: Set[String]) {
    require(mode == "include" || mode == "exclude", s"bad rule mode '$mode'")
  }

  /** fnmatch-style glob → anchored Java regex. */
  private[sources] def globToRegex(pattern: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < pattern.length) {
      pattern(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          // fnmatch: a ']' FIRST in the class (after optional '!') is a
          // literal member, so the closing bracket search starts past it
          val clsStart = i + 1
          val litEnd =
            if (clsStart < pattern.length && pattern(clsStart) == '!') clsStart + 1
            else clsStart
          val searchFrom =
            if (litEnd < pattern.length && pattern(litEnd) == ']') litEnd + 1
            else litEnd
          val j = if (searchFrom >= pattern.length) -1
                  else pattern.indexOf(']', searchFrom)
          if (j < 0) sb.append("\\[")
          else {
            // escape regex-class metacharacters fnmatch treats literally
            val cls0 = pattern.substring(clsStart, j)
            val neg = cls0.startsWith("!")
            val body = (if (neg) cls0.substring(1) else cls0)
              .replace("\\", "\\\\").replace("&", "\\&").replace("[", "\\[")
              .replace("]", "\\]").replace("^", "\\^")
            sb.append('[').append(if (neg) "^" + body else body).append(']')
            i = j
          }
        case c if "\\.(){}+^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('$').toString
  }

  def globMatches(path: String, pattern: String): Boolean =
    path.matches(globToRegex(pattern))

  /** Most specific (longest-pattern) rule matching the path, if any. */
  def matchRule(path: String, rules: Seq[KeyFilterRule]): Option[KeyFilterRule] =
    rules.filter(r => globMatches(path, r.pathPattern))
      .sortBy(-_.pathPattern.length).headOption // stable sort: ties → earliest

  /** (include, exclude) array-name sets for the path; at most one nonempty. */
  def resolveArrays(path: String, rules: Seq[KeyFilterRule]): (Set[String], Set[String]) =
    matchRule(path, rules) match {
      case None => (Set.empty, Set.empty)
      case Some(r) if r.mode == "include" => (r.keys, Set.empty)
      case Some(r) => (Set.empty, r.keys)
    }

  /** Per-path setting resolution (`resolve_path_value`): longest matching
    * pattern's value, ties keeping the earliest entry, else the default.
    */
  def resolvePathValue[A](rules: Seq[(String, A)], path: String, default: A): A =
    rules.foldLeft(Option.empty[(Int, A)]) { case (best, (pat, v)) =>
      if (globMatches(path, pat) && best.forall(_._1 < pat.length)) Some((pat.length, v))
      else best
    }.map(_._2).getOrElse(default)
}
