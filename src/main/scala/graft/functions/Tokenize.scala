package graft.functions

/** THE tokenization every custom text expression uses, in one place:
  * space-only trim (Spark `trim` semantics — NOT Java `String.trim`,
  * which also strips control chars like \n and \t) followed by a
  * whitespace-run split with limit −1 (keeps trailing empty tokens, like
  * Spark `split` / DuckDB `string_split_regex`; splitting "" yields one
  * empty token). The DuckDB oracles pin these semantics character by
  * character, and three expressions ([[TextProfile]], [[WordShingles]],
  * [[RepetitionProfile]]) share them — re-implementing the prologue per
  * expression is how a subtle edge-whitespace divergence slips into ONE
  * of them and breaks cross-expression parity with no compile error.
  */
private[functions] object Tokenize {

  def trimmed(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  def tokens(s: String): Array[String] = trimmed(s).split("\\s+", -1)
}
