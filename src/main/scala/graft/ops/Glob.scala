package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Redis-glob key queries (SURVEY.md §2.G) — the reference's entire ad-hoc
  * consumer query surface (`KEYS`/`SCAN` patterns, README.md:236-309).
  *
  * Semantics follow Redis globs: `*` matches ANY run of characters
  * (including `:`), `?` one character, `[abc]`/`[^a]`/`[a-c]` classes,
  * `\x` escapes. Compiled to an anchored Java regex for `rlike`.
  *
  * Scale path: the literal prefix up to the first wildcard is also emitted
  * as a separate `startsWith` conjunct — a plain comparison Catalyst can
  * push into the scan (parquet min/max pruning on a key-sorted layout),
  * so `hive_engine:*` sweeps never regex-scan foreign-chain partitions.
  */
object Glob {

  /** Escape a char for use INSIDE a Java regex character class. */
  private def quoteInClass(c: Char): String =
    if ("\\]^[&-".contains(c)) "\\" + c else c.toString

  /** Translate a Redis glob into an anchored Java regex. */
  def toRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append("[\\s\\S]*")
        case '?' => sb.append("[\\s\\S]") // any char INCLUDING newline (Java '.' excludes it)
        case '\\' if i + 1 < glob.length =>
          i += 1
          sb.append(java.util.regex.Pattern.quote(glob.charAt(i).toString))
        case '[' =>
          // Character class, parsed with Redis stringmatchlen semantics
          // (util.c): `\x` escapes INSIDE the class, the class ends at the
          // first unescaped ']' (even immediately: `[]` is an empty class
          // matching nothing, `[^]` matches any char), `a-b` ranges swap
          // when reversed ([z-a] == [a-z]), `-` consumes the next char even
          // if it is ']' (so `[a-]` is the ]..a range), and a class that
          // runs off the END of the pattern closes there with whatever it
          // parsed (Redis's patternLen==0 break). Content is re-emitted
          // char-by-char with Java-class metachars escaped (never copied
          // verbatim, which would let `&&`/nested-class syntax leak in).
          var j = i + 1
          var neg = false
          if (j < glob.length && glob.charAt(j) == '^') { neg = true; j += 1 }
          val content = new StringBuilder
          var closed = false
          while (j < glob.length && !closed) {
            val c = glob.charAt(j)
            if (c == '\\' && j + 1 < glob.length) {
              content.append(quoteInClass(glob.charAt(j + 1))); j += 2
            } else if (c == ']') {
              closed = true; j += 1
            } else if (j + 2 < glob.length && glob.charAt(j + 1) == '-') {
              val (lo, hi) =
                if (c <= glob.charAt(j + 2)) (c, glob.charAt(j + 2))
                else (glob.charAt(j + 2), c)
              content.append(quoteInClass(lo)).append('-').append(quoteInClass(hi))
              j += 3
            } else {
              content.append(quoteInClass(c)); j += 1
            }
          }
          if (content.isEmpty)
            sb.append(if (neg) "[\\s\\S]" else "[^\\s\\S]")
          else
            sb.append(if (neg) "[^" else "[").append(content).append("]")
          i = j - 1
        case c if "\\.[]{}()<>*+-=!?^$|".contains(c) =>
          sb.append(java.util.regex.Pattern.quote(c.toString))
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append("$")
    sb.toString
  }

  /** Literal prefix of the glob up to the first wildcard/class/escape. */
  def literalPrefix(glob: String): String = {
    val cut = glob.indexWhere(c => c == '*' || c == '?' || c == '[' || c == '\\')
    if (cut < 0) glob else glob.substring(0, cut)
  }

  /** Predicate Column for `keyCol matches glob`. */
  def matches(keyCol: Column, glob: String): Column = {
    val prefix = literalPrefix(glob)
    val re = keyCol.rlike(toRegex(glob))
    if (prefix.isEmpty) re else keyCol.startsWith(prefix) && re
  }

  /** G1–G8: filter a keyed DataFrame by a Redis glob. */
  def filterKeys(df: DataFrame, glob: String, keyCol: String = "key"): DataFrame =
    df.filter(matches(col(keyCol), glob))
}
