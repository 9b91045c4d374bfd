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

  /** Translate a Redis glob into an anchored Java regex. */
  def toRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append("[\\s\\S]*")
        case '?' => sb.append(".")
        case '\\' if i + 1 < glob.length =>
          i += 1
          sb.append(java.util.regex.Pattern.quote(glob.charAt(i).toString))
        case '[' =>
          // character class: copy up to the matching ']' (Redis and Java
          // agree on [abc], [^abc], [a-c])
          val end = glob.indexOf(']', i + 1)
          if (end < 0) sb.append("\\[")
          else {
            sb.append(glob.substring(i, end + 1))
            i = end
          }
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
