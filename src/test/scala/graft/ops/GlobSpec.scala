package graft.ops

import graft.SparkSpec

/** Glob -> predicate translation (§2.G): README examples + Redis semantics
  * (`*` crosses colons) + class/escape handling. */
class GlobSpec extends SparkSpec {

  private def matches(glob: String, key: String): Boolean =
    key.matches(Glob.toRegex(glob))

  test("README patterns behave like Redis KEYS") {
    assert(matches("hive:*:vote", "hive:29811085:abc123:0:vote"))
    assert(!matches("hive:*:vote", "hive:29811085:abc123:0:comment"))
    assert(matches("hive:29811085:*", "hive:29811085:abc123:0:vote"))
    assert(!matches("hive:29811085:*", "hive:29811086:abc123:0:vote"))
    assert(matches("hive:*:abc123:*", "hive:1:abc123:0:vote"))
    assert(matches("hive_engine:*:tokens:transfer", "hive_engine:18000:e0aaa:0:tokens:transfer"))
    assert(!matches("hive_engine:*:tokens:transfer", "hive_engine:18000:e0aaa:0:tokens:issue"))
    // prefix sweep matches the checkpoint key too (shape-excluded in the
    // reference's tests, not by the pattern)
    assert(matches("hive:*", "hive:meeseeker:last_block_num"))
  }

  test("star crosses colons; question mark is single-char; classes work") {
    assert(matches("a*z", "a:b:c:z"))
    assert(matches("a?c", "abc"))
    assert(!matches("a?c", "abbc"))
    assert(matches("h[ia]ve:*", "hive:1:t:0:vote"))
    assert(matches("h[ia]ve:*", "have:1:t:0:vote"))
    assert(!matches("h[^i]ve:*", "hive:1:t:0:vote"))
  }

  test("character-class edges follow Redis stringmatchlen semantics") {
    // escaped ']' inside a class no longer truncates the class
    assert(matches("""x[a\]b]y""", "xay"))
    assert(matches("""x[a\]b]y""", "x]y"))
    assert(matches("""x[a\]b]y""", "xby"))
    assert(!matches("""x[a\]b]y""", "xcy"))
    // empty class matches nothing; negated empty class matches any char
    assert(!matches("x[]y", "xy"))
    assert(!matches("x[]y", "xay"))
    assert(matches("x[^]y", "xzy"))
    // reversed ranges swap like Redis ([z-a] == [a-z])
    assert(matches("x[c-a]y", "xby"))
    // '-' consumes the next char even when it is ']' (the [a-]] quirk):
    // class is the ']'..'a' range, the second ']' closes it
    assert(matches("x[a-]]y", "x^y")) // '^' is between ']' and 'a'
    assert(!matches("x[a-]]y", "xzy"))
    // Java-only class syntax cannot leak in: '&&' members are literal chars
    assert(matches("x[a&&b]y", "x&y"))
    // unterminated class closes at end-of-pattern with what it parsed
    // (Redis's patternLen==0 break): "x[ab" is the class {a,b}, and "x[a-]"
    // is the ]..a range, NOT literal text
    assert(matches("x[ab", "xa"))
    assert(matches("x[ab", "xb"))
    assert(!matches("x[ab", "x[ab"))
    assert(matches("x[a-]", "x^"))
    assert(!matches("x[a-]", "xz"))
    // lone trailing '[' is an empty class: matches nothing at all
    assert(!matches("x[", "x["))
    assert(!matches("x[", "xa"))
    // in-memory backend KEYS shares the same corrected path
    val b = new graft.sink.InMemoryKvBackend
    b.set("xay", "1"); b.set("x]y", "2"); b.set("xcy", "3")
    assert(b.keys("""x[a\]b]y""").toSet === Set("xay", "x]y"))
  }

  test("regex metacharacters in keys are literal") {
    assert(matches("a.b:*", "a.b:x"))
    assert(!matches("a.b:*", "axb:x"))
    assert(matches("c$d", "c$d"))
    assert(matches("e(f)g", "e(f)g"))
  }

  test("literalPrefix extraction for scan pruning") {
    assert(Glob.literalPrefix("hive:29811085:*") === "hive:29811085:")
    assert(Glob.literalPrefix("hive:*:vote") === "hive:")
    assert(Glob.literalPrefix("*:vote") === "")
    assert(Glob.literalPrefix("plain") === "plain")
  }

  test("filterKeys on a DataFrame") {
    import spark.implicits._
    val df = Seq(
      "hive:100:t0aaa:0:vote",
      "hive:100:t0aaa:1:custom_json",
      "hive:101:t2ccc:0:vote",
      "steem:100:x:0:vote",
    ).toDF("key")
    assert(Glob.filterKeys(df, "hive:*:vote").count() === 2)
    assert(Glob.filterKeys(df, "hive:100:*").count() === 2)
    assert(Glob.filterKeys(df, "*:vote").count() === 3)
  }
}
