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
