package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Generative properties (SURVEY §5 engine-translation item c): key-grammar
  * round-trip through splitKeys, and glob->regex translation invariants.
  * Driven with plain scalacheck (no scalatest bridge in the offline deps).
  */
class KeyGrammarPropertySpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val seg: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)
  private val chainGen: Gen[String] = Gen.oneOf("hive", "steem", "hive_engine", "steem_engine")

  test("key grammar round-trips through splitKeys (C6 <-> C14)") {
    import spark.implicits._
    val keyParts = for {
      chain <- chainGen
      block <- Gen.chooseNum(1L, 100000000L)
      trx <- seg
      idx <- Gen.chooseNum(0, 500)
      op <- seg
    } yield (chain, block, trx, idx, op)

    // sample deterministic cases generatively, then run one Spark roundtrip
    // on the whole batch (per-case Spark jobs would be minutes of overhead)
    val cases = Gen.listOfN(100, keyParts).sample.get
    val keys = cases.map { case (c, b, t, i, o) => s"$c:$b:$t:$i:$o" }
    val parsed = ConsumerOps.splitKeys(keys.toDF("key"))
      .select("chain", "block_num_k", "trx_id_k", "trx_index_k", "op_type_k")
      .collect()
    cases.zip(parsed).foreach { case ((c, b, t, i, o), row) =>
      assert(row.getString(0) === c)
      assert(row.getLong(1) === b)
      assert(row.getString(2) === t)
      assert(row.getInt(3) === i)
      assert(row.getString(4) === o)
    }
  }

  test("glob: a pattern built from a key by starring segments always matches the key") {
    val gen = for {
      nSegs <- Gen.chooseNum(2, 6)
      segs <- Gen.listOfN(nSegs, seg)
      mask <- Gen.listOfN(nSegs, Gen.oneOf(true, false))
    } yield (segs, mask)
    check(Prop.forAll(gen) { case (segs, mask) =>
      val key = segs.mkString(":")
      val pattern = segs.zip(mask).map { case (s, star) => if (star) "*" else s }.mkString(":")
      key.matches(Glob.toRegex(pattern))
    })
  }

  test("glob: literalPrefix is always a string prefix of every matching key") {
    val gen = for {
      segs <- Gen.listOfN(3, seg)
      tail <- Gen.oneOf("*", "?", s"[ab]")
    } yield segs.mkString(":") + ":" + tail
    check(Prop.forAll(gen) { pattern =>
      val prefix = Glob.literalPrefix(pattern)
      // construct a matching key by replacing the wildcard with a literal
      val key = pattern.dropRight(pattern.length - prefix.length) + "a"
      !key.matches(Glob.toRegex(pattern)) || key.startsWith(prefix)
    })
  }

  test("glob: a single star matches everything; mismatched literals never match") {
    check(Prop.forAll(seg, seg) { (a, b) =>
      a.matches(Glob.toRegex("*")) &&
      (a == b || !a.matches(Glob.toRegex(b)))
    })
  }
}
