package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end corpus preparation: one planted problem doc per stage, each
  * caught by exactly the stage that owns it. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // 24 words, 5 distinct stopwords, no dominant term -> passes the gate
  private def base(i: Int): String =
    "the tale of and to in " + (1 to 18).map(j => s"word${i}x$j").mkString(" ")

  test("each planted problem doc is dropped by its stage; clean docs pack") {
    val docs = Seq(
      (1L, base(1)),                               // survives
      (2L, base(2)),                               // survives
      (3L, base(1)),                               // exact dup of 1 -> dropped
      (4L, base(1) + " extraword"),                // near dup of 1 (J=22/23) -> dropped
      (5L, "too short"),                           // gopher gate -> dropped
      (6L, base(6) + " contact bob@x.com please"), // survives, email scrubbed
      (7L, base(7)),                               // shares a 5-gram with eval -> dropped
      (8L, base(8) + " mail alice@y.com"),         // survives (kept of the pair below)
      (9L, base(8) + " mail carol@z.com"),         // DIFFERENT raw text, IDENTICAL after
                                                   // scrub -> exact-dup dropped: proves
                                                   // redaction runs before fingerprinting
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val eval_ = Seq((100L, "word7x1 word7x2 word7x3 word7x4 word7x5"))
      .toDF("doc_id", "text")

    val out = CorpusPipeline.prepare(docs, Some(eval_),
      CorpusPipeline.Config(nearDupTau = 0.8, packBudget = 50L))
      .orderBy("doc_id")
    val rows = out.collect()

    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 6L, 8L))
    // the scrub rewrote the payload the pipeline carries forward
    val t6 = rows(2).getAs[String]("text")
    assert(t6.contains("<EMAIL>") && !t6.contains("bob@x.com"))
    // packing: 0-based in-bin positions, bins non-decreasing in doc order,
    // ~24-token docs against a 50-token budget must split across bins
    val bins = rows.map(_.getAs[Long]("bin")).toSeq
    assert(bins === bins.sorted)
    assert(bins.last >= 1L, s"expected multiple bins, got $bins")
    assert(rows.map(_.getAs[Int]("pos_in_bin")).forall(_ >= 0))
    // deterministic end to end
    val again = CorpusPipeline.prepare(docs, Some(eval_),
      CorpusPipeline.Config(nearDupTau = 0.8, packBudget = 50L))
      .orderBy("doc_id").collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("span stage (2c): unaligned shared run stripped before any fingerprint") {
    val run = (1 to 25).map(i => s"run$i").mkString(" ")
    // the run sits at DIFFERENT offsets in docs 1 and 2 — the positional
    // 2b chunker would straddle it; the stride-1 windows find it anywhere
    val docs = Seq(
      (1L, base(1) + " " + run + " tail1a tail1b"),
      (2L, "the tale of and to in preA preB " + run + " " +
        (1 to 12).map(j => s"w2x$j").mkString(" ")),
      (3L, base(3)),
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val cfg = CorpusPipeline.Config(removeDupSpans = Some((20, 2)))

    val out = CorpusPipeline.prepare(docs, None, cfg).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 3L))
    out.take(2).foreach { r =>
      val toks = r.getAs[String]("text").split(" ").toSet
      assert(!toks.contains("run1") && !toks.contains("run25"),
        s"run tokens survived in doc ${r.getAs[Long]("doc_id")}")
    }
    // doc 3 passes through token-identical (whitespace-normalize only)
    assert(out(2).getAs[String]("text") === base(3))

    // the report carries the 2c row with the exact token attrition:
    // both marked docs lose exactly the 25 run tokens, none dropped
    val (_, report) = CorpusPipeline.prepareWithReport(docs, None, cfg)
    val byStage = report.collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(byStage.contains("2c_span_scrub"))
    assert(byStage("2c_span_scrub")._1 === byStage("2_pii_scrub")._1)
    assert(byStage("2_pii_scrub")._2 - byStage("2c_span_scrub")._2 === 50L)
  }

  test("prepareWithReport: stage censuses match the planted attrition exactly") {
    val docs = Seq(
      (1L, base(1)),                               // survives
      (2L, base(2)),                               // survives
      (3L, base(1)),                               // exact dup of 1
      (4L, base(1) + " extraword"),                // near dup of 1
      (5L, "too short"),                           // gate
      (6L, base(6) + " contact bob@x.com please"), // survives scrubbed
      (7L, base(7)),                               // decontaminated
      (8L, base(8) + " mail alice@y.com"),         // survives
      (9L, base(8) + " mail carol@z.com"),         // exact dup after scrub
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val eval_ = Seq((100L, "word7x1 word7x2 word7x3 word7x4 word7x5"))
      .toDF("doc_id", "text")

    val (out, report) = CorpusPipeline.prepareWithReport(docs, Some(eval_),
      CorpusPipeline.Config(nearDupTau = 0.8, packBudget = 50L))
    val byStage = report.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc counts: 9 in; gate kills 5; scrub keeps count; exact dedup kills
    // 3 and 9 (9 only dups 8 AFTER scrub); near kills 4; decontam kills 7
    assert(byStage("0_input")._1 === 9L)
    assert(byStage("1_quality_gate")._1 === 8L)
    assert(byStage("2_pii_scrub")._1 === 8L)
    assert(byStage("3_exact_dedup")._1 === 6L)
    assert(byStage("4_near_dedup")._1 === 5L)
    assert(byStage("5_semantic_dedup")._1 === 5L) // no embeddings: unchanged
    assert(byStage("6_decontam")._1 === 4L)
    assert(byStage("7_mixed")._1 === 4L) // no mixing configured: unchanged
    assert(byStage("8_packed")._1 === 4L)
    // token mass is monotone non-increasing across stages (scrub may
    // shorten text, never lengthen counts)
    val order = Seq("0_input", "1_quality_gate", "2_pii_scrub", "3_exact_dedup",
      "4_near_dedup", "5_semantic_dedup", "6_decontam", "7_mixed", "8_packed")
    val toks = order.map(byStage(_)._2)
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b }, toks.toString)
    // the result frame is the same survivors prepare() returns
    assert(out.select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
      === Seq(1L, 2L, 6L, 8L))
  }

  test("semantic dedup stage: paraphrases collapse, embedding-less docs survive") {
    // docs 1 and 2 share NO n-grams (the text dedups keep both) but carry
    // near-identical embeddings -> the semantic stage drops the higher id;
    // doc 3 has an orthogonal embedding; doc 4 has NO embedding row
    val docs = Seq(
      (1L, base(1)), (2L, base(2)), (3L, base(3)), (4L, base(4)),
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val v = Seq.fill(8)(Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)).flatten
    val v2 = v.updated(1, 0.01f)
    val w = Seq.fill(8)(Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)).flatten
    val emb = Seq((1L, v), (2L, v2), (3L, w)).toDF("doc_id", "embedding")
    val out = CorpusPipeline.prepare(docs, None,
      CorpusPipeline.Config(semDedupTau = 0.95, semDedupNCentroids = 1),
      embeddings = Some(emb))
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 3L, 4L))
    // without the embeddings frame, all four survive
    val plain = CorpusPipeline.prepare(docs, None, CorpusPipeline.Config())
    assert(plain.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L))
  }

  test("normalizeFingerprints: case/punct variants dedup + decontaminate; raw text survives") {
    // doc 2 is doc 1 with its content words UPPERCASED and comma-joined,
    // plus one extra word: byte-distinct (survives exact dedup), zero
    // shared raw shingles (survives raw near-dedup), a J=22/23 near-dup
    // after normalization. Stopwords stay lowercase so the gopher gate
    // keeps it either way.
    val variant = "the tale of and to in " +
      (1 to 18).map(j => s"WORD1X$j,").mkString(" ") + " extraword"
    // doc 3's 5-gram appears in the eval set uppercased: contaminated
    // only under normalized fingerprints
    val docs = Seq(
      (1L, base(1)),
      (2L, variant),
      (3L, base(3)),
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val eval_ = Seq((100L, "WORD3X1 WORD3X2 WORD3X3 WORD3X4 WORD3X5"))
      .toDF("doc_id", "text")

    val raw = CorpusPipeline.prepare(docs, Some(eval_),
      CorpusPipeline.Config(nearDupTau = 0.8))
    assert(raw.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L))

    val norm = CorpusPipeline.prepare(docs, Some(eval_),
      CorpusPipeline.Config(nearDupTau = 0.8, normalizeFingerprints = true))
      .orderBy("doc_id")
    val rows = norm.collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
    // the output carries the RAW text and no normalization residue
    assert(rows(0).getAs[String]("text") === base(1))
    assert(!norm.columns.contains("raw_text"))
  }

  test("removeDupPassages stage: boilerplate strips before dedup; empty docs drop") {
    // shared 20-token prefix = EXACTLY chunk 0 of every doc (aligned by
    // construction); unique 20-token tails keep docs 1-3 distinct; doc 4
    // is pure boilerplate and must vanish at the 2b stage
    val bp = "the a of and to in " +
      (1 to 14).map(j => s"boiler$j").mkString(" ")
    val docs = Seq(
      (1L, s"$bp " + (1 to 20).map(j => s"t1x$j").mkString(" ")),
      (2L, s"$bp " + (1 to 20).map(j => s"t2x$j").mkString(" ")),
      (3L, s"$bp " + (1 to 20).map(j => s"t3x$j").mkString(" ")),
      (4L, bp),
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val (result, report) = CorpusPipeline.prepareWithReport(docs, None,
      CorpusPipeline.Config(removeDupPassages = Some((20, 2))))
    val census = report.collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(census("2_pii_scrub") === 4L)
    assert(census("2b_passage_scrub") === 3L) // doc 4 emptied and dropped
    assert(census("8_packed") === 3L)
    val rows = result.orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 3L))
    // the boilerplate chunk is gone from every surviving text
    assert(rows.forall(!_.getAs[String]("text").contains("boiler1")))
    assert(rows(0).getAs[String]("text") === (1 to 20).map(j => s"t1x$j").mkString(" "))
    // default config still reports 9 stages (no 2b)
    val (_, plainReport) = CorpusPipeline.prepareWithReport(docs, None)
    assert(plainReport.count() === 9L)
  }

  test("prepareIncremental: batch dedups against the standing corpus, not itself") {
    // standing = an already-prepared corpus of two docs
    val standing = Seq((1L, base(1)), (2L, base(2)))
      .toDF("doc_id", "text").withColumn("source", lit("s"))
    val incoming = Seq(
      (10L, base(1)),                 // exact dup of STANDING 1 -> drops
      (11L, base(2) + " extraword"),  // near dup of STANDING 2 -> drops
      (12L, base(12)),                // novel -> survives
      (13L, base(12) + " extraword"), // near dup of lower-id BATCH 12 -> drops
      (14L, base(14)),                // shares a 5-gram with eval -> drops
      (15L, "too short"),             // gate -> drops
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val eval_ = Seq((100L, "word14x1 word14x2 word14x3 word14x4 word14x5"))
      .toDF("doc_id", "text")

    val out = CorpusPipeline.prepareIncremental(incoming, standing, Some(eval_),
      CorpusPipeline.Config(nearDupTau = 0.8))
      .orderBy("doc_id")
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(12L))
    // the survivor is packed with the prepare() output shape
    assert(out.columns.toSeq ===
      Seq("doc_id", "source", "text", "n_tokens", "bin", "pos_in_bin"))
  }

  test("prepareIncremental semantic stage: batch paraphrase of a standing doc drops") {
    val standing = Seq((1L, base(1)))
      .toDF("doc_id", "text").withColumn("source", lit("s"))
    val incoming = Seq(
      (20L, base(20)), // paraphrase of standing 1 (by embedding) -> drops
      (21L, base(21)), // distinct embedding -> survives
      (22L, base(22)), // no embedding row -> never dropped by this stage
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val v = Seq.fill(8)(1.0f)
    val o = (0 until 8).map(i => if (i % 2 == 0) 1.0f else -1.0f)
    val emb = Seq((1L, v), (20L, v), (21L, o)).toDF("doc_id", "embedding")

    // without embeddings the whole batch survives (no shared n-grams)
    val plain = CorpusPipeline.prepareIncremental(incoming, standing)
    assert(plain.select("doc_id").as[Long].collect().toSet === Set(20L, 21L, 22L))
    val out = CorpusPipeline.prepareIncremental(incoming, standing,
      cfg = CorpusPipeline.Config(semDedupTau = 0.95, semDedupNCentroids = 1),
      embeddings = Some(emb))
    assert(out.select("doc_id").as[Long].collect().toSet === Set(21L, 22L))
    // frozen centroids (the persisted-across-ingests path) agree
    val frozen = CorpusPipeline.prepareIncremental(incoming, standing,
      cfg = CorpusPipeline.Config(semDedupTau = 0.95, semDedupNCentroids = 1),
      embeddings = Some(emb),
      centroids = Some(Seq(Seq.fill(8)(0.5))))
    assert(frozen.select("doc_id").as[Long].collect().toSet === Set(21L, 22L))
  }

  test("prepareIncremental honors normalizeFingerprints against the standing corpus") {
    // the incoming doc is the standing doc with content words UPPERCASED
    // and comma-joined: raw fingerprints miss it, normalized ones hit
    val standing = Seq((1L, base(1)))
      .toDF("doc_id", "text").withColumn("source", lit("s"))
    val variant = "the tale of and to in " +
      (1 to 18).map(j => s"WORD1X$j,").mkString(" ") + " extraword"
    val incoming = Seq((10L, variant), (11L, base(11)))
      .toDF("doc_id", "text").withColumn("source", lit("s"))

    val raw = CorpusPipeline.prepareIncremental(incoming, standing,
      cfg = CorpusPipeline.Config(nearDupTau = 0.8))
    assert(raw.select("doc_id").as[Long].collect().toSet === Set(10L, 11L))

    val norm = CorpusPipeline.prepareIncremental(incoming, standing,
      cfg = CorpusPipeline.Config(nearDupTau = 0.8, normalizeFingerprints = true))
    assert(norm.select("doc_id").as[Long].collect().toSet === Set(11L))
    // raw text (not the normalized form) is what survives to the output
    assert(norm.select("text").as[String].collect().head === base(11))
  }

  test("prepareIncremental stage parity: 2b + mixing == batch-on-union for incoming survivors") {
    // Differential: with removeDupPassages AND mixWeights on, the
    // incremental form must keep exactly the incoming rows (same text,
    // same token counts) that a full batch prepare() over standing+incoming
    // keeps — standing docs here are clean (no internal boilerplate, no
    // near-dups, all pass the gate) so they ride through the batch run
    // unchanged and the two censuses (2b chunk census, stage-7 token
    // census) see identical corpora. Bins are excluded: packing is
    // batch-scoped by design.
    val standing = (1 to 6).map(i => (i.toLong, base(i), "web"))
      .toDF("doc_id", "text", "source")
    // boilerplate = exactly one aligned 20-token chunk, shared by >= 2
    // INCOMING docs (never with standing)
    val bp = "the a of and to in " + (1 to 14).map(j => s"inboiler$j").mkString(" ")
    val incoming = (
      (10 to 15).map(i => (i.toLong, base(i * 7), "web")) ++ Seq(
        (20L, s"$bp " + (1 to 20).map(j => s"u20x$j").mkString(" "), "web"),
        (21L, s"$bp " + (1 to 20).map(j => s"u21x$j").mkString(" "), "web"),
        (22L, bp, "web"), // pure boilerplate -> empties and drops at 2b
      )).toDF("doc_id", "text", "source")
    val cfg = CorpusPipeline.Config(
      removeDupPassages = Some((20, 2)),
      // budget ~ half the union's tokens so the mix frac lands in (0, 1)
      // and membership decisions actually bite
      mixWeights = Some((170L, Map("web" -> 1.0))))
    val inc = CorpusPipeline.prepareIncremental(incoming, standing, None, cfg)
      .select("doc_id", "text", "n_tokens")
    val batch = CorpusPipeline.prepare(standing.unionByName(incoming), None, cfg)
      .filter(col("doc_id") >= 10L)
      .select("doc_id", "text", "n_tokens")
    val incRows = inc.as[(Long, String, Long)].collect().toSet
    val batchRows = batch.as[(Long, String, Long)].collect().toSet
    assert(incRows === batchRows)
    assert(incRows.nonEmpty, "differential vacuous: no incoming survivor")
    assert(incRows.size < 9, "differential vacuous: mixing dropped nothing")
    assert(!incRows.exists(_._1 == 22L), "pure-boilerplate doc must drop at 2b")
    // the shared chunk is stripped from the survivors that carried it
    assert(incRows.filter(r => r._1 == 20L || r._1 == 21L)
      .forall(!_._2.contains("inboiler1")))
  }

  test("prepareIncremental 2b: boilerplate shared with the STANDING corpus strips") {
    // one incoming doc shares its leading chunk with one standing doc —
    // the union census reaches minDocs=2 across the boundary, so the
    // incremental form strips it from the incoming doc (the standing side
    // is never rewritten, only censused)
    val bp = "the a of and to in " + (1 to 14).map(j => s"stboiler$j").mkString(" ")
    val standing = Seq(
      (1L, s"$bp " + (1 to 20).map(j => s"s1x$j").mkString(" "), "web"),
      (2L, base(2), "web"),
    ).toDF("doc_id", "text", "source")
    val incoming = Seq(
      (10L, s"$bp " + (1 to 20).map(j => s"u10x$j").mkString(" "), "web"),
      (11L, base(11), "web"),
    ).toDF("doc_id", "text", "source")
    val out = CorpusPipeline.prepareIncremental(incoming, standing, None,
      CorpusPipeline.Config(removeDupPassages = Some((20, 2))))
      .orderBy("doc_id").select("doc_id", "text")
      .as[(Long, String)].collect()
    assert(out.map(_._1).toSeq === Seq(10L, 11L))
    assert(out(0)._2 === (1 to 20).map(j => s"u10x$j").mkString(" "))
    assert(out(1)._2 === base(11))
  }

  test("optional stages: no eval corpus, mixing toward a token budget") {
    val docs = (1 to 40).map(i =>
      (i.toLong, base(i), if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "text", "source")
    // books weighted out entirely; web sampled toward ~half its tokens
    val out = CorpusPipeline.prepare(docs, None,
      CorpusPipeline.Config(mixWeights = Some((240L, Map("web" -> 1.0)))))
    val srcs = out.select("source").distinct().as[String].collect().toSeq
    assert(srcs === Seq("web"))
    val kept = out.count()
    assert(kept > 0 && kept < 20, s"expected a strict web subsample, got $kept")
  }

  test("qualityGate stage 1b: trained-classifier filter, batch == incremental") {
    // train on planted quality classes (disjoint vocab, clear separation)
    val posTrain = (0L until 10L).map(i =>
      (i, "the tale of and to in " + (1 to 18).map(j => s"fine$j").mkString(" "), 1))
    val negTrain = (10L until 20L).map(i =>
      (i, "the tale of and to in " + (1 to 18).map(j => s"spam$j").mkString(" "), 0))
    val labeled = (posTrain ++ negTrain).toDF("doc_id", "text", "label")
    val w = QualityLr.trainQualityLr(labeled, m = 32, steps = 3, lr = 0.5)
    // pipeline corpus: two docs from each class (gate-passing lengths);
    // spam docs fail the Gopher top-term-frequency rule, so give them
    // varied filler AND spam markers — they must be dropped by 1b, not 1
    val good = (100L until 102L).map(i =>
      (i, "the tale of and to in " + (1 to 12).map(j => s"fine$j").mkString(" ")
        + s" word${i}x1 word${i}x2 word${i}x3 word${i}x4 word${i}x5 word${i}x6"))
    val bad = (110L until 112L).map(i =>
      (i, "the tale of and to in " + (1 to 12).map(j => s"spam$j").mkString(" ")
        + s" word${i}x1 word${i}x2 word${i}x3 word${i}x4 word${i}x5 word${i}x6"))
    val docs = (good ++ bad).toDF("doc_id", "text").withColumn("source", lit("s"))
    // threshold between the classes, read off the actual scores
    val sc = QualityLr.scoreQualityLr(docs, w, m = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val thr = (good.map(g => sc(g._1)).min + bad.map(b => sc(b._1)).max) / 2
    assert(good.map(g => sc(g._1)).min > bad.map(b => sc(b._1)).max)
    val cfg = CorpusPipeline.Config(qualityGate = Some((w.toSeq, 32, thr)))
    val (out, report) = CorpusPipeline.prepareWithReport(docs, None, cfg)
    // 1b drops exactly the bad docs; the rule gate dropped nothing
    val rep = report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("1_quality_gate") === 4L)
    assert(rep("1b_quality_lr_gate") === 2L)
    assert(out.select("doc_id").as[Long].collect().toSet === good.map(_._1).toSet)
    // incremental parity: same weights in the config, same batch decision
    val standing = CorpusPipeline.prepare(docs.filter($"doc_id" < 102), None, cfg)
      .select("doc_id", "source", "text")
    val novelGood = (200L, "the tale of and to in "
      + (1 to 12).map(j => s"fine$j").mkString(" ")
      + " fresh1 fresh2 fresh3 fresh4 fresh5 fresh6")
    val incBatch = (good.drop(1) ++ bad ++ Seq(novelGood))
      .toDF("doc_id", "text")
      .withColumn("source", lit("s"))
      .withColumn("doc_id", $"doc_id" + 1000L)
    val inc = CorpusPipeline.prepareIncremental(incBatch, standing, None, cfg)
    // bad docs drop at 1b (same weights as the batch run), the replica of
    // standing 101 drops at exact dedup, the novel good doc survives
    assert(inc.select("doc_id").as[Long].collect().toSet === Set(1200L))
  }

  test("applyTrainedGates: fused 1b+1c == sequential transforms; different m falls back") {
    // planted markers: quality by 'fine'/'spam' vocab, language by
    // 'zzen'/'zzde' markers — four cohorts so each gate drops a
    // DIFFERENT subset and the conjunction is observable
    def doc(i: Long, q: String, l: String): (Long, String) =
      (i, "the tale of and to in " +
        (1 to 12).map(j => s"$q$j").mkString(" ") + (s" zz${l}mark" * 6) +
        s" w${i}x1 w${i}x2 w${i}x3 w${i}x4 w${i}x5 w${i}x6")
    val docs = Seq(
      doc(1, "fine", "en"), doc(2, "fine", "de"),
      doc(3, "spam", "en"), doc(4, "spam", "de"))
      .toDF("doc_id", "text").withColumn("source", lit("s"))
    // the 2x2 grid DECORRELATES the training signals: quality from doc_id
    // parity, language from (doc_id/2) parity — a correlated set would
    // teach the quality model the language markers too, and a spam+en doc
    // would score mid-range instead of below the threshold
    val labeled = ((0L until 8L).map(i =>
      doc(100 + i, if (i % 2 == 0) "fine" else "spam",
        if ((i / 2) % 2 == 0) "en" else "de")))
      .toDF("doc_id", "text")
      .withColumn("label", (($"doc_id" % 2) === 0).cast("int"))
      .withColumn("lang",
        when((($"doc_id" - 100) % 4) < 2, "en").otherwise("de"))
    val m = 32
    val qw = QualityLr.trainQualityLr(labeled, m, steps = 3, lr = 0.5)
    val models = QualityLr.trainOneVsRestLr(
      labeled, "lang", Seq("de", "en"), m, steps = 3, lr = 0.5)
    val sc = QualityLr.scoreQualityLr(docs, qw, m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val thr = (Seq(1L, 2L).map(sc).min + Seq(3L, 4L).map(sc).max) / 2
    val quality = Some((qw.toSeq, m, thr))
    val lang = Some((models.map { case (c, w) => (c, w.toSeq) }, m,
      Set("en")))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").as[Long].collect().toSet
    val sequential = CorpusPipeline.applyLangGate(
      CorpusPipeline.applyQualityGate(docs, quality), lang)
    val fused = CorpusPipeline.applyTrainedGates(docs, quality, lang)
    assert(ids(sequential) === Set(1L), "scenario must isolate doc 1")
    assert(ids(fused) === ids(sequential))
    // one-gate-off forms route through the standalone transforms
    assert(ids(CorpusPipeline.applyTrainedGates(docs, quality, None)) ===
      ids(CorpusPipeline.applyQualityGate(docs, quality)))
    assert(ids(CorpusPipeline.applyTrainedGates(docs, None, lang)) ===
      ids(CorpusPipeline.applyLangGate(docs, lang)))
    // different m: falls back to sequential — same kept set (the lang
    // models retrain at m=64; scores differ numerically but the planted
    // separation holds in both regimes)
    val models64 = QualityLr.trainOneVsRestLr(
      labeled, "lang", Seq("de", "en"), 64, steps = 3, lr = 0.5)
    val lang64 = Some((models64.map { case (c, w) => (c, w.toSeq) }, 64,
      Set("en")))
    assert(ids(CorpusPipeline.applyTrainedGates(docs, quality, lang64)) ===
      ids(CorpusPipeline.applyLangGate(
        CorpusPipeline.applyQualityGate(docs, quality), lang64)))
  }

  test("keepLangs stage 1c: trained langid filter, batch == incremental == state-fed") {
    // planted languages with DISJOINT vocab; m large enough that the
    // pipeline docs' per-doc filler tokens can't collide away the signal
    // (and large enough that 2 models x 513 weights exceed the literal
    // cap, so this spec also rides the broadcast-join delivery)
    val m = 512
    val aaTrain = (0L until 10L).map(i =>
      (i, (1 to 12).map(j => s"alef$j").mkString(" "), "aa"))
    val bbTrain = (10L until 20L).map(i =>
      (i, (1 to 12).map(j => s"bet$j").mkString(" "), "bb"))
    val labeled = (aaTrain ++ bbTrain).toDF("doc_id", "text", "lang")
    // classes passed unsorted — the trainer emits sorted order
    val models = QualityLr.trainOneVsRestLr(
      labeled, "lang", Seq("bb", "aa"), m, steps = 3, lr = 0.5)
    // pipeline corpus: two docs per language, dressed to pass the rule
    // gate (stopwords, 24 distinct words, sane word lengths)
    def dress(id: Long, vocab: String): (Long, String) =
      (id, "the tale of and to in " + (1 to 12).map(j => s"$vocab$j").mkString(" ")
        + s" word${id}x1 word${id}x2 word${id}x3 word${id}x4 word${id}x5 word${id}x6")
    val aaDocs = Seq(dress(100L, "alef"), dress(101L, "alef"))
    val bbDocs = Seq(dress(110L, "bet"), dress(111L, "bet"))
    val docs = (aaDocs ++ bbDocs).toDF("doc_id", "text")
      .withColumn("source", lit("s"))
    // sanity: the models actually predict the planted classes on the
    // DRESSED text before the pipeline relies on it
    val preds = QualityLr.scoreOneVsRestLr(docs, models, m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    aaDocs.foreach { case (id, _) => assert(preds(id) === "aa", s"doc $id") }
    bbDocs.foreach { case (id, _) => assert(preds(id) === "bb", s"doc $id") }
    val cfg = CorpusPipeline.Config(keepLangs = Some((
      models.map { case (c, w) => (c, w.toSeq) }, m, Set("aa"))))
    val (out, report) = CorpusPipeline.prepareWithReport(docs, None, cfg)
    val rep = report.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the rule gate dropped nothing; 1c dropped exactly the bb docs —
    // pinning the stage position between the rule gate and the scrub
    assert(rep("1_quality_gate") === 4L)
    assert(rep("1c_langid_gate") === 2L)
    assert(rep("2_pii_scrub") === 2L)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(100L, 101L))
    // incremental parity: same models ride the config; a replica of
    // standing 101 drops at exact dedup, bb docs at 1c, a novel aa doc
    // survives
    val standing = CorpusPipeline.prepare(docs.filter($"doc_id" < 102), None, cfg)
      .select("doc_id", "source", "text")
      .localCheckpoint(true)
    val incBatch = (Seq(dress(101L, "alef")) ++ bbDocs
      ++ Seq(dress(200L, "alef")))
      .toDF("doc_id", "text")
      .withColumn("source", lit("s"))
      .withColumn("doc_id", $"doc_id" + 1000L)
    val inc = CorpusPipeline.prepareIncremental(incBatch, standing, None, cfg)
    assert(inc.select("doc_id").as[Long].collect().toSet === Set(1200L))
    // state-fed parity: the same batch against a persisted state over the
    // same standing corpus lands identically
    val standingDir = java.nio.file.Files
      .createTempDirectory("lang_standing_").toString
    standing.write.mode("overwrite").parquet(standingDir)
    val statePath = java.nio.file.Files
      .createTempDirectory("lang_state_").toString
    graft.llm.StandingState.write(spark.read.parquet(standingDir), statePath)
    val incState = CorpusPipeline.prepareIncrementalWithState(
      incBatch, spark.read.parquet(standingDir),
      graft.llm.StandingState.load(spark, statePath), None, cfg)
    assert(incState.select("doc_id").as[Long].collect().toSet === Set(1200L))
  }
}
