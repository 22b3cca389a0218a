package graft

import graft.ops.{CurationOps, SpanOps, TextOps}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantics of the corpus-curation operators (CurationOps): n-gram
  * decontamination, scalar quantization, mixture rebalance, term scrubbing.
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("dsir weights: sign tracks target alignment, monotone in target " +
      "fraction, tokenless docs absent, partition-order independent") {
    val docs = Seq(
      (0L, "good good good good", "en"),
      (1L, "bad bad bad bad", "xx"),
      (2L, "good bad", "xx"),
      (3L, null: String, "en")
    ).toDF("doc_id", "text", "lang")
    val out = CurationOps.dsirWeightsOn(docs, col("lang") === "en").collect()
    // doc 3 has no tokens → no features → absent, like every token consumer
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(0L -> 4L, 1L -> 4L, 2L -> 2L))
    val w = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // vocab {good, bad}: target is all-'good', so ln p_t/p_r is positive
    // for 'good' and negative for 'bad'
    assert(w(0L) > 0, s"all-target-token doc must score positive: ${w(0L)}")
    assert(w(1L) < 0, s"off-target doc must score negative: ${w(1L)}")
    assert(w(0L) > w(2L) && w(2L) > w(1L),
      s"weights must be monotone in target-token fraction: $w")
    // hand-check doc 0: 4 · (ln(5/6) − ln(6/12)) rounded at 6 dp per token
    val llrGood = math.rint((math.log(5.0 / 6) - math.log(6.0 / 12)) * 1e6) / 1e6
    assert(math.abs(w(0L) - 4 * llrGood) < 1e-9)

    // the decimal accumulator makes the answer partition-order independent
    val shuffled = CurationOps.dsirWeightsOn(
      docs.repartition(7), col("lang") === "en").collect()
    assert(shuffled.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet === out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet)

    // a different target predicate flips the tilt
    val flipped = CurationOps.dsirWeightsOn(docs, col("lang") === "xx")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(flipped(1L) > 0 && flipped(0L) < 0,
      s"target=xx must invert the ranking: $flipped")
  }

  test("hashed dsir: injective bucketing reproduces the raw-token weights " +
      "exactly; colliding buckets still cover every scored doc") {
    val docs = Seq(
      (0L, "good good better best", "en"),
      (1L, "bad worse worst bad", "xx"),
      (2L, "good bad middling", "xx")
    ).toDF("doc_id", "text", "lang")
    val raw = CurationOps.dsirWeightsOn(docs, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 2^20 buckets over a 7-word vocabulary: verify injectivity holds for
    // THIS vocab (occupied buckets = |vocab|), then equality is exact
    // because the smoothing V counts occupied features
    val tokens = docs.select(explode(split(trim(col("text")), " ")).as("t"))
    val nVocab = tokens.select("t").distinct().count()
    val nFeats = tokens
      .select(pmod(xxhash64(col("t")), lit((1L << 20))).as("f"))
      .distinct().count()
    assert(nFeats === nVocab, "fixture must be collision-free at 2^20")
    val out = CurationOps.dsirWeightsHashedOn(docs, col("lang") === "en",
      1 << 20).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out === raw,
      "injective hashing must reproduce the raw-token DSIR weights")
    // heavy collisions (2 buckets): weights change by design, but every
    // doc still scores and token counts are preserved
    val coarse = CurationOps.dsirWeightsHashedOn(docs, col("lang") === "en", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(coarse === Map(0L -> 4L, 1L -> 4L, 2L -> 3L))
  }

  test("dsir from token-count store: store path equals the raw face on " +
      "the store's corpus, incremental appends match the one-shot LM, " +
      "unseen tokens score nothing") {
    val batch1 = Seq(
      (0L, "good good good good", "en"),
      (1L, "bad bad bad bad", "xx"),
      (2L, "good bad", "xx")
    ).toDF("doc_id", "text", "lang")
    val batch2 = Seq(
      (3L, "good bad bad", "en"),
      (4L, "bad good", "xx")
    ).toDF("doc_id", "text", "lang")
    val path = tmpDir("dsir-store") + "/token_counts"
    // the store keys LMs by `source`; source := lang replays the q124
    // language target through the store face
    def asStoreDocs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("lang").as("source"), col("text"))
    TextOps.writeTokenCountStore(asStoreDocs(batch1), path)
    val raw1 = CurationOps.dsirWeightsOn(batch1, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val fromStore1 = CurationOps.dsirWeightsFromStore(batch1, spark, path,
        col("source") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fromStore1 === raw1, "store ≡ raw on the store's own corpus")
    // crawl 2: append the new batch's counts, score ONLY the new batch —
    // rows must equal the one-shot raw answer over the combined corpus
    // (same LM contraction by the OpsSpec sum-on-read law)
    TextOps.appendToTokenCountStore(asStoreDocs(batch2), path)
    val rawAll = CurationOps.dsirWeightsOn(batch1.union(batch2),
        col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(_._1 >= 3L).toSeq
    val incr = CurationOps.dsirWeightsFromStore(batch2, spark, path,
        col("source") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(incr === rawAll,
      "incremental scoring must equal the one-shot combined-corpus answer")
    // a batch with tokens the LM never saw: unseen tokens are outside the
    // fixed feature space — they contribute nothing and don't count, and
    // an all-unseen doc is absent entirely
    val probe = Seq((9L, "good unseen"), (10L, "unseen unseen"))
      .toDF("doc_id", "text")
    val scored = CurationOps.dsirWeightsFromStore(probe, spark, path,
        col("source") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(scored === Seq((9L, 1L)), s"unseen-token handling: $scored")
  }

  test("split leakage: a 5-gram straddling the hash-split boundary is " +
      "flagged to its train source, clean sources read zero") {
    // probe the DETERMINISTIC split assignment for candidate ids first
    val splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val assign = CurationOps.withHashSplit(
      (0L until 30L).map(i => (i, "x")).toDF("doc_id", "text"),
      "graft-split", splits)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val trainIds = assign.filter(_._2 == "train").keys.toSeq.sorted
    val heldId = assign.find(_._2 != "train").map(_._1).get
    // leaky: a train doc and a held-out doc share one 5-gram; clean: a
    // second train doc with fully disjoint text
    val docs = Seq(
      (trainIds(0), "srcA", "prefix one two three four five suffix words"),
      (trainIds(1), "srcB", "completely different disjoint text body here"),
      (heldId, "srcH", "one two three four five"))
      .toDF("doc_id", "source", "text")
    val out = CurationOps.splitLeakageOn(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // only train docs are audited; the held-out source has no row
    assert(out.keySet === Set("srcA", "srcB"))
    assert(out("srcA") === ((1L, 1L, 1L, 1.0)),
      s"boundary-straddling 5-gram must flag srcA: ${out("srcA")}")
    assert(out("srcB") === ((1L, 0L, 0L, 0.0)),
      s"disjoint train doc must stay clean: ${out("srcB")}")
  }

  test("weighted sample: selection tracks weights across seeds, " +
      "non-positive weights excluded, keys replay driver-side") {
    val df = Seq((1L, 1000.0), (2L, 1.0), (3L, 0.0), (4L, -2.0))
      .toDF("doc_id", "w")
    // w=0 / w<0 can never be drawn; k caps the output
    val one = CurationOps.weightedSampleOn(df, col("w"), k = 1, seed = "s0")
      .collect()
    assert(one.length === 1)
    // over 200 fixed seeds (deterministic — no rand anywhere), the
    // 1000:1 weight ratio must dominate the top-1 draw
    val wins = (0 until 200).count { i =>
      CurationOps.weightedSampleOn(df, col("w"), k = 1, seed = s"seed$i")
        .collect().head.getLong(0) == 1L
    }
    assert(wins > 180, s"heavy doc won only $wins/200 top-1 draws")
    // full draw: only the two positive-weight docs are drawable, and
    // the E-S key replays exactly from the documented derivation
    val all = CurationOps.weightedSampleOn(df, col("w"), k = 10, seed = "sx")
      .collect()
    assert(all.map(_.getLong(0)).toSet === Set(1L, 2L))
    all.foreach { r =>
      val id = r.getLong(0)
      val w = Map(1L -> 1000.0, 2L -> 1.0)(id)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"sx:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) /
        4294967297.0
      val key = math.rint(math.log(u) / w * 1e6) / 1e6
      assert(math.abs(r.getDouble(2) - key) < 1e-9, s"doc $id key")
    }
  }

  test("dataset card: volumes, quality split, cross-source dup attribution") {
    import graft.ops.CurationOps
    val docs = Seq(
      // srcA: diverse text (good quality), one copy of the shared dup
      (1L, "srcA", "en", "alpha beta gamma delta epsilon zeta"),
      (2L, "srcA", "en", "Shared  Boilerplate"), // normalizes to the dup
      // srcB: the same boilerplate twice (case/ws-insensitive) + one unique
      (3L, "srcB", "en", "shared boilerplate"),
      (4L, "srcB", "de", "shared boilerplate"),
      (5L, "srcB", "en", "x x x x x x x x")) // repetitive → low quality
      .toDF("doc_id", "source", "lang", "text")
    val out = CurationOps.datasetCardOn(docs).collect()
    val bySrc = out.map(r => r.getAs[String]("source") -> r).toMap
    val a = bySrc("srcA")
    assert(a.getAs[Long]("n_docs") === 2L)
    // 6 + 3: the double space yields an empty token under the corpus's
    // single-space split convention
    assert(a.getAs[Long]("n_tokens") === 9L)
    assert(a.getAs[Long]("n_langs") === 1L)
    assert(a.getAs[Long]("n_dup_docs") === 1L) // the shared boilerplate copy
    assert(a.getAs[Double]("dup_share") === 0.5)
    val b = bySrc("srcB")
    assert(b.getAs[Long]("n_docs") === 3L)
    assert(b.getAs[Long]("n_langs") === 2L)
    assert(b.getAs[Long]("n_dup_docs") === 2L) // both copies flagged
    // the diverse doc scores 'good'; the x-run does not
    assert(a.getAs[Long]("n_good") >= 1L)
    assert(b.getAs[Double]("avg_quality") < a.getAs[Double]("avg_quality"))
  }

  test("ngram decontamination flags 5-gram overlap, not shorter overlap") {
    val docs = Seq(
      // benchmark doc: one 6-token text → two 5-grams
      (1L, "bench", "a b c d e f"),
      // shares the 5-gram "b c d e f" → contaminated
      (2L, "train", "x b c d e f y"),
      // shares only a 4-gram run (c d e f broken by z) → clean
      (3L, "train", "b c d e z f g h i j"),
      // no overlap at all
      (4L, "train", "p q r s t u v"),
      // too short for any 5-gram
      (5L, "train", "a b c")) .toDF("doc_id", "source", "text")
    val out = CurationOps
      .ngramDecontaminationOn(docs, col("source") === "bench")
      .select("doc_id", "n_shared_5grams", "contaminated").collect()
    assert(out.toSeq === Seq(
      Row(2L, 1L, true), Row(3L, 0L, false), Row(4L, 0L, false),
      Row(5L, 0L, false)))
  }

  test("ngram decontamination counts distinct shared 5-grams once") {
    val docs = Seq(
      (1L, "bench", "a b c d e"),
      // the shared 5-gram occurs twice in the train doc → still counts 1
      (2L, "train", "a b c d e a b c d e")).toDF("doc_id", "source", "text")
    val out = CurationOps
      .ngramDecontaminationOn(docs, col("source") === "bench")
      .select("n_shared_5grams").collect()
    assert(out === Array(Row(1L)))
  }

  test("ngram decontamination broadcasts the benchmark side") {
    val docs = Tables.t(spark, sfDir, "documents")
    val plan = CurationOps
      .ngramDecontaminationOn(docs, col("source") === "src9")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("ngram decontamination: the contracted arm equals the explode arm " +
      "on a dup-dense corpus, and the probe dispatches it") {
    import spark.implicits._
    val leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val clean = "one two three four five six seven eight nine ten"
    // benchmark doc duplicated 3x, leaking train doc 40x, clean doc 60x,
    // plus a short (<5 tokens) doc — dup fraction ≈ 0.97 > 0.5
    val rows = (0L until 3L).map(i => (i, "src9", leak)) ++
      (10L until 50L).map(i => (i, "src0", "prefix " + leak + " suffix")) ++
      (100L until 160L).map(i => (i, "src1", clean)) ++
      Seq((200L, "src0", "too short here"))
    val docs = rows.toDF("doc_id", "source", "text")
    val bench = col("source") === "src9"
    val exploded = CurationOps
      .ngramDecontaminationOn(docs, bench, contractDuplicates = Some(false))
      .collect().map(_.toSeq).toSeq
    val contracted = CurationOps
      .ngramDecontaminationOn(docs, bench, contractDuplicates = Some(true))
      .collect().map(_.toSeq).toSeq
    assert(contracted === exploded)
    val auto = CurationOps.ngramDecontaminationOn(docs, bench)
      .collect().map(_.toSeq).toSeq
    assert(auto === exploded, "the density probe must pick the same rows")
    // sanity on content: every leaking copy flagged, clean/short never
    val flagged = exploded.filter(_(4) == true).map(_(0)).toSet
    assert(flagged === (10L until 50L).toSet)
  }

  test("substring contamination finds verbatim quoted spans only") {
    val docs = Seq(
      // benchmark: needle = its first 8 normalized tokens
      (1L, "bench", "The Quick brown fox jumps over the lazy dog today"),
      (2L, "bench", "never quoted anywhere in the training corpus at all"),
      (3L, "bench", "too short for a probe"), // < 8 tokens → excluded
      // quotes doc 1's needle verbatim (case/space-normalized) → hit
      (4L, "train", "prefix THE  QUICK BROWN fox jumps over the lazy suffix"),
      // breaks the span at token 5 → clean
      (5L, "train", "the quick brown fox leaps over the lazy dog"))
      .toDF("doc_id", "source", "text")
    val out = CurationOps
      .substringContaminationOn(docs, col("source") === "bench")
      .select("eval_id", "n_train_hits", "contaminated").collect()
    assert(out.toSeq === Seq(Row(1L, 1L, true), Row(2L, 0L, false)))
  }

  test("aho-corasick kernel path equals the declarative contains path") {
    // real corpus slice, both dispatch arms forced: acThreshold=0 sends
    // every probe through the automaton, MaxValue keeps the contains loop
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val bench = col("source") === "src9"
    val declarative = CurationOps
      .substringContaminationOn(docs, bench, acThreshold = Int.MaxValue)
      .collect().toSeq
    val kernel = CurationOps
      .substringContaminationOn(docs, bench, acThreshold = 0)
      .collect().toSeq
    assert(kernel === declarative)
    assert(declarative.nonEmpty)
  }

  test("aho-corasick matches mid-token and duplicate needles like contains") {
    // mid-token occurrence: needle "he quick..." starts inside "the";
    // duplicate needle strings keep one output row per probe id
    val docs = Seq(
      (1L, "bench", "he quick brown fox jumps over the lazy dog"),
      (2L, "bench", "he quick brown fox jumps over the lazy dog"),
      (3L, "train", "xthe quick brown fox jumps over the lazy dog"),
      (4L, "train", "nothing shared here at all with anyone today"))
      .toDF("doc_id", "source", "text")
    val out = CurationOps
      .substringContaminationOn(docs, col("source") === "bench",
        acThreshold = 0)
      .select("eval_id", "n_train_hits", "contaminated").collect()
    assert(out.toSeq === Seq(Row(1L, 1L, true), Row(2L, 1L, true)))
  }

  test("source overlap counts shared distinct 5-grams per pair") {
    val docs = Seq(
      ("sA", "a b c d e f"), // 5-grams: {a b c d e, b c d e f}
      ("sB", "a b c d e x"), // shares exactly "a b c d e" with sA
      ("sB", "a b c d e x"), // duplicate doc: distinct sets unchanged
      ("sC", "q r s t u v")) // disjoint → no pair row emitted
      .toDF("source", "text")
    val out = CurationOps.sourceOverlapOn(docs).collect()
    assert(out.map(_.toSeq).toSeq === Seq(
      Seq("sA", "sB", 2L, 2L, 1L, 0.333333)))
  }

  test("aho-corasick agrees with String.contains on arbitrary inputs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tiny alphabet → dense overlaps, shared prefixes/suffixes, duplicate
    // patterns — the cases where fail links and output chains go wrong
    val s = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val prop = Prop.forAll(
      Gen.nonEmptyListOf(s).map(_.take(12).toArray),
      Gen.listOfN(20, Gen.oneOf('a', 'b', 'c')).map(_.mkString)) {
      (pats, text) =>
        val ac = graft.ops.AhoCorasick.build(pats)
        val got = graft.ops.AhoCorasick
          .matchedIds(ac, text, pats.length).toSet
        val want = pats.indices.filter(i => text.contains(pats(i))).toSet
        got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("quantization round-trips within half a quantization step") {
    val embDf = Tables.t(spark, sfDir, "embeddings")
    // worst-case reconstruction error is (mx-mn)/254/2 per dimension; find
    // the widest dimension's bound and assert every vector is inside it
    val widest = embDf
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim").agg((max("x") - min("x")).as("range"))
      .agg(max("range")).as[Double].head()
    val bound = widest / 254.0 / 2.0 + 1e-12
    val bad = CurationOps.embeddingQuantizationOn(embDf)
      .filter(col("max_abs_err") > bound).count()
    assert(bad === 0)
  }

  test("quantization is exact on a two-value dimension and 0 on a constant") {
    val embDf = Seq(
      (1L, 0, Array(0.0f, 5.0f)),
      (2L, 0, Array(1.0f, 5.0f))).toDF("vec_id", "label", "embedding")
    // dim 1 spans [0,1] → codes ±127 exactly recover endpoints; dim 2 is
    // degenerate (mx==mn) → code 0, error 0
    val out = CurationOps.embeddingQuantizationOn(embDf)
      .select("vec_id", "max_abs_err", "mse").collect()
    assert(out.toSeq === Seq(Row(1L, 0.0, 0.0), Row(2L, 0.0, 0.0)))
  }

  test("rebalance: whole, fractional, and down-sampling factors") {
    // doc_ids chosen so (id*48271+11) % 100 lands on both sides of 50:
    // id=1 → 48282%100=82 (≥50, no extra); id=3 → 144824%100=24 (<50, extra)
    val docs = Seq(
      (1L, "w", "t t"), (3L, "w", "t"),   // f=2.5 → 2 and 3 copies
      (1L, "d", "t"), (3L, "d", "t"),     // f=0.5 → drop and keep
      (7L, "u", "t t t"))                 // f=1.0 default → 1 copy
      .toDF("doc_id", "source", "text")
    val out = CurationOps.corpusRebalanceOn(docs,
        factors = Seq("w" -> 2.5, "d" -> 0.5))
      .collect()
    assert(out.toSeq === Seq(
      Row("d", 1L, 1L, 1L),   // id=1 dropped, id=3 kept once
      Row("u", 1L, 1L, 3L),
      Row("w", 2L, 5L, 7L))) // 2 + 3 copies; tokens 2·2 + 1·3
  }

  test("rebalance replica stream carries a per-copy index") {
    val docs = Seq((3L, "w", "t")).toDF("doc_id", "source", "text")
    // intermediate stream check via the public surface: n_docs_out counts
    // each replica row exactly once
    val out = CurationOps.corpusRebalanceOn(docs, factors = Seq("w" -> 3.0))
      .select("n_docs_out").as[Long].head()
    assert(out === 3L)
  }

  test("canonical keep picks the highest-scoring cluster member") {
    // docs 1+2 share the same token SET (Jaccard 1 → one cluster) but doc 2
    // repeats a token → lower distinct_ratio → doc 1 must survive; doc 9 is
    // unrelated and forms no cluster
    val docs = Seq(
      (1L, "en", "a b c d e f g h i j"),
      (2L, "en", "a b c d e f g h i j a"),
      (9L, "en", "one two three four five six seven eight"))
      .toDF("doc_id", "lang", "text")
    val out = CurationOps.dedupCanonicalOn(docs).collect()
    assert(out.toSeq === Seq(Row(1L, 2L, 1L, out.head.getDouble(3), 1L)))
    // doc 1's score strictly beats doc 2's (6 distinct vs 5-of-6 tokens)
    val scores = graft.ops.TextOps.qualityScoreOn(docs)
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L))
    assert(out.head.getDouble(3) === scores(1L))
  }

  test("canonical keep breaks score ties on the lowest doc_id") {
    // identical docs → identical scores → tie-break keeps the lowest id
    val docs = Seq(
      (5L, "en", "a b c d e"), (3L, "en", "a b c d e"),
      (7L, "en", "a b c d e")).toDF("doc_id", "lang", "text")
    val out = CurationOps.dedupCanonicalOn(docs)
      .select("rep", "n_members", "kept_doc_id", "n_dropped").collect()
    assert(out.toSeq === Seq(Row(3L, 3L, 3L, 2L)))
  }

  test("token packing splits a source at the running-token budget") {
    val docs = Seq(
      (1L, "s", Seq.fill(300)("t").mkString(" ")),  // cum 300 → pack 0
      (2L, "s", Seq.fill(300)("t").mkString(" ")),  // starts at 300 → pack 0
      (3L, "s", Seq.fill(300)("t").mkString(" ")),  // starts at 600 → pack 1
      (4L, "x", Seq.fill(10)("t").mkString(" ")))   // other source → pack 0
      .toDF("doc_id", "source", "text")
    val out = CurationOps.tokenPackingOn(docs, budget = 512L).collect()
    assert(out.toSeq === Seq(
      Row("s", 0L, 2L, 600L), Row("s", 1L, 1L, 300L),
      Row("x", 0L, 1L, 10L)))
  }

  test("token packing is deterministic in doc_id order, not input order") {
    val fwd = Seq((1L, "s", "a b"), (2L, "s", "c d"), (3L, "s", "e f"))
    val docs = spark.createDataFrame(fwd.reverse)
      .toDF("doc_id", "source", "text").repartition(3)
    val out = CurationOps.tokenPackingOn(docs, budget = 4L)
      .collect()
    // docs 1,2 fill pack 0 (4 tokens), doc 3 starts pack 1
    assert(out.toSeq === Seq(Row("s", 0L, 2L, 4L), Row("s", 1L, 1L, 2L)))
  }

  test("delta dedup classifies incoming rows against the existing corpus") {
    // existing: docs 1-2; incoming: 3 (dup of existing after normalization),
    // 4+5 (same NEW text — one unique + one within-batch dup), 6 (new)
    val docs = Seq(
      (1L, "s", "Hello  World"), (2L, "s", "other text"),
      (3L, "s", "hello world"),   // normalizes to doc 1's text
      (4L, "s", "brand new"), (5L, "s", "brand  NEW"),
      (6L, "t", "also new")).toDF("doc_id", "source", "text")
    val out = CurationOps.deltaDedupOn(docs, col("doc_id") <= 2L).collect()
    assert(out.toSeq === Seq(
      Row("s", 3L, 1L, 1L, 1L),   // 3 incoming: 1 existing-dup, 1 unique, 1 batch-dup
      Row("t", 1L, 0L, 1L, 0L)))
  }

  test("delta dedup reports sources with zero surviving rows") {
    val docs = Seq(
      (1L, "s", "a"), (2L, "s", "a"), (3L, "s", "a"))
      .toDF("doc_id", "source", "text")
    val out = CurationOps.deltaDedupOn(docs, col("doc_id") === 1L).collect()
    // both incoming rows collide with the existing text
    assert(out.toSeq === Seq(Row("s", 2L, 2L, 0L, 0L)))
  }

  test("term scrub masks whole words only") {
    val docs = Seq(
      (1L, "the table has a value"),   // 2 hits
      (2L, "tables are valuable"),     // substrings only → clean
      (3L, "key key key"),             // repeated term → 3 hits
      (4L, "no denied words here")).toDF("doc_id", "text")
    val out = CurationOps.termScrubOn(docs)
      .select("doc_id", "n_masked", "clean").collect()
    assert(out.toSeq === Seq(
      Row(1L, 2, false), Row(2L, 0, true), Row(3L, 3, false),
      Row(4L, 0, true)))
  }

  test("term scrub length accounting matches the replacement") {
    val docs = Seq((1L, "a value b")).toDF("doc_id", "text")
    val Row(before: Int, after: Int) = CurationOps.termScrubOn(docs)
      .select("len_before", "len_after").head()
    // "value"(5) → "[MASKED]"(8): +3 chars
    assert(before === 9 && after === 12)
  }

  test("corpus diff classifies added/removed/modified/unchanged") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = CurationOps.corpusDiffOn(v1, v2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("added" -> 1L, "removed" -> 1L,
      "modified" -> 1L, "unchanged" -> 1L))
  }

  test("corpus diff: identical snapshots are all unchanged") {
    val v = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val out = CurationOps.corpusDiffOn(v, v).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("unchanged" -> 2L))
  }

  test("curation funnel: stages shrink monotonically and agree with q36") {
    val docs = Tables.t(spark, sfDir, "documents")
    val out = CurationOps.curationFunnelOn(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val order = Seq("0_raw", "1_dedup", "2_quality",
      "3_decontaminated", "4_sampled")
    assert(out.keySet === order.toSet)
    for (Seq(a, b) <- order.sliding(2)) {
      assert(out(b)._1 <= out(a)._1, s"$b docs must not exceed $a")
      assert(out(b)._2 <= out(a)._2, s"$b tokens must not exceed $a")
    }
    assert(out("4_sampled")._1 > 0, "the funnel must not drain completely")
    // stage 1 = q36's distinct-normalized count on the same corpus
    val nDistinct = graft.ops.DedupOps.exactDedupOn(docs)
      .head().getAs[Long]("n_distinct")
    assert(out("1_dedup")._1 === nDistinct)
  }

  test("crawl funnel one-pass report == staged report on the same inputs " +
      "(incl. refetch dups, eval overlap, null text)") {
    // a fixture that exercises every gate: near-dup shingles, an exact
    // corpus dup, an eval-split overlap, a PII doc, a null-text doc and a
    // doc too short to shingle
    val incoming = Seq(
      (100L, "web", "the quick brown fox jumps over the lazy dog again " +
        "and again with plenty of distinct tokens here"),
      (101L, "web", "the quick brown fox jumps over the lazy dog again " +
        "and again with plenty of distinct tokens here"), // intra-crawl dup
      (102L, "wiki", "an entirely novel document about spectral graph " +
        "theory eigenvalues and expander mixing lemmas"),
      (103L, "wiki", "contact me at alice@example.com for the dataset " +
        "and further correspondence about licensing terms"),
      (104L, "web", "already indexed content that the reference corpus " +
        "holds verbatim in its fingerprint store today"),
      (105L, "cc", "short doc"),
      (106L, "cc", null: String),
      (107L, "web", "held out benchmark prose that must never ship as " +
        "training data from any crawl whatsoever period")
    ).toDF("doc_id", "source", "text")
    val corpus = Seq(
      "already indexed content that the reference corpus holds verbatim " +
        "in its fingerprint store today",
      "some other indexed page about unrelated matters entirely"
    ).toDF("text").select(graft.ops.DedupOps.normText.as("norm")).distinct()
    val refKeys = SpanOps.distinctShingleKeys(
      Seq((1L, "the quick brown fox jumps over the lazy dog today"))
        .toDF("doc_id", "text"), CurationOps.FunnelShingleK)
    val evalNorms = Seq(
      "held out benchmark prose that must never ship as training data " +
        "from any crawl whatsoever period")
      .toDF("text").select(graft.ops.DedupOps.normText.as("norm")).distinct()
    val staged = CurationOps.crawlFunnelReport(CurationOps.crawlFunnelStages(
      incoming, corpus, refKeys, evalNorms)).collect().map(_.toSeq).toSeq
    val onePass = CurationOps.crawlFunnelOnePass(
      incoming, corpus, refKeys, evalNorms).collect().map(_.toSeq).toSeq
    assert(onePass === staged,
      s"one-pass funnel report drifted from the staged core:\n" +
        s"one-pass: $onePass\nstaged:   $staged")
    // and the fixture actually exercised attrition: some doc fell at
    // every gate except arrival
    val byStage = staged.groupBy(_.head).map { case (k, rows) =>
      k -> rows.map(_(2).asInstanceOf[Long]).sum }
    assert(byStage("0_arrived") > byStage("5_released"),
      s"fixture must attrit through the funnel: $byStage")
  }

  test("fingerprint store: write, probe, append, re-probe") {
    val store = tmpDir("fp_store") + "/store"
    val corpus = Seq((1L, "Known Doc one"), (2L, "known doc two"))
      .toDF("doc_id", "text")
    CurationOps.writeFingerprintStore(corpus, store)
    // probe: normalized corpus dup rejected, fresh admitted
    val batch1 = Seq((10L, "KNOWN  doc one"), (11L, "new doc"))
      .toDF("doc_id", "text")
    val admitted1 = CurationOps.freshAgainstStore(batch1, store)
    assert(admitted1.select("doc_id").collect().map(_.getLong(0)).toSeq
      === Seq(11L))
    // fold the admission in; the same text must now be rejected
    CurationOps.appendToFingerprintStore(admitted1, store)
    val batch2 = Seq((20L, "New Doc"), (21L, "still newer"))
      .toDF("doc_id", "text")
    val admitted2 = CurationOps.freshAgainstStore(batch2, store)
    assert(admitted2.select("doc_id").collect().map(_.getLong(0)).toSeq
      === Seq(21L))
    // replaying an append keeps probes correct (append-only contract)
    CurationOps.appendToFingerprintStore(admitted1, store)
    assert(CurationOps.freshAgainstStore(batch1, store).count() === 0)
    // compaction re-contracts the replayed duplicates via staging+swap —
    // the live dir is never the direct overwrite target, and no staging
    // residue survives
    CurationOps.compactFingerprintStore(spark, store)
    val rows = spark.read.parquet(store).select("norm").collect()
      .map(_.getString(0))
    assert(rows.length === rows.distinct.length && rows.length === 3,
      s"compacted store must hold the 3 distinct norms once: ${rows.toSeq}")
    assert(CurationOps.freshAgainstStore(batch1, store).count() === 0)
    assert(!new java.io.File(store + ".merging").exists)
    assert(!new java.io.File(store + ".old").exists)
  }

  test("analyzeCorpus refreshes fingerprints and dispatch stats under one " +
      "root, and the persisted stats drive the gates") {
    val root = tmpDir("analyze_root")
    val corpus = Seq((1L, "dup text"), (2L, "dup text"), (3L, "dup text"),
      (4L, "unique one"), (5L, "unique two"))
      .toDF("doc_id", "text")
    val st = CurationOps.analyzeCorpus(corpus, root)
    // floor = C(3,2) over raw text; dupFraction = 1 - 3/5
    assert(st === graft.ops.CorpusStats(5, 3, 3))
    // both artifacts landed and agree with the returned value
    assert(graft.ops.CorpusStats.read(spark, s"$root/corpus_stats")
      === Some(st))
    assert(CurationOps.freshAgainstStore(
      Seq((9L, "DUP  text"), (10L, "fresh")).toDF("doc_id", "text"),
      s"$root/fingerprints").select("doc_id").collect()
      .map(_.getLong(0)).toSeq === Seq(10L))
    // the persisted stats decide the gates identically to a live probe
    assert(graft.ops.DedupOps.pairFloorIfExceeds(corpus, 2L, Some(st))
      === graft.ops.DedupOps.pairFloorIfExceeds(corpus, 2L, None))
  }

  test("cardinality store: sketches answer exactly at small scale and " +
      "merge across crawls") {
    import spark.implicits._
    val path = tmpDir("hll-store")
    val corpus = Seq(
      (0L, "a b c a", "s1"), // s1 distinct: a b c = 3
      (1L, "x y", "s2")) // s2 distinct: x y = 2
      .toDF("doc_id", "text", "source")
    CurationOps.writeCardinalityStore(corpus, path)
    def est(): Map[String, Long] =
      CurationOps.cardinalityFromStore(spark, path).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // HLL is exact in sparse mode at these cardinalities
    assert(est() === Map("s1" -> 3L, "s2" -> 2L))
    // merge: s1 gains one new token (b d overlap-aware), s3 is brand new
    val batch = Seq((2L, "b d", "s1"), (3L, "p q r", "s3"))
      .toDF("doc_id", "text", "source")
    CurationOps.mergeIntoCardinalityStore(batch, path)
    assert(est() === Map("s1" -> 4L, "s2" -> 2L, "s3" -> 3L))
    // the merge publishes via staging + atomic swap (a crash must never
    // leave the store deleted-but-unwritten) and cleans up after itself
    assert(!new java.io.File(path + ".merging").exists,
      "staging dir must be swapped away")
    assert(!new java.io.File(path + ".old").exists,
      "parked old store must be cleaned up")
  }

  test("full ANALYZE: one root feeds every incremental consumer without " +
      "re-reading the corpus") {
    import spark.implicits._
    val root = tmpDir("analyze-all")
    val corpus = Seq(
      (0L, "alpha beta gamma delta", "s1"),
      (1L, "one two three four five", "s2"))
      .toDF("doc_id", "text", "source")
    val stats = CurationOps.analyzeCorpusStores(corpus, root, k = 3)
    assert(stats === graft.ops.CorpusStats(2, 2, 0))
    // every artifact exists and its consumer answers from the store alone
    assert(CurationOps.freshAgainstStore(
      Seq((9L, "alpha beta gamma delta", "s9")).toDF("doc_id", "text", "source"),
      s"$root/fingerprints").isEmpty, "known doc must not be fresh")
    assert(SpanOps.dupSpansAgainstStore(
      Seq((9L, "one two three tail")).toDF("doc_id", "text"),
      s"$root/shingles", 3).count() === 1L, "shared span must be flagged")
    val scored = graft.streaming.NoveltyTriagePipeline.scoredAgainstStore(
      Seq((9L, "one two three tail")).toDF("doc_id", "text"), s"$root/bloom")
    assert(scored.select("n_novel").head().getLong(0) === 1L,
      "one of the two shingles is novel (k comes from the store row)")
    assert(CurationOps.cardinalityFromStore(spark, s"$root/cardinality")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("s1" -> 4L, "s2" -> 5L))
    assert(TextOps.sourceDriftFromStore(spark, s"$root/token_counts")
      .collect().map(_.toSeq).toSeq
      === TextOps.sourceDriftOn(corpus).collect().map(_.toSeq).toSeq)
    assert(graft.ops.SearchOps.lmPerplexityFromStore(corpus, s"$root/bigrams")
      .collect().forall(_.getAs[Long]("n_oov") == 0L))
    // winnow store: an indexed doc's replay matches itself through the
    // fingerprint index alone
    assert(TextOps.matchesAgainstStore(
      Seq((9L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      s"$root/winnow", maxDf = 5, minShared = 1).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id")))
      .toSet === Set((9L, 0L)), "indexed doc must match via the store")
    // phash store: an exact payload copy screens against the index alone
    assert(graft.ops.MultimodalOps.phashPairsAgainstStore(
      Seq((9L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      s"$root/phash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .contains((9L, 0L, 0)), "payload copy must hit its indexed original")
    assert(graft.ops.CorpusStats.read(spark, s"$root/corpus_stats")
      === Some(stats))
  }

  test("temperature mix: alpha flattens shares, alpha = 1 is the identity") {
    import spark.implicits._
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    // A: 8 tokens, B: 2 tokens — natural shares 0.8 / 0.2
    val docs = Seq(
      (0L, "a b c d", "A"), (1L, "e f g h", "A"), (2L, "x y", "B"))
      .toDF("doc_id", "text", "source")
    // token sizes read through Tables.sizeOrNull: a null-text doc must
    // not subtract a legacy -1 from its source's token sum
    val key = "spark.sql.legacy.sizeOfNull"
    spark.conf.set(key, "true")
    try {
      val withNull = docs.unionByName(Seq(
        (3L, null.asInstanceOf[String], "B")).toDF("doc_id", "text", "source"))
      val mixes = CurationOps.temperatureMixOn(withNull, alpha = 0.5)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("n_tokens")).toMap
      assert(mixes("B") === 2L, s"legacy -1 leaked into B's sum: $mixes")
    } finally spark.conf.unset(key)
    def r6(x: Double) = BigDecimal(x).setScale(6, HALF_UP).toDouble
    val m = CurationOps.temperatureMixOn(docs, alpha = 0.5).collect()
      .map(r => r.getString(0) -> r).toMap
    val wA = r6(math.pow(8, 0.5))
    val wB = r6(math.pow(2, 0.5))
    val wsum = (BigDecimal(wA) + BigDecimal(wB)).toDouble
    assert(m("A").getAs[Double]("temp_share") === r6(wA / wsum))
    assert(m("B").getAs[Double]("temp_share") === r6(wB / wsum))
    // factor/expected derive from the UNROUNDED shares (display rounding
    // must not quantize a tail source's factor to null/0)
    assert(m("B").getAs[Double]("sample_factor")
      === r6((wB / wsum) / (2.0 / 10.0)))
    assert(m("B").getAs[Double]("sample_factor") > 1.0,
      "alpha < 1 must upsample the small source")
    assert(m("A").getAs[Long]("expected_tokens")
      === math.round((wA / wsum) * 10.0))
    // alpha = 1: temperature shares equal natural shares exactly
    val id = CurationOps.temperatureMixOn(docs, alpha = 1.0).collect()
    assert(id.forall(_.getAs[Double]("sample_factor") === 1.0))
  }

  test("rebalance survives a fractional part that rounds to a whole copy " +
    "(f = 0.999 keeps the source, never drops it)") {
    import spark.implicits._
    val docs = (0L until 200L).map(id => (id, "srcA", "alpha beta gamma"))
      .toDF("doc_id", "source", "text")
    val out = CurationOps.corpusRebalanceOn(docs, Seq("srcA" -> 0.999))
      .collect()
    // 0.999 rounds to 100 cents = exactly one copy per doc — a
    // floor(f)-based split would compute 0 + (hash < 0) = 0 replicas
    // and silently drop the entire source
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_docs_kept") === 200L)
    assert(out.head.getAs[Long]("n_docs_out") === 200L)
    // and f = 1.999 yields ~2 copies, not 1
    val twice = CurationOps.corpusRebalanceOn(docs, Seq("srcA" -> 1.999))
      .collect().head
    assert(twice.getAs[Long]("n_docs_out") === 400L)
  }

  test("hash split routes nothing into a trailing zero-weight split") {
    import spark.implicits._
    val docs = (0L until 500L).map(id => (id, s"t $id"))
      .toDF("doc_id", "text")
    // cum weight reaches 1.0 BEFORE the final arm: naive %04x formatting
    // would emit "10000", which sorts before most digests and misroutes
    // ~half the corpus into the zero-weight split
    val got = CurationOps.withHashSplit(docs, "graft-split",
      Seq("train" -> 0.5, "valid" -> 0.5, "test" -> 0.0))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("test"), s"zero-weight split got rows: $got")
    assert(got.values.sum === 500L)
    assert(got("train") > 150L && got("valid") > 150L, s"skewed: $got")
  }

  test("training manifest: positions are an exact hash-order permutation, " +
    "shards are fixed-width, and reruns are identical") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m = CurationOps.trainingManifestOn(docs, shardSize = 16).collect()
    val n = docs.count()
    assert(m.length === n)
    // positions are exactly 1..n (the distributed rank is exact, no gaps)
    assert(m.map(_.getAs[Long]("pos")).sorted.toSeq === (1L to n).toSeq)
    // shard = (pos-1) / 16, every shard full except possibly the last
    val byShard = m.groupBy(_.getAs[Int]("shard"))
    assert(byShard.keySet === (0 until ((n.toInt + 15) / 16)).toSet)
    byShard.foreach { case (sh, rows) =>
      val want = if (sh == (n.toInt - 1) / 16 && n % 16 != 0) n % 16 else 16
      assert(rows.length === want, s"shard $sh width")
      rows.foreach(r => assert(
        (r.getAs[Long]("pos") - 1) / 16 === sh.toLong))
    }
    // hash order: pos agrees with the driver-side sort of the same key
    val want = m.map { r =>
      val id = r.getAs[Long]("doc_id")
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-order:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (h, id)
    }.sorted.map(_._2).toSeq
    assert(m.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("doc_id"))
      .toSeq === want)
    // deterministic across executions (fresh range boundaries, same ranks)
    val again = CurationOps.trainingManifestOn(docs, shardSize = 16)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")))
    assert(again.toSet === m.map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"))).toSet)
    // hash order interleaves sources: no 16-doc shard drawn from the
    // ~uniform 10-source corpus should collapse to a single source
    byShard.filter(_._2.length == 16).foreach { case (sh, rows) =>
      assert(rows.map(_.getAs[String]("source")).distinct.length >= 2,
        s"shard $sh is single-source — hash interleaving broken")
    }
    // plan shape: the data path pays exactly its two range shuffles (the
    // rank decomposition's repartitionByRange + the presentation sort);
    // any single-partition exchange must be the ≤|partitions|-row offset
    // ladder, never the data (the single-task Window.orderBy this
    // operator exists to avoid)
    val plan = CurationOps.trainingManifestOn(docs, shardSize = 16)
      .queryExecution.executedPlan.toString
    assert("rangepartitioning".r.findAllIn(plan.toLowerCase).length <= 2,
      s"unexpected extra range shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      "the offset-ladder join must broadcast, not sort-merge")
  }

  test("dsir multi-space text: empty split tokens are not features, so " +
      "the raw face equals the store face on doubled-space corpora") {
    import graft.ops.TextOps
    // 'a  b' splits to [a, '', b]; the '' must not count as a token on
    // EITHER face (the r07 ADVICE divergence)
    val docs = Seq(
      (0L, "good  good", "en"), // doubled space
      (1L, "bad bad", "xx")
    ).toDF("doc_id", "text", "lang")
    val raw = CurationOps.dsirWeightsOn(docs, col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(raw.map(t => t._1 -> t._2).toMap === Map(0L -> 2L, 1L -> 2L),
      s"empty token leaked into n_tokens: $raw")
    val path = tmpDir("dsir-mspace") + "/token_counts"
    TextOps.writeTokenCountStore(
      docs.select(col("lang").as("source"), col("text")), path)
    val viaStore = CurationOps.dsirWeightsFromStore(docs, spark, path,
        col("source") === "en")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaStore === raw,
      "store ≡ raw must hold on multi-spaced text (same tokenizer)")
  }

  test("doremi partials law: ANY segmentation of the corpus into batches " +
      "yields identical cumulative weights (randomized)") {
    import graft.ops.{CurationOps, SearchOps}
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // fixed corpus, frozen LM; the property quantifies over the batch
    // assignment — the exact situation the mix governor lives in, where
    // micro-batch boundaries are arbitrary
    val corpus = Seq(
      (0L, "web", "a b a b a c"),
      (1L, "books", "a b a b"),
      (2L, "books", "a c a c"),
      (3L, "web", "a b a c"),
      (4L, "code", "a c"),
      (5L, "code", "b c b a")
    ).toDF("doc_id", "source", "text")
    val lm = tmpDir("doremi-law") + "/lm"
    SearchOps.writeBigramStore(corpus, lm)
    val oneShot = CurationOps.doremiFromStore(corpus, lm)
      .collect().map(_.toSeq).toSeq
    val assignGen = Gen.listOfN(6, Gen.choose(0, 2)) // each doc → batch 0..2
    val prop = Prop.forAll(assignGen) { assign =>
      val withBatch = corpus.withColumn("b",
        // deterministic per-doc batch label from the generated assignment
        org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.typedLit(assign.map(_.toLong)),
          col("doc_id").cast("int") + 1))
      val partials = (0 until 3).map { b =>
        CurationOps.doremiBatchPartials(
          withBatch.filter(col("b") === b.toLong).drop("b"), lm)
      }.reduce(_ unionByName _)
      CurationOps.doremiFromPartials(partials)
        .collect().map(_.toSeq).toSeq == oneShot
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8),
      prop)
    assert(res.passed, s"segmentation law failed: ${res.status}")
  }

  test("doremi from bigram store: store path equals the raw face on the " +
      "store's corpus, appends match the one-shot LM, fully-novel docs " +
      "drop from the rollup") {
    import graft.ops.SearchOps
    val batch1 = Seq(
      (0L, "a b a b a c", "web"),
      (1L, "a b a b", "books"),
      (2L, "a c a c", "books")
    ).toDF("doc_id", "text", "source")
    val batch2 = Seq(
      (3L, "a b a c", "web"),
      (4L, "a c", "code")
    ).toDF("doc_id", "text", "source")
    val corpus = batch1.union(batch2)
    val path = tmpDir("doremi-store") + "/bigrams"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    // store trained on batch1 ≡ raw over batch1 (zero OOV)
    SearchOps.writeBigramStore(batch1, path)
    assert(rows(CurationOps.doremiFromStore(batch1, path)) ===
      rows(CurationOps.doremiWeightsOn(batch1)),
      "store ≡ raw on the store's own corpus")
    // crawl 2 appends its counts; scoring the combined corpus from the
    // store ≡ the one-shot raw answer (sum-on-read LM freshness)
    SearchOps.appendToBigramStore(batch2, path)
    assert(rows(CurationOps.doremiFromStore(corpus, path)) ===
      rows(CurationOps.doremiWeightsOn(corpus)),
      "post-append store LM must equal the one-shot corpus LM")
    // a batch with one in-model doc and one fully-novel doc: the novel
    // doc (every bigram OOV) has no model evidence — its source is
    // absent, not scored as zero
    val probe = Seq(
      (8L, "a b", "web"),
      (9L, "z z z", "novel")
    ).toDF("doc_id", "text", "source")
    val scored = CurationOps.doremiFromStore(probe, path)
      .select("source").collect().map(_.getString(0)).toSeq
    assert(scored === Seq("web"), s"novel-doc handling: $scored")
  }
}
