package graft

/** The standing adversarial-fixture gate (round 10, VERDICT r09 item 1).
  *
  * Runs EVERY `SparkEntry.queries` entry over `AdversarialGen`'s malformed
  * corpus — null/empty/whitespace text, zero-norm/null/ragged/NaN
  * embeddings, null join keys, orphan FKs, duplicate primary keys, extreme
  * longs, NaN/Infinity doubles, malformed JSON — asserting each query
  * either completes (collect() succeeds) or fails loud under a contract
  * documented here in `failLoud`.
  *
  * Why this exists: the round-9 zero-norm cosine DIVIDE_BY_ZERO survived
  * eight adversarial review passes and two fully-green 132/132 oracle
  * catalogs because the driver's gate corpus contains no degenerate rows.
  * This gate makes that entire hazard class (ANSI-mode arithmetic on
  * malformed inputs) a permanent regression test across the whole catalog.
  *
  * The real-corpus oracle hashes are unaffected by construction — the
  * fixture lives in its own temp dir and no query here touches
  * /root/testdata.
  */
class AdversarialFixtureSpec extends SparkSpec {

  /** Documented fail-loud contracts: query name -> substring that must
    * appear in the failure (exception class name or message). A query
    * listed here is REQUIRED to throw on the malformed corpus — silently
    * succeeding would itself be a contract change worth seeing.
    */
  private val failLoud: Map[String, String] = Map(
    // q97 packs (bucket, doc_id) into ONE long (bucket·2³¹ + doc_id) so a
    // single min-k sketch aggregate carries both; the pack is only
    // injective for doc_id ∈ [0, 2³¹). An out-of-range id MUST fail loud
    // with the operator's own EXECUTABLE range guard (raise_error — ANSI
    // overflow alone misses negative ids, which pack without overflowing
    // into keys that unpack to WRONG doc_ids) rather than sample from a
    // silently-corrupted key space: a sampler that drops or misattributes
    // rows biases the sample, which is worse than stopping.
    "q97_group_sample" -> "groupSampleOn: doc_id outside [0, 2^31)",
    // the fixture's 9999-12-31 sentinel event makes the gap-fill span
    // ~4.2 billion minutes — the dense-spine contract refuses it with
    // the named span guard (the alternative is an opaque array-size
    // error or an OOM from a multi-billion-row sequence explode); q75
    // builds on the same spine
    "q74_minutely_gapfill" -> "gapfill: minute span",
    "q75_anomaly_zscore" -> "gapfill: minute span")

  /** The EMPTY-corpus arm's fail-loud contracts — "day zero of a crawl":
    * a query whose result is a TRAINED ARTIFACT has nothing to train on
    * and must say so, not fabricate an answer.
    */
  private val failLoudEmpty: Map[String, String] = {
    // the PQ family derives its codebook FROM the corpus: with zero
    // vectors there is nothing to train, and the operators raise the
    // named, actionable error (train separately, use the *With form)
    // rather than fabricating a codebook
    val noCodebook = "PQ codebook: empty embedding table"
    Map(
      "q123_ann_pq" -> noCodebook,
      "q128_pq_distortion" -> noCodebook,
      "q138_pq_recall" -> noCodebook,
      "q95_cluster_purity" -> noCodebook,
      // the trained face trains on VALID vectors only, so its empty-
      // corpus error is its own (the label-codebook message would point
      // at the wrong fix)
      "q140_ann_pq_trained" ->
        "pqTrainedCodebook: no valid full-dim vectors",
      "q142_pq_recall_trained" ->
        "pqTrainedCodebook: no valid full-dim vectors",
      // the trained-IVF faces train kmeansCentroids on the same valid
      // projection — zero vectors means zero codebook, said loud
      "q143_ann_ivf_trained" -> "kmeansCentroids: no vectors to train on",
      "q144_ivf_recall_trained" -> "kmeansCentroids: no vectors to train on",
      // the IVF-PQ faces train their coarse quantizer first — same
      // day-zero error
      "q151_ann_ivfpq" -> "kmeansCentroids: no vectors to train on",
      "q153_ivfpq_recall" -> "kmeansCentroids: no vectors to train on",
      "q154_ivfpq_refined" -> "kmeansCentroids: no vectors to train on")
  }

  private lazy val fixtureDir: String = {
    val dir = tmpDir("graft-adversarial-fixture")
    AdversarialGen.writeAll(spark, dir)
    dir
  }

  private lazy val emptyDir: String = {
    val dir = tmpDir("graft-empty-fixture")
    AdversarialGen.writeEmpty(spark, dir)
    dir
  }

  private def check(name: String, fn: (org.apache.spark.sql.SparkSession,
      String) => org.apache.spark.sql.DataFrame, dir: String,
      contract: Option[String]): Unit = contract match {
    case None =>
      // must complete end-to-end; row count is unconstrained (many
      // queries legitimately return 0 rows on a degenerate corpus)
      val rows = fn(spark, dir).collect()
      assert(rows != null)
    case Some(expected) =>
      val e = intercept[Throwable] { fn(spark, dir).collect() }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      val texts = chain(e).map(t => t.getClass.getName + ": " + t.getMessage)
      assert(texts.exists(_.contains(expected)),
        s"$name failed (as contracted) but not with the documented " +
          s"condition '$expected'; got: ${texts.mkString(" | ")}")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"adversarial fixture: $name") {
      check(name, fn, fixtureDir, failLoud.get(name))
    }
    test(s"empty corpus: $name") {
      check(name, fn, emptyDir, failLoudEmpty.get(name))
    }
  }
}
