package graft

import graft.ops.SpanOps

/** Substring-level dedup (q102/q103): span detection boundaries (overlap
  * merge, adjacency merge, self-repeats), the masked rewrite's keep/drop
  * contract, and a brute-force reference cross-check on a randomized
  * corpus.
  */
class SpanSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "web") }
      .toDF("doc_id", "text", "lang", "source")

  private def spans(df: org.apache.spark.sql.DataFrame, k: Int) =
    SpanOps.dupSpansOn(df, k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))

  test("cross-doc shared passage yields one span per side") {
    val df = corpus(1L -> "a b c d e f", 2L -> "x y a b c z")
    assert(spans(df, 3).toSeq ===
      Seq((1L, 0, 2, 3), (2L, 2, 4, 3)))
  }

  test("self-repeated passage is flagged; non-touching repeats stay " +
      "separate spans") {
    val df = corpus(3L -> "p q r s p q r")
    // "p q r" occurs at 0 and 4: intervals [0,2] and [4,6] have a gap at 3
    assert(spans(df, 3).toSeq === Seq((3L, 0, 2, 3), (3L, 4, 6, 3)))
  }

  test("overlapping and adjacent duplicated shingles merge into maximal " +
      "spans") {
    // d6: dup occurrences at pos 0 (shared with d7) and pos 3 (shared
    // with d8) — intervals [0,2] and [3,5] touch, so one span [0,5]
    val df = corpus(
      6L -> "a1 a2 a3 b1 b2 b3",
      7L -> "a1 a2 a3 c",
      8L -> "q b1 b2 b3")
    val got = spans(df, 3)
    assert(got.filter(_._1 == 6L).toSeq === Seq((6L, 0, 5, 6)))
    assert(got.filter(_._1 == 7L).toSeq === Seq((7L, 0, 2, 3)))
    assert(got.filter(_._1 == 8L).toSeq === Seq((8L, 1, 3, 3)))
  }

  test("docs shorter than K and all-unique docs yield no spans") {
    val df = corpus(9L -> "a b", 10L -> "u v w x y z")
    assert(spans(df, 3).isEmpty)
  }

  test("masked rewrite keeps uncovered words in order, passes clean docs " +
      "verbatim, and empties fully-covered docs") {
    val df = corpus(
      1L -> "a b c d e f",   // span [0,2] → keep "d e f"
      2L -> "x y a b c z",   // span [2,4] → keep "x y z"
      5L -> "u v w q r s",   // no dups → verbatim
      11L -> "a b c",        // fully covered (= d1 prefix) → empty
      12L -> "a b c")
    val got = SpanOps.substrDedupOn(df, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4))).toSeq
    assert(got === Seq(
      (1L, 6, 3, 3, "d e f"),
      (2L, 6, 3, 3, "x y z"),
      (5L, 6, 6, 0, "u v w q r s"),
      (11L, 3, 0, 3, ""),
      (12L, 3, 0, 3, "")))
  }

  test("bloom store round-trips and an empty corpus persists the " +
      "all-zero everything-is-novel filter") {
    val path = tmpDir("bloom-store") + "/bloom"
    val df = corpus(1L -> "a b c d", 2L -> "p q r")
    SpanOps.writeBloomStore(df, path, k = 3, nBits = 1 << 12)
    val (bytes, k) = SpanOps.readBloomStore(spark, path)
    assert(k === 3)
    // canonical layout: 8-byte header + nBits/8 payload
    assert(bytes.length === 8 + (1 << 12) / 8)
    assert(bytes.drop(8).exists(_ != 0), "indexed shingles must set bits")
    // empty-corpus store: no >=k-token doc → all-zero payload with a
    // VALID header (a probe must return false, not throw)
    val emptyPath = tmpDir("bloom-store-empty") + "/bloom"
    SpanOps.writeBloomStore(corpus(9L -> "xy"), emptyPath, k = 3,
      nBits = 1 << 12)
    val (zeroes, _) = SpanOps.readBloomStore(spark, emptyPath)
    assert(zeroes.length === bytes.length && zeroes.drop(8).forall(_ == 0))
    assert(!graft.functions.Bloom.mightContain(zeroes, 42L))
  }

  test("noveltyAgainstStore is duplicate-safe across appended segments") {
    val path = tmpDir("shingle-append") + "/shingles"
    SpanOps.writeShingleStore(corpus(1L -> "a b c d"), path, 3)
    // append re-indexes the "a b c" key → duplicate rows across segments
    SpanOps.appendToShingleStore(corpus(2L -> "a b c z"), path, 3)
    val r = SpanOps.noveltyAgainstStore(corpus(9L -> "a b c q"), path, 3)
      .collect().head
    // probe doc: "a b c" (indexed, twice in the store) + "b c q" (novel);
    // a non-distinct reference side would multiply the join and report 3
    assert((r.getAs[Long]("n_distinct_shingles"), r.getAs[Long]("n_novel"))
      === ((2L, 1L)))
  }

  test("q103 span budget gate fails fast in the rewrite-everything " +
      "regime, default stays gate-free") {
    val df = corpus(
      1L -> "a b c d e f",
      2L -> "a b c d e f") // every span duplicated
    val e = intercept[IllegalStateException](
      SpanOps.substrDedupOn(df, 3, spanBudget = Some(1L)))
    assert(e.getMessage.contains("q102"), "must point at detection-only")
    // a budget the corpus fits under, and the default no-budget path,
    // both rewrite normally
    assert(SpanOps.substrDedupOn(df, 3, spanBudget = Some(100L)).count() === 2)
    assert(SpanOps.substrDedupOn(df, 3).count() === 2)
  }

  test("randomized corpus matches a brute-force reference") {
    val k = 4
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("t0", "t1", "t2", "t3", "t4")
    val texts = (0L until 60L).map { id =>
      id -> Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val expected = bruteSpans(texts.toMap, k)
    val got = spans(corpus(texts: _*), k).toSeq
      .map { case (d, s, e, _) => (d, s, e) }.sorted
    assert(got === expected)
  }

  test("against-store spans flag only cross-corpus duplication: " +
      "within-batch repeats stay invisible") {
    val reference = corpus(
      1L -> "r1 r2 r3 r4",
      2L -> "x y z")
    val incoming = corpus(
      10L -> "a b r1 r2 r3 q",      // shares "r1 r2 r3" with ref doc 1
      11L -> "m n o p m n o p",     // internal repeat only — NOT flagged
      12L -> "m n o p m n o p")     // cross-INCOMING dup only — NOT flagged
    val got = SpanOps.dupSpansAgainstOn(incoming, reference, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got === Seq((10L, 2, 4)))
  }

  test("the persisted shingle store answers identically to the raw " +
      "reference corpus") {
    val reference = corpus((0L until 30L).flatMap(i =>
      Seq(i -> s"w${i} w${i + 1} w${i + 2} w${i + 3} tail")): _*)
    val incoming = corpus(100L -> "w5 w6 w7 w8 fresh stuff",
      101L -> "nothing shared here at all")
    val store = tmpDir("shingle-store")
    SpanOps.writeShingleStore(reference, store, 3)
    val direct = SpanOps.dupSpansAgainstOn(incoming, reference, 3).collect()
    val viaStore = SpanOps.dupSpansAgainstStore(incoming, store, 3).collect()
    assert(direct.toSeq === viaStore.toSeq)
    assert(direct.nonEmpty)
    // the store records its shingle width: probing or appending with a
    // different k is a silent nothing-matches — it must fail loudly
    val e = intercept[IllegalArgumentException] {
      SpanOps.dupSpansAgainstStore(incoming, store, 8)
    }
    assert(e.getMessage.contains("k=3") && e.getMessage.contains("k=8"))
    intercept[IllegalArgumentException] {
      SpanOps.appendToShingleStore(incoming, store, 5)
    }
    intercept[IllegalArgumentException] {
      SpanOps.noveltyAgainstStore(incoming, store, 4)
    }
    // the sidecar survives compaction; a legacy store WITHOUT the sidecar
    // (pre-metadata layout) still probes on caller-supplied k
    SpanOps.compactShingleStore(spark, store)
    assert(SpanOps.dupSpansAgainstStore(incoming, store, 3).collect()
      .toSeq === direct.toSeq)
    val metaDir = new java.io.File(store + "/_graft_meta")
    assert(metaDir.exists, "compaction must carry the k sidecar across")
    metaDir.listFiles().foreach(_.delete()); metaDir.delete()
    assert(SpanOps.dupSpansAgainstStore(incoming, store, 3).collect()
      .toSeq === direct.toSeq, "legacy store must stay probeable")
  }

  test("novelty against a reference corpus: copies 0, fresh 1, mixed " +
      "in between; store equals direct") {
    // k = 3 shingles; reference owns "a b c d" (shingles abc, bcd)
    val reference = corpus(0L -> "a b c d")
    // 10: exact copy -> 0.0; 11: disjoint -> 1.0;
    // 12: "a b c x" -> shingles abc (seen), bcx (new) -> 0.5;
    // 13: two tokens -> below k, no row
    val incoming = corpus(10L -> "a b c d", 11L -> "p q r s",
      12L -> "a b c x", 13L -> "a b")
    val got = SpanOps.noveltyAgainstOn(incoming, reference, 3).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_distinct_shingles"),
        r.getAs[Long]("n_novel"), r.getAs[Double]("novelty_ratio"))).toSeq
    assert(got === Seq((10L, 2L, 0L, 0.0), (11L, 2L, 2L, 1.0),
      (12L, 2L, 1L, 0.5)))
    val store = tmpDir("novelty-store")
    SpanOps.writeShingleStore(reference, store, 3)
    val viaStore = SpanOps.noveltyAgainstStore(incoming, store, 3).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_distinct_shingles"),
        r.getAs[Long]("n_novel"), r.getAs[Double]("novelty_ratio"))).toSeq
    assert(viaStore === got)
  }

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

  test("plan shapes hold the documented shuffle budget") {
    val df = corpus(randomTexts(3L, 20): _*)
    // q102: shingle-key window + doc-key window + output sort — nothing else
    assert(exchanges(SpanOps.dupSpansOn(df)) <= 3)
    // q106: chunking is row-local; chunk-key agg + single-row final agg
    assert(exchanges(SpanOps.chunkDedupOn(df)) <= 2)
    // q103: q102's two + the one doc-keyed join (each side once) + sort
    assert(exchanges(SpanOps.substrDedupOn(df)) <= 6)
  }

  // ---- content-defined chunking (q106) -------------------------------

  private val P = 1000000007L
  private val B = 1000003L
  private val B2 = B * B % P
  private val B3 = B2 * B % P

  private def refBounds(toks: IndexedSeq[String]): Seq[Int] = {
    val wh = toks.map(_.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P))
    if (toks.length < SpanOps.CdcW) Seq(toks.length - 1)
    else ((SpanOps.CdcW - 1 until toks.length).filter { i =>
      (wh(i - 3) * B3 + wh(i - 2) * B2 + wh(i - 1) * B + wh(i)) % P %
        SpanOps.CdcD == 0
    } :+ (toks.length - 1)).distinct
  }

  private def refChunks(text: String): Seq[String] = {
    val toks = text.trim.split(" ").toIndexedSeq
    val bs = refBounds(toks)
    bs.zip(-1 +: bs.init).map { case (e, prev) =>
      toks.slice(prev + 1, e + 1).mkString(" ")
    }
  }

  private def randomTexts(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("t0", "t1", "t2", "t3", "t4", "tab", "scan")
    (0L until n.toLong).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(60))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
  }

  test("cdc chunks tile every doc exactly: concatenation rebuilds the " +
      "text and token counts add up") {
    val texts = randomTexts(7L, 50)
    val got = SpanOps.cdcChunksOn(corpus(texts: _*))
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getString(4)))
      .groupBy(_._1)
    for ((id, t) <- texts) {
      val chunks = got(id).toSeq
      assert(chunks.map(_._3).mkString(" ") === t.trim, s"doc $id")
      assert(chunks.map(_._2).sum === t.trim.split(" ").length, s"doc $id")
      assert(chunks.map(_._3) === refChunks(t), s"doc $id vs reference")
    }
  }

  test("chunk dedup stats match a brute-force reference") {
    val texts = randomTexts(11L, 80) ++
      Seq(900L -> "t0 t1 t2 t3 t0 t1 t2 t3", 901L -> "t0 t1 t2 t3 t0 t1 t2 t3")
    val all = texts.flatMap { case (_, t) => refChunks(t) }
    val groups = all.groupBy(identity).toSeq.map { case (c, os) =>
      (os.size.toLong, c.split(" ").length.toLong)
    }
    val (nChunks, nDistinct) = (all.size.toLong, groups.size.toLong)
    val total = groups.map { case (cnt, tok) => cnt * tok }.sum
    val saved = groups.map { case (cnt, tok) => (cnt - 1) * tok }.sum
    val r = SpanOps.chunkDedupOn(corpus(texts: _*)).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((nChunks, nDistinct, nChunks - nDistinct,
      total, saved)))
    assert(math.abs(r.getDouble(5) - saved * 100.0 / total) < 1e-4)
  }

  test("cdc boundaries re-synchronize after an insertion (the property " +
      "fixed-stride chunking lacks)") {
    val tail = randomTexts(13L, 1).head._2 + " " +
      randomTexts(17L, 1).head._2  // ~60+ shared trailing words
    val a = "prefix0 " + tail
    val b = "prefix0 prefix1 prefix2 " + tail  // shifted by two words
    val chunksA = refChunks(a).toSet
    val chunksB = refChunks(b).toSet
    val shared = chunksA intersect chunksB
    assert(shared.nonEmpty,
      "content-defined boundaries must re-align on the shared tail")
    // and the engine agrees with the reference on both docs
    val got = SpanOps.cdcChunksOn(corpus(50L -> a, 51L -> b))
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getString(4))).groupBy(_._1)
    assert(got(50L).map(_._2).toSeq === refChunks(a))
    assert(got(51L).map(_._2).toSeq === refChunks(b))
  }

  /** Reference: count shingles, flag ≥2, merge intervals sequentially. */
  private def bruteSpans(texts: Map[Long, String],
      k: Int): Seq[(Long, Int, Int)] = {
    val toks = texts.map { case (id, t) => id -> t.trim.split(" ").toSeq }
    val occ = for {
      (id, ws) <- toks.toSeq; p <- 0 to ws.length - k
    } yield (id, p, ws.slice(p, p + k).mkString(" "))
    val counts = occ.groupBy(_._3).map { case (s, os) => s -> os.size }
    val dup = occ.filter(o => counts(o._3) >= 2)
    dup.groupBy(_._1).toSeq.flatMap { case (id, os) =>
      val sorted = os.map(_._2).sorted
      val merged = sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p <= e + 1 =>
          (s, math.max(e, p + k - 1)) :: rest
        case (acc, p) => (p, p + k - 1) :: acc
      }
      merged.reverse.map { case (s, e) => (id, s, e) }
    }.sorted
  }
}
