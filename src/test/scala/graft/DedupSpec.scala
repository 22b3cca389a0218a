package graft

import graft.ops.{DedupOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** Planted-duplicate tests for the approximate dedup / similarity paths
  * (the exact paths are covered by the DuckDB oracle gate).
  */
class DedupSpec extends SparkSpec {

  /** Write a documents.parquet with planted near-duplicates into a temp dir
    * shaped like the driver's testdata, so the ops run unchanged on it.
    */
  private lazy val plantedDocsDir: String = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the deep green forest near the old stone bridge today"
    val nearDup = base.replace("today", "tonight") // 1 token differs
    val other = "completely different words about spark catalyst optimizer " +
      "plans shuffles partitions and codegen stages in the query engine"
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, nearDup, "en", "src0", nearDup.length.toLong),
      (2L, other, "en", "src1", other.length.toLong),
      (3L, base, "en", "src2", base.length.toLong), // exact dup of 0
      (4L, "tiny doc here", "en", "src3", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("planted-docs")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("minhash LSH finds planted exact and near duplicates, skips distinct") {
    val pairs = DedupOps.minhashLshPairs(spark, plantedDocsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)), "exact dup must be found")
    assert(pairs.contains((0L, 1L)), "near dup must be found")
    assert(pairs.contains((1L, 3L)), "near dup must be found")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      "distinct doc must not pair")
  }

  test("simhash finds planted exact duplicates and emits only valid pairs") {
    // SimHash@64-bit with Hamming ≤ 3 targets exact/very-near duplicates:
    // over small distinct-token sets a single token swap legitimately flips
    // more than 3 bits (vote margins are O(√n_tokens)), so the 1-token
    // near-dup is MinHash's job (asserted above), not SimHash's.
    val out = DedupOps.simhashPairs(spark, plantedDocsDir).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)), "exact dup must be hamming 0")
    assert(out.forall(_.getAs[Int]("hamming") <= 3))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      "distinct doc must not pair")
  }

  test("dedup clusters label every planted near-dup with the min doc_id") {
    val reps = DedupOps.dedupClusters(spark, plantedDocsDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps === Map(0L -> 0L, 1L -> 0L, 3L -> 0L),
      s"docs 0/1/3 form one component rooted at 0, got $reps")
  }

  test("minhash LSH output is a subset of exact shingle-jaccard >= 0.8") {
    // On real testdata: every LSH-emitted pair must be verified-correct
    // (precision 1.0 by construction — candidates are exactly re-checked).
    val lsh = DedupOps.minhashLshPairs(spark, sfDir)
    assert(lsh.filter(col("jaccard") < 0.8).count() === 0)
  }

  test("lsh ANN retrieves a planted near-duplicate vector") {
    import spark.implicits._
    val dim = SimilarityOps.Dim
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val q = vec()
    val near = q.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    val rows = (0L, q, 0) +: (1L, near, 0) +:
      (2L until 200L).map(i => (i, vec(), (i % 3).toInt))
    val dir = tmpDir("planted-emb")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val ann = SimilarityOps.annLsh(spark, dir).collect()
    assert(ann.nonEmpty && ann.head.getLong(0) === 1L,
      s"planted neighbor must rank first, got ${ann.map(_.getLong(0)).toSeq}")
    val brute = SimilarityOps.annTopK(spark, dir).collect()
    assert(brute.head.getLong(0) === 1L)
    assert(brute.head.getDouble(2) > 0.99)

    // IVF: the planted near-dup shares the query's label, so its cell is
    // the closest centroid to the query and must be probed.
    val ivf = SimilarityOps.annIvf(spark, dir).collect()
    assert(ivf.nonEmpty && ivf.head.getLong(0) === 1L,
      s"IVF must retrieve the planted neighbor, got ${ivf.map(_.getLong(0)).toSeq}")

    // all-NN dedup table: the planted pair must be mutual nearest neighbors
    // with cosine > 0.99; every vector gets exactly one row.
    val nn = SimilarityOps.nnDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(nn(0L)._1 === 1L && nn(1L)._1 === 0L)
    assert(nn(0L)._2 > 0.99)
    assert(nn.size === 200)
  }
}
