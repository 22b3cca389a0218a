package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared Hamming-space banding — the one place the 4×16-bit blocking
  * discipline lives, serving both the SimHash text miner (q39,
  * `DedupOps.simhashPairsOn`) and the perceptual-hash media miners
  * (`MultimodalOps.mediaPhashPairsOn` / `phashPairsAgainstStore`).
  *
  * Pigeonhole contract: any pair within Hamming distance [[MaxHamming]]
  * differs in at most 3 bits, which can touch at most 3 of the 4 chunks —
  * so at least one exact 16-bit chunk is shared and the banded join loses
  * nothing versus the full cross product. Candidates are verified with
  * `bit_count(xor) ≤ maxHamming` INSIDE the join condition, and each pair
  * is emitted from its FIRST shared chunk only, so no distinct() shuffle
  * over candidates exists anywhere downstream.
  */
private[graft] object HammingBands {

  val Chunks = 4
  val ChunkBits = 16
  val MaxHamming = 3

  /** Explode a (…, `hashCol`) frame into one row per 16-bit chunk:
    * adds (chunk_idx, chunk).
    */
  def chunked(df: DataFrame, idCol: String, hashCol: String): DataFrame =
    df.select(col(idCol), col(hashCol),
      posexplode(array((0 until Chunks).map(j =>
        shiftrightunsigned(col(hashCol), j * ChunkBits)
          .bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("chunk_idx", "chunk")))

  private def chunkOf(h: Column, j: Column): Column =
    call_function("shiftrightunsigned", h, j * lit(ChunkBits))
      .bitwiseAND(lit(0xFFFFL))

  /** True iff no EARLIER chunk also matches — the in-join dedup that
    * makes each candidate pair appear exactly once.
    */
  private def firstSharedChunk(hashCol: String): Column =
    when(col("x.chunk_idx") === 0, lit(true))
      .otherwise(!exists(sequence(lit(0), col("x.chunk_idx") - 1), i =>
        chunkOf(col(s"x.$hashCol"), i) === chunkOf(col(s"y.$hashCol"), i)))

  /** Banded verify join between two [[chunked]] frames (aliased x/y).
    * `extraCond` carries the caller's pair discipline (e.g. `x.id < y.id`
    * for a self-join). Callers select/alias their own output columns from
    * the x./y. namespaces.
    */
  def pairs(x: DataFrame, y: DataFrame, hashCol: String, maxHamming: Int,
      extraCond: Column): DataFrame = {
    require(maxHamming <= MaxHamming,
      s"Hamming banding: $Chunks×$ChunkBits-bit blocking guarantees " +
        s"completeness only to Hamming $MaxHamming (pigeonhole); " +
        s"got $maxHamming")
    x.as("x").join(y.as("y"),
      col("x.chunk_idx") === col("y.chunk_idx") &&
        col("x.chunk") === col("y.chunk") &&
        bit_count(col(s"x.$hashCol").bitwiseXOR(col(s"y.$hashCol")))
          <= maxHamming &&
        extraCond && firstSharedChunk(hashCol))
  }
}
