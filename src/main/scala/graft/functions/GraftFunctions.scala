package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Registration for the graft native expressions.
  *
  * Two paths to the same functions:
  *  - [[GraftFunctions.ensureRegistered]] — runtime registration into the
  *    session's function registry; every graft operator calls it, so the
  *    library works against any plain SparkSession (the driver builds its
  *    own session without extra config).
  *  - [[GraftExtensions]] — `spark.sql.extensions=graft.functions.GraftExtensions`
  *    for users who want the functions available in pure `spark.sql(...)`
  *    from session start.
  */
object GraftFunctions {

  private def intArg(fn: String, es: Seq[Expression], i: Int): Int = es.lift(i) match {
    // integral literal types only — a bare numeric match would silently
    // truncate e.g. 2.5 to 2 via intValue()
    case Some(Literal(v: Number, ByteType | ShortType | IntegerType |
        LongType)) =>
      val l = v.longValue()
      // a long literal past Int range must error, not wrap: intValue() of
      // 2^32+1 is 1, which would silently compute 1-gram hashes
      if (l < Int.MinValue || l > Int.MaxValue)
        throw new IllegalArgumentException(
          s"$fn: argument ${i + 1} out of Int range: $l")
      l.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${i + 1} must be an integer literal, got " +
        other.map(_.sql).getOrElse("nothing"))
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash_band_keys" ->
      (es => MinHashBandKeys(es.head, intArg("graft_minhash_band_keys", es, 1))),
    "graft_simhash64" -> (es => SimHash64(es.head)),
    "graft_min_k" ->
      (es => MinKLongs(es.head, intArg("graft_min_k", es, 1))
        .toAggregateExpression()),
    "graft_vec_dot" -> (es => VecDot(es.head, es(1))),
    "graft_edit_lb" -> (es => EditLowerBound(es.head, es(1))),
    "graft_code_points" -> (es => CodePoints(es.head)),
    "graft_shingle_hashes" ->
      (es => ShingleHashes(es.head, intArg("graft_shingle_hashes", es, 1))),
    "graft_winnow_positions" ->
      (es => WinnowPositions(es.head, intArg("graft_winnow_positions", es, 1))),
    "graft_bloom_agg" ->
      (es => BloomLongs(es.head, intArg("graft_bloom_agg", es, 1),
        intArg("graft_bloom_agg", es, 2)).toAggregateExpression()),
    "graft_bloom_contains" -> (es => BloomMightContain(es.head, es(1))),
    "graft_pq_encode" -> (es => PqEncode(es.head,
      intArg("graft_pq_encode", es, 2), cbArg("graft_pq_encode", es, 1))),
    "graft_pq_error" -> (es => PqError(es.head,
      intArg("graft_pq_error", es, 2), cbArg("graft_pq_error", es, 1))))

  /** Extract an array<array<double>> literal (the PQ codebook): the
    * codebook is plan metadata, not data — it must be a literal so the
    * kernel embeds it once instead of deserializing per row.
    */
  private def cbArg(fn: String, es: Seq[Expression], i: Int): Seq[Seq[Double]] =
    es.lift(i) match {
      case Some(Literal(ad: org.apache.spark.sql.catalyst.util.ArrayData,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, _), _))) =>
        (0 until ad.numElements()).map(r =>
          ad.getArray(r).toDoubleArray().toSeq)
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an array<array<double>> literal, " +
          s"got " + other.map(_.sql).getOrElse("nothing"))
    }

  /** Idempotently register all graft functions into `spark`'s registry. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** `spark.sql.extensions` entry point (config-time registration). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}
