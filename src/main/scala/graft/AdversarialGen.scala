package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** Deterministic malformed-corpus generator: the round-10 standing
  * adversarial-fixture gate (VERDICT r09 item 1).
  *
  * Writes all ten driver tables (TESTDATA.md schemas, byte-identical field
  * types) into `dir`, each seeded with a small well-formed base PLUS the
  * degenerate rows the driver's gate corpus never contains:
  *
  *   - text: NULL / empty / whitespace-only / single-char / giant unbroken
  *     token / pathological repetition / regex metacharacters / unicode
  *     (emoji, CJK, RTL, combining) / exact + near duplicates
  *   - embeddings: zero-norm / NULL column / empty array / ragged dims
  *     (3 and 130 vs the corpus 64) / NULL element inside the array /
  *     NaN + Infinity elements / duplicate vec_ids
  *   - numerics: NULL aggregation inputs, 0 and negative quantities,
  *     discount > 1, extreme-but-decimal(38,10)-safe magnitudes (1e20),
  *     NaN and +Infinity doubles in `events.value`
  *   - keys: Long.MaxValue / Long.MinValue ids, duplicate primary keys,
  *     orphan foreign keys in every TPC-H edge, NULL join keys
  *   - time: NULL timestamps; the well-formed event span stays ≤ 2 days so
  *     gap-fill sequences stay small
  *   - JSON: NULL / empty / malformed / nested / explicit-null props
  *
  * The companion spec (`AdversarialFixtureSpec`) runs EVERY
  * `SparkEntry.queries` entry over this fixture asserting no-throw (or a
  * documented fail-loud contract). Rationale: the round-9 zero-norm-cosine
  * ANSI DIVIDE_BY_ZERO survived eight review passes and two fully-green
  * 132/132 catalogs precisely because the gate corpus has no degenerate
  * rows.
  *
  * Everything is hand-authored literals — no clocks, no RNG — so the
  * fixture is bit-stable across runs and sessions.
  */
object AdversarialGen {

  /** Giant unbroken token (16 KiB of 'x') — stresses shingle/token paths. */
  private val giantToken = "x" * 16384

  /** Pathological repetition — stresses repetition/ngram profiling. */
  private val spam = Seq.fill(400)("spam").mkString(" ")

  // Vocabulary matching the driver corpus so search/shingle queries hit.
  private def doc(words: String*): String = words.mkString(" ")

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def mkDf(spark: SparkSession, schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(rows.asJava, schema)

  private def write(df: DataFrame, dir: String, name: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")

  // ---- per-table builders ---------------------------------------------------

  def region(spark: SparkSession): DataFrame = mkDf(spark, StructType(Seq(
    StructField("r_regionkey", IntegerType), StructField("r_name", StringType))), Seq(
    Row(0, "AFRICA"), Row(1, "AMERICA"), Row(2, "ASIA"), Row(3, "EUROPE"),
    Row(4, "MIDDLE EAST"),
    Row(5, null),                    // null name
    Row(Int.MinValue, "UNDERFLOW"))) // extreme key

  def nation(spark: SparkSession): DataFrame = mkDf(spark, StructType(Seq(
    StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType))), Seq(
    Row(0, "NATION_0", 0), Row(1, "NATION_1", 1), Row(2, "NATION_2", 2),
    Row(3, "NATION_3", 3), Row(4, "NATION_4", 4), Row(5, "NATION_5", 0),
    Row(6, null, 1),        // null name
    Row(7, "NATION_7", 99), // orphan regionkey
    Row(8, "NATION_8", null), // null FK
    Row(8, "NATION_8_DUP", 2), // duplicate primary key
    Row(Int.MaxValue, "NATION_MAX", 3)))

  def customer(spark: SparkSession): DataFrame = mkDf(spark, StructType(Seq(
    StructField("c_custkey", LongType), StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType))), Seq(
    Row(0L, "Customer#000000000", 0, 100.5, "BUILDING"),
    Row(1L, "Customer#000000001", 1, 2000.0, "AUTOMOBILE"),
    Row(2L, "Customer#000000002", 2, -50.25, "MACHINERY"),
    Row(3L, "Customer#000000003", 3, 0.0, "HOUSEHOLD"),
    Row(4L, "Customer#000000004", 4, 999.99, "FURNITURE"),
    Row(5L, "Customer#000000005", 5, 1234.56, "BUILDING"),
    Row(6L, null, 0, 10.0, "BUILDING"),          // null name
    Row(7L, "Customer#000000007", 99, 20.0, "AUTOMOBILE"), // orphan nation
    Row(8L, "Customer#000000008", null, 30.0, null),       // null FK + segment
    Row(9L, "Customer#000000009", 1, null, "MACHINERY"),   // null balance
    Row(Long.MaxValue, "Customer#MAX", 2, 1.0e20, "HOUSEHOLD"),
    Row(Long.MinValue, "Customer#MIN", 3, -1.0e20, "FURNITURE"),
    Row(null, "Customer#NULLKEY", 4, 5.0, "BUILDING")))    // null primary key

  def supplier(spark: SparkSession): DataFrame = mkDf(spark, StructType(Seq(
    StructField("s_suppkey", LongType), StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))), Seq(
    Row(0L, "Supplier#000000000", 0, 500.0),
    Row(1L, "Supplier#000000001", 1, 600.0),
    Row(2L, "Supplier#000000002", 2, 700.0),
    Row(3L, "Supplier#000000003", 99, 800.0),  // orphan nation
    Row(4L, null, 3, null),                     // null name + balance
    Row(5L, "Supplier#000000005", null, -10.0), // null FK
    Row(Long.MaxValue, "Supplier#MAX", 4, 0.0)))

  def part(spark: SparkSession): DataFrame = mkDf(spark, StructType(Seq(
    StructField("p_partkey", LongType), StructField("p_name", StringType),
    StructField("p_brand", StringType), StructField("p_type", StringType),
    StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))), Seq(
    Row(0L, "cold widget", "Brand#1", "ECONOMY", 5, 100.0),
    Row(1L, "small widget", "Brand#2", "STANDARD", 10, 200.0),
    Row(2L, "large bolt", "Brand#3", "MEDIUM", 15, 300.0),
    Row(3L, "fast gear", "Brand#4", "SMALL", 20, 400.0),
    Row(4L, "green gear", "Brand#5", "LARGE", 25, 500.0),
    Row(5L, "red bolt", "Brand#1", "PROMO", 30, 600.0),
    Row(6L, null, null, null, null, null),      // all-null attributes
    Row(7L, "", "Brand#2", "ECONOMY", 0, 0.0),  // empty name, zero size/price
    Row(8L, "odd%_widget[.*]", "Brand#3", "STANDARD", -1, -5.0), // metachars, negatives
    Row(Long.MaxValue, "max part", "Brand#4", "MEDIUM", Int.MaxValue, 1.0e20)))

  def orders(spark: SparkSession): DataFrame = mkDf(spark, StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType))),
    (0 until 12).map { i =>
      Row(i.toLong, (i % 6).toLong, Seq("F", "O", "P")(i % 3), 100.0 * (i + 1),
        ts(f"2024-01-${i % 28 + 1}%02d 00:00:00"),
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")(i % 5))
    } ++ Seq(
      Row(12L, 999L, "F", 50.0, ts("2024-01-05 00:00:00"), "1-URGENT"), // orphan cust
      Row(13L, null, "O", 60.0, ts("2024-01-06 00:00:00"), "2-HIGH"),   // null FK
      Row(14L, 1L, null, null, null, null),                              // null attrs/date
      Row(14L, 2L, "P", 70.0, ts("2024-01-07 00:00:00"), "5-LOW"),      // dup key
      Row(Long.MaxValue, 3L, "F", 1.0e20, ts("2024-01-08 00:00:00"), "3-MEDIUM"),
      Row(Long.MinValue, 4L, "O", -80.0, ts("2024-01-09 00:00:00"), "4-NOT SPECIFIED")))

  def lineitem(spark: SparkSession): DataFrame = mkDf(spark, StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType))),
    (0 until 24).map { i =>
      Row((i % 12).toLong, (i % 6).toLong, (i % 3).toLong, i % 4 + 1,
        (i % 10 + 1).toDouble, 50.0 * (i + 1), 0.01 * (i % 9), 0.02,
        Seq("N", "R", "A")(i % 3), Seq("F", "O")(i % 2),
        ts(f"2024-01-${i % 28 + 1}%02d 12:00:00"))
    } ++ Seq(
      Row(999L, 0L, 0L, 1, 1.0, 10.0, 0.0, 0.0, "N", "F",
        ts("2024-01-10 00:00:00")),                                 // orphan order
      Row(0L, 999L, 999L, 2, 2.0, 20.0, 0.0, 0.0, "R", "O",
        ts("2024-01-11 00:00:00")),                                 // orphan part+supp
      Row(1L, null, null, 3, null, null, null, null, null, null, null), // null storm
      Row(2L, 1L, 1L, 4, 0.0, 0.0, 1.5, -0.1, "A", "F",
        ts("2024-01-12 00:00:00")),                                 // zero qty, disc>1
      Row(3L, 2L, 2L, 1, -4.0, -100.0, 0.5, 0.0, "N", "O",
        ts("2024-01-13 00:00:00")),                                 // negatives
      Row(Long.MaxValue, Long.MaxValue, Long.MaxValue, Int.MaxValue,
        1.0e20, 1.0e20, 0.0, 0.0, "R", "F", ts("2024-01-14 00:00:00")),
      Row(null, 3L, 1L, 2, 5.0, 55.0, 0.1, 0.02, "A", "O", null)))  // null join key

  /** Events: well-formed span 2024-01-01..02 (gap-fill stays ≤ ~2900 min). */
  def events(spark: SparkSession): DataFrame = mkDf(spark, StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType))),
    (0 until 30).map { i =>
      Row(i.toLong, ts(f"2024-01-0${i % 2 + 1} ${i % 24}%02d:${(7 * i) % 60}%02d:30"),
        (i % 7).toLong, Seq("view", "click", "purchase", "signup", "error")(i % 5),
        10.0 * (i + 1), s"""{"k": ${i * 3}}""")
    } ++ Seq(
      Row(30L, ts("2024-01-01 05:00:00"), 1L, null, 5.0, """{"k": 1}"""), // null type
      Row(31L, ts("2024-01-01 06:00:00"), 2L, "", 6.0, """{"k": 2}"""),   // empty type
      Row(32L, ts("2024-01-01 07:00:00"), 3L, "unknown_type", 7.0, """{"k": 3}"""),
      Row(33L, null, 4L, "view", 8.0, """{"k": 4}"""),                    // null ts
      Row(34L, ts("2024-01-01 08:00:00"), null, "click", 9.0, """{"k": 5}"""), // null user
      Row(35L, ts("2024-01-01 09:00:00"), 5L, "purchase", null, """{"k": 6}"""), // null value
      Row(36L, ts("2024-01-01 10:00:00"), 6L, "view", Double.NaN, """{"k": 7}"""),
      Row(37L, ts("2024-01-01 11:00:00"), 0L, "click", Double.PositiveInfinity,
        """{"k": 8}"""),
      Row(38L, ts("2024-01-01 12:00:00"), 1L, "purchase", 1.0e20, """{"k": 9}"""),
      Row(39L, ts("2024-01-01 13:00:00"), 2L, "view", -1.0e20, """{"k": 10}"""),
      Row(40L, ts("2024-01-01 14:00:00"), 3L, "click", 11.0, null),       // null props
      Row(41L, ts("2024-01-01 15:00:00"), 4L, "view", 12.0, ""),          // empty props
      Row(42L, ts("2024-01-01 16:00:00"), 5L, "click", 13.0, "{not json"), // malformed
      Row(43L, ts("2024-01-01 17:00:00"), 6L, "purchase", 14.0,
        """{"k": {"nested": true}}"""),                                   // nested k
      Row(44L, ts("2024-01-01 18:00:00"), 0L, "view", 15.0, """{"k": null}"""),
      Row(45L, ts("2024-01-01 19:00:00"), 1L, "error", 16.0, """{"j": 1}"""), // no k
      Row(45L, ts("2024-01-01 20:00:00"), 2L, "view", 17.0, """{"k": 11}"""), // dup id
      Row(Long.MaxValue, ts("2024-01-02 21:00:00"), Long.MaxValue, "click", 18.0,
        """{"k": 12}"""),
      Row(Long.MinValue, ts("2024-01-02 22:00:00"), Long.MinValue, "view", 19.0,
        """{"k": 13}"""),
      // the enterprise sentinel date: a ~4-billion-minute span would
      // explode any min/max-derived time spine (q74/q75 fail loud on it
      // by contract — the named span guard, not an array-size error)
      Row(46L, ts("9999-12-31 23:59:59"), 0L, "view", 20.0, """{"k": 14}""")))

  def documents(spark: SparkSession): DataFrame = mkDf(spark, StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType))), {
    val langs = Seq("en", "de", "fr", "es", "zh")
    val base = (0 until 20).map { i =>
      val t = doc("the", "fast", "key", "order", "sort", "table", "scan",
        "merge", "part", "window", s"tok$i", "hash", "join", "batch",
        "stream", "spark", "dup", s"tail${i % 4}")
      Row(i.toLong, t, langs(i % 5), s"src${i % 8}", t.length.toLong)
    }
    base ++ Seq(
      Row(20L, base(3).getString(1), "en", "src1", base(3).getString(1).length.toLong), // exact dup of doc 3
      Row(21L, base(3).getString(1) + " extra", "en", "src2",
        (base(3).getString(1).length + 6).toLong),                  // near dup
      Row(22L, null, "en", "src3", null),                           // null text
      Row(23L, "", "de", "src4", 0L),                               // empty text
      Row(24L, "   \n\t  ", "fr", "src5", 7L),                      // whitespace only
      Row(25L, "a", "es", "src6", 1L),                              // single char
      Row(26L, giantToken, "en", "src7", giantToken.length.toLong), // giant token
      Row(27L, spam, "en", "src0", spam.length.toLong),             // repetition
      Row(28L, "regex .* meta [chars] (everywhere) \\ $ ^ | ? + {2,3}", "en",
        "src1", 52L),                                               // regex metachars
      Row(29L, "emoji 🚀🔥 CJK 漢字テスト RTL שלום عربى combining é é", "zh",
        "src2", 48L),                                               // unicode zoo
      Row(30L, "the fast key", null, "src3", 12L),                  // null lang
      Row(31L, "order sort table", "en", null, 16L),                // null source
      Row(32L, "scan merge part", "", "", 15L),                     // empty lang+src
      Row(33L, "window small hash", "xx", "srcNEW", 17L),           // unseen categorials
      Row(34L, "join batch stream", "en", "src4", -5L),             // negative n_chars
      Row(35L, "spark dup tail", "de", "src5", 1000000000000000L),  // extreme n_chars
      Row(35L, "dup key text", "fr", "src6", 12L),                  // duplicate doc_id
      Row(Long.MaxValue, "max id doc", "en", "src7", 10L),
      Row(Long.MinValue, "min id doc", "es", "src0", 10L),
      Row(null, "null id doc", "en", "src1", 11L))                  // null primary key
  })

  def embeddings(spark: SparkSession): DataFrame = mkDf(spark, StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = true)),
    StructField("label", IntegerType))), {
    // deterministic unit-ish 64-dim vectors; vec_id 0 stays well-formed
    // (it is the probe row in the ANN/PQ query family).
    def v(seed: Int): Seq[Float] =
      (0 until 64).map(j => math.sin(seed * 64 + j + 1).toFloat)
    val base = (0 until 20).map(i => Row(i.toLong, v(i), i % 10))
    base ++ Seq(
      Row(20L, Seq.fill(64)(0.0f), 3),                 // zero-norm
      Row(21L, null, 4),                               // null column
      Row(22L, Seq.empty[Float], 5),                   // empty array
      Row(23L, Seq(1.0f, 2.0f, 3.0f), 6),              // ragged: dim 3
      Row(24L, (0 until 130).map(j => math.cos(j + 1).toFloat), 7), // ragged: dim 130
      Row(25L, v(25).updated[Any](10, null), 8),       // null element inside array
      Row(26L, v(26).updated(0, Float.NaN), 9),        // NaN element
      Row(27L, v(27).updated(1, Float.PositiveInfinity), 0), // Inf element
      Row(28L, v(3), 1),                               // exact dup of vec 3
      Row(28L, v(5), 2),                               // duplicate vec_id
      Row(29L, v(29), null),                           // null label
      Row(Long.MaxValue, v(30), Int.MaxValue),
      Row(Long.MinValue, v(31), Int.MinValue))
  })

  // ---- entry points ---------------------------------------------------------

  /** The one (name, builder) list both fixture writers fold over — a new
    * driver table added here is automatically in BOTH gate arms; two
    * hand-maintained lists would let the empty arm silently skip it.
    */
  private val tables: Seq[(String, SparkSession => DataFrame)] = Seq(
    "region" -> region _, "nation" -> nation _, "customer" -> customer _,
    "supplier" -> supplier _, "part" -> part _, "orders" -> orders _,
    "lineitem" -> lineitem _, "events" -> events _,
    "documents" -> documents _, "embeddings" -> embeddings _)

  /** Write the EMPTY fixture into `dir`: all ten tables, exact driver
    * schemas, zero rows — "day zero of a crawl", the other corpus state
    * the driver's gate can never exercise. Derived from the malformed
    * builders via `limit(0)` so the schemas cannot drift.
    */
  def writeEmpty(spark: SparkSession, dir: String): Unit =
    tables.foreach { case (name, build) =>
      write(build(spark).limit(0), dir, name)
    }

  /** Write the complete malformed fixture into `dir`. */
  def writeAll(spark: SparkSession, dir: String): Unit =
    tables.foreach { case (name, build) =>
      write(build(spark), dir, name)
    }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: AdversarialGen <outDir>")
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-adversarial-gen")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try writeAll(spark, args(0)) finally spark.stop()
  }
}
