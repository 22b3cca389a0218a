package graft

import graft.ops.ScrubOps
import org.apache.spark.sql.functions._

/** PII audit + scrub (q104): per-family detection counts, replacement
  * tokens, pattern-order interactions (emails with digits vs the phone
  * pattern), and the clean-corpus zero contract.
  */
class ScrubSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(rows: (Long, String, String)*) =
    rows.map { case (id, t, src) => (id, t, "en", src) }
      .toDF("doc_id", "text", "lang", "source")

  test("scrub replaces each PII family with its token and counts spans") {
    val df = corpus(
      (1L, "mail bob.smith+x@ex-co.io now", "web"),
      (2L, "server 10.0.255.7 down, backup 192.168.1.1 up", "web"),
      (3L, "ssn 123-45-6789 leaked", "crawl"),
      (4L, "call +1 (415) 555-0199 today", "crawl"),
      (5L, "clean document with no pii at all", "crawl"))
    val got = ScrubOps.scrubOn(df).orderBy("doc_id")
      .select("doc_id", "text", "n_scrubbed").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got === Seq(
      (1L, "mail <EMAIL> now", 1),
      (2L, "server <IP> down, backup <IP> up", 2),
      (3L, "ssn <SSN> leaked", 1),
      (4L, "call <PHONE> today", 1),
      (5L, "clean document with no pii at all", 0)))
  }

  test("n_scrubbed counts each replaced span once when families overlap, " +
      "and null text audits as zero hits") {
    // the SSN-shaped run sits INSIDE what the phone pattern would match on
    // the raw text: SSN fires first (documented order), after which the
    // phone pattern no longer matches — ONE span was replaced, and a
    // per-family count over the original text would have said two
    val out = ScrubOps.scrubOn(corpus(
      (0L, "call +1 222-33-4444 now", "s"))).collect().head
    assert(out.getAs[String]("text") === "call +1 <SSN> now")
    assert(out.getAs[Int]("n_scrubbed") === 1,
      "overlapping families must not double-count one replacement")
    // null text: every audit counter reads 0, independent of the legacy
    // sizeOfNull session flag
    import org.apache.spark.sql.functions.lit
    val audit = ScrubOps.piiAuditOn(
      corpus((1L, "x", "s")).withColumn("text", lit(null: String)))
      .collect().head
    assert(audit.getAs[Long]("n_docs") === 1L)
    assert(audit.getAs[Long]("n_pii_docs") === 0L)
    assert(audit.getAs[Long]("n_email") === 0L)
  }

  test("an email's digits are not double-counted by the phone pattern " +
      "and an SSN inside a sentence stays an SSN") {
    val df = corpus(
      (1L, "reach bob99@ex.co or +44 20 7946 0958 now", "web"),
      (2L, "id 987-65-4321 phone +1 4155550199", "web"))
    val audited = ScrubOps.piiAuditOn(df).collect()
    assert(audited.length === 1)
    val r = audited(0)
    // columns: source, n_docs, n_pii_docs, n_email, n_ipv4, n_ssn, n_phone
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) === ((2L, 2L, 1L, 0L, 1L, 2L)))
    val scrubbed = ScrubOps.scrubOn(df).orderBy("doc_id")
      .select("text").as[String].collect().toSeq
    assert(scrubbed === Seq(
      "reach <EMAIL> or <PHONE> now",
      "id <SSN> phone <PHONE>"))
  }

  test("audit over a clean corpus reports zeros per source") {
    val df = corpus(
      (1L, "alpha beta gamma", "web"),
      (2L, "delta epsilon", "books"))
    val got = ScrubOps.piiAuditOn(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === Seq(
      ("books", 1L, 0L, 0L, 0L, 0L, 0L),
      ("web", 1L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("k-anonymity audit: planted small classes, row-level risk, and a " +
      "NULL quasi-identifier bucket for unparseable props") {
    import spark.implicits._
    def ev(t: String, u: Long, props: String) =
      (t, u, java.sql.Timestamp.valueOf("2026-01-01 00:10:00"), props,
        u * 1.5)
    val rows =
      // view/k=1/hod=0: 2 distinct users over 3 events -> small (< 5)
      Seq(ev("view", 1L, """{"k": 1}"""), ev("view", 1L, """{"k": 1}"""),
        ev("view", 2L, """{"k": 1}""")) ++
      // view/k=2/hod=0: 5 distinct users -> safe
      (1L to 5L).map(u => ev("view", u, """{"k": 2}""")) ++
      // click/k=1/hod=0: one user posting 4 events -> the worst class
      Seq.fill(4)(ev("click", 9L, """{"k": 1}""")) ++
      // click with unparseable k: its own NULL-k class, 5 users -> safe
      (1L to 5L).map(u => ev("click", u, "not json"))
    val df = rows.toDF("event_type", "user_id", "ts", "props", "value")
    val got = ScrubOps.kanonAuditOn(df, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got === Seq(
      ("click", 2L, 1L, 1L, 9L, 4L, 44.4444),
      ("view", 2L, 1L, 2L, 8L, 3L, 37.5)))
  }

  test("l-diversity audit: a k-anonymous but homogeneous class is " +
      "flagged, NaN values form a NULL band, an all-NULL class counts " +
      "0 distinct") {
    import spark.implicits._
    def ev(t: String, u: Long, v: Double) =
      (t, u, java.sql.Timestamp.valueOf("2026-01-01 00:10:00"),
        """{"k": 1}""", v)
    val rows =
      // view/k=1: 5 users (passes k-anonymity!) but ONE value band —
      // the homogeneity attack q134 cannot see
      (1L to 5L).map(u => ev("view", u, 7.25)) ++
      // click/k=1: 3 users, 3 distinct bands -> diverse (>= 3)
      Seq(ev("click", 1L, 1.0), ev("click", 2L, 2.0),
        ev("click", 3L, 3.5)) ++
      // buy/k=1: NaN and infinite values -> NULL bands only -> 0
      // distinct, maximally homogeneous, flagged
      Seq(ev("buy", 1L, Double.NaN),
        ev("buy", 2L, Double.PositiveInfinity))
    val df = rows.toDF("event_type", "user_id", "ts", "props", "value")
    val got = ScrubOps.ldivAuditOn(df, l = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got === Seq(
      ("buy", 1L, 1L, 0L, 2L, 2L, 100.0),
      ("click", 1L, 0L, 3L, 3L, 0L, 0.0),
      ("view", 1L, 1L, 1L, 5L, 5L, 100.0)))
  }

  test("t-closeness audit: a diverse-but-skewed class is flagged past t, " +
      "a global-matching class reads 0, a single-band type reads 0, and " +
      "an unmeasurable class flags as NULL — hand-computed EMDs") {
    import spark.implicits._
    def ev(t: String, kp: Long, v: Double) =
      (t, 1L, java.sql.Timestamp.valueOf("2026-01-01 00:10:00"),
        s"""{"k": $kp}""", v)
    val rows =
      // view global bands: {0: 6, 1: 6} (B = 12, m = 2)
      // k=1: all 4 measurable events in band 0 (+1 NaN = n_events cargo)
      //   → t = |12·4 − 4·6| / (4·12·1) = 0.5 — flagged at t = 0.3
      (Seq.fill(4)(ev("view", 1L, 0.5)) :+ ev("view", 1L, Double.NaN)) ++
      // k=2: all 4 in band 1 → the same skew from the other side, 0.5
      Seq.fill(4)(ev("view", 2L, 1.5)) ++
      // k=3: 2+2 — exactly the global distribution → t = 0, not flagged
      Seq(ev("view", 3L, 0.5), ev("view", 3L, 0.5),
        ev("view", 3L, 1.5), ev("view", 3L, 1.5)) ++
      // k=9: a_tot = 0 INSIDE a banded type (every value corrupt) — the
      // grid row exists (joined to the type's bands) with num = 0 and
      // denominator 0·btot·(m−1) = 0: try_divide reads NULL, flagged —
      // never a 0/0 scan kill nor a silently-clean t = 0
      Seq(ev("view", 9L, Double.NaN),
        ev("view", 9L, Double.NegativeInfinity)) ++
      // a single-band type: every class trivially matches global → t = 0
      Seq.fill(3)(ev("solo", 1L, 9.2)) ++
      // a type with NO measurable band (NaN / Inf only): t = NULL,
      // flagged — the safe direction, like q141's 0-distinct
      Seq(ev("bad", 1L, Double.NaN), ev("bad", 1L, Double.PositiveInfinity))
    val df = rows.toDF("event_type", "user_id", "ts", "props", "value")
    val got = ScrubOps.tcloseAuditOn(df, 0.3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    assert(got === Seq(
      ("bad", 1L, 1L, null, 2L, 2L, 100.0),
      ("solo", 1L, 0L, 0.0, 3L, 0L, 0.0),
      // view: 4 classes, k=1/k=2 (skew) + k=9 (a_tot=0, NULL t) flagged
      // — 11 of 15 rows at risk incl. the corrupt-value cargo rows;
      // worst MEASURED class t = 0.5
      ("view", 4L, 3L, 0.5, 15L, 11L, 73.3333)))
  }

  test("k-anonymity store: a pre-l-diversity store (no sens_sketch " +
      "column) fails with the rebuild instruction, not a schema-sampling " +
      "lottery") {
    import spark.implicits._
    def ev(t: String, u: Long, kp: Long) =
      (t, u, java.sql.Timestamp.valueOf("2026-01-01 00:10:00"),
        s"""{"k": $kp}""", u * 1.5)
    val crawl = (1L to 3L).map(u => ev("view", u, 1L))
      .toDF("event_type", "user_id", "ts", "props", "value")
    val path = tmpDir("kanon-old-schema") + "/kanon"
    ScrubOps.writeKanonStore(crawl, path)
    val oldSchema = spark.read.parquet(path).drop("sens_sketch")
    val e = intercept[IllegalArgumentException] {
      ScrubOps.kanonAuditFromClasses(oldSchema, ScrubOps.KAnonK).collect()
    }
    assert(e.getMessage.contains("rebuild it with writeKanonStore"))
  }

  test("k-anonymity store: a corrupted sketch blob fails the audit LOUD " +
      "instead of silently under-counting users (an under-count would " +
      "inflate risk_pct — safe direction, but a corrupt store must be " +
      "rebuilt, not trusted)") {
    import spark.implicits._
    def ev(t: String, u: Long, kp: Long) =
      (t, u, java.sql.Timestamp.valueOf("2026-01-01 00:10:00"),
        s"""{"k": $kp}""", u * 1.5)
    val crawl = (1L to 5L).map(u => ev("view", u, 1L))
      .toDF("event_type", "user_id", "ts", "props", "value")
    val path = tmpDir("kanon-corrupt") + "/kanon"
    ScrubOps.writeKanonStore(crawl, path)
    // truncate every sketch blob to its first 3 bytes — a torn write /
    // bad disk, past any parquet checksum
    val damaged = spark.read.parquet(path)
      .withColumn("sketch",
        org.apache.spark.sql.functions.expr("substring(sketch, 1, 3)"))
    val e = intercept[Throwable] {
      ScrubOps.kanonAuditFromClasses(damaged, ScrubOps.KAnonK).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else (t.getClass.getName + ": " + t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(m => m.toLowerCase.contains("sketch") ||
      m.toLowerCase.contains("corrupt") || m.contains("Exception")),
      s"expected a loud sketch failure, got: ${chain(e).mkString(" | ")}")
  }

  test("t-closeness store face: the q145 verdict from the band-count " +
      "histograms equals the exact event-scan audit across appended " +
      "crawls, survives compaction, and a pre-t-closeness store fails " +
      "with the rebuild message") {
    import spark.implicits._
    def ev(t: String, kp: Long, v: Double) =
      (t, 1L, java.sql.Timestamp.valueOf("2026-01-01 00:10:00"),
        s"""{"k": $kp}""", v)
    val crawl1 = ((Seq.fill(4)(ev("view", 1L, 0.5)) ++
      Seq.fill(2)(ev("view", 2L, 1.5))) :+ ev("bad", 1L, Double.NaN))
      .toDF("event_type", "user_id", "ts", "props", "value")
    // crawl 2 extends an EXISTING class (view/k=2) and adds a new one —
    // the cross-batch histogram merge is what the EMD depends on
    val crawl2 = (Seq.fill(2)(ev("view", 2L, 1.5)) ++
      Seq(ev("view", 3L, 0.5), ev("view", 3L, 1.5)))
      .toDF("event_type", "user_id", "ts", "props", "value")
    val whole = crawl1.unionByName(crawl2)
    val path = tmpDir("tclose-store") + "/kanon"
    ScrubOps.writeKanonStore(crawl1, path)
    ScrubOps.appendToKanonStore(crawl2, path)
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val exact = dump(ScrubOps.tcloseAuditOn(whole, ScrubOps.TCloseT))
    assert(exact.nonEmpty && exact.exists(r => r(2) != 0L),
      s"fixture sanity: some class must flag: $exact")
    assert(dump(ScrubOps.tcloseAuditFromStore(spark, path)) === exact,
      "store histograms must reproduce the exact EMD verdicts")
    ScrubOps.compactKanonStore(spark, path)
    assert(dump(ScrubOps.tcloseAuditFromStore(spark, path)) === exact,
      "compaction merges histograms by exact per-band sum")
    val oldSchema = spark.read.parquet(path).drop("band_counts")
    val e = intercept[IllegalArgumentException] {
      ScrubOps.tcloseAuditFromClasses(oldSchema, ScrubOps.TCloseT)
    }
    assert(e.getMessage.contains("pre-t-closeness"),
      s"named rebuild message, got: ${e.getMessage}")
    // a MIXED old/new segment set passes the column check (schema
    // sampling surfaced the new footer) but reads old rows' band_counts
    // as NULL — must fail LOUD, not compute the EMD from a partial
    // histogram (a silently partial histogram can UNDER-flag)
    import org.apache.spark.sql.functions.{when => swhen, col => scol,
      lit => slit}
    val mixed = spark.read.parquet(path).withColumn("band_counts",
      swhen(scol("k_prop") === 1L,
        slit(null).cast("map<bigint,bigint>"))
        .otherwise(scol("band_counts")))
    val eMixed = intercept[Throwable] {
      ScrubOps.tcloseAuditFromClasses(mixed, ScrubOps.TCloseT).collect()
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Nil else x.getMessage +: chain(x.getCause)
    assert(chain(eMixed).exists(m =>
      m != null && m.contains("mixes pre- and post-t-closeness")),
      s"mixed store must fail loud, got: ${chain(eMixed).mkString(" | ")}")
  }

  test("l-diversity store: a corrupted sens_sketch blob fails the q141 " +
      "audit LOUD (a silent undercount of n_sens would only INFLATE the " +
      "flagged set — the safe direction — but a corrupt store must be " +
      "rebuilt, not trusted)") {
    import spark.implicits._
    def ev(t: String, u: Long, kp: Long) =
      (t, u, java.sql.Timestamp.valueOf("2026-01-01 00:10:00"),
        s"""{"k": $kp}""", u * 1.5)
    val crawl = (1L to 5L).map(u => ev("view", u, 1L))
      .toDF("event_type", "user_id", "ts", "props", "value")
    val path = tmpDir("ldiv-corrupt") + "/kanon"
    ScrubOps.writeKanonStore(crawl, path)
    val damaged = spark.read.parquet(path)
      .withColumn("sens_sketch",
        org.apache.spark.sql.functions.expr("substring(sens_sketch, 1, 3)"))
    val e = intercept[Throwable] {
      ScrubOps.ldivAuditFromClasses(damaged, ScrubOps.LDivL).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else (t.getClass.getName + ": " + t.getMessage) +: chain(t.getCause)
    assert(chain(e).exists(m => m.toLowerCase.contains("sketch") ||
      m.toLowerCase.contains("corrupt") || m.contains("Exception")),
      s"expected a loud sketch failure, got: ${chain(e).mkString(" | ")}")
  }

  test("k-anonymity store: from-store audit equals the exact batch audit, " +
      "appended crawls merge, and a replayed append cannot change the " +
      "privacy verdicts (user sketches are set-idempotent)") {
    import spark.implicits._
    def ev(t: String, u: Long, kp: Long) =
      (t, u, java.sql.Timestamp.valueOf("2026-01-01 00:10:00"),
        s"""{"k": $kp}""", u * 1.5)
    val crawl1 = (Seq(ev("view", 1L, 1L), ev("view", 2L, 1L)) ++
      (1L to 5L).map(u => ev("view", u, 2L)))
      .toDF("event_type", "user_id", "ts", "props", "value")
    val crawl2 = (Seq(ev("view", 3L, 1L)) ++
      Seq.fill(4)(ev("click", 9L, 1L)))
      .toDF("event_type", "user_id", "ts", "props", "value")
    val whole = crawl1.unionByName(crawl2)
    val path = tmpDir("kanon-store") + "/kanon"

    // build from crawl1, fold crawl2 in append-only
    ScrubOps.writeKanonStore(crawl1, path)
    ScrubOps.appendToKanonStore(crawl2, path)
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val exact = dump(ScrubOps.kanonAuditOn(whole, k = 5))
    assert(dump(ScrubOps.kanonAuditFromStore(spark, path)) === exact,
      "store audit must equal the exact whole-corpus audit at small " +
        "cardinalities")

    // replayed append: distinct-user columns unchanged, only n_events
    // inflates by the replayed batch
    ScrubOps.appendToKanonStore(crawl2, path)
    val replayed = dump(ScrubOps.kanonAuditFromStore(spark, path))
    assert(replayed.map(r => (r(0), r(1), r(2), r(3))) ===
      exact.map(r => (r(0), r(1), r(2), r(3))),
      "class counts and min users must survive a replayed append")

    // compaction: one row per class, audit unchanged
    ScrubOps.compactKanonStore(spark, path)
    assert(dump(ScrubOps.kanonAuditFromStore(spark, path)) === replayed)
    assert(spark.read.parquet(path).groupBy("event_type", "k_prop", "hod")
      .count().collect().forall(_.getLong(3) === 1L),
      "compaction must leave one row per class")
  }
}
