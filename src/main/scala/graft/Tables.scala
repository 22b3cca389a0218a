package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver's parquet testdata (TESTDATA.md) plus shared
  * determinism helpers used by every oracle-checked query.
  */
object Tables {

  /** Read one testdata table: `\$dir/\$name.parquet`.
    *
    * The driver's `events.parquet` stores `ts` as TIMESTAMP(NANOS), which the
    * Spark parquet reader rejects; read it as raw nanos and convert (all
    * values are micro-aligned, so the conversion is lossless).
    *
    * DELIBERATE session-wide side effect: `nanosAsLong` stays set after
    * the call — the flag must hold through physical PLANNING of every
    * query that ever scans the table (plans capture the hadoop conf at
    * plan time, which can be long after this returns), so a save/restore
    * scope would break any query planned later against a `t`-loaded
    * frame. Consequence: unrelated reads of nanos-timestamped parquet in
    * the same session decode those columns as bigint instead of erroring.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // normalize ts to a session-tz TIMESTAMP whatever the writer encoded:
    // the driver stores raw TIMESTAMP(NANOS) (read as long under
    // nanosAsLong), other writers may store TIMESTAMP or TIMESTAMP_NTZ
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    } else df
  }

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view (for spark.sql users). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  // ---- determinism helpers -------------------------------------------------
  // Double summation is order-dependent, and Spark's shuffle order differs
  // from DuckDB's scan order. Summing through an exact decimal makes the
  // aggregate order-independent, so Spark and the DuckDB oracle agree
  // bit-for-bit after the final round+cast. See SURVEY.md §7.4.

  private val Dec = DecimalType(38, 10)

  /** `size` that stays NULL on a NULL array whatever the
    * `spark.sql.legacy.sizeOfNull` conf says: under the legacy conf a
    * null-text document's token count reads -1 and flows into
    * oracle-compared sums/outputs where DuckDB's `len(NULL)` is NULL.
    * Every oracle-facing token/shingle count reads through this (the
    * TextOps discipline, shared).
    */
  def sizeOrNull(c: Column): Column =
    when(c.isNull, lit(null)).otherwise(size(c))

  /** Deterministic LCG bucket of an id column, overflow-free for EVERY
    * 64-bit id: reduce mod `m` FIRST (floor-mod, so negative ids get a
    * well-defined bucket too), then run the affine step on the bounded
    * residue — `(id·mult + add) mod m ≡ ((id mod m)·mult + add) mod m` in
    * exact arithmetic, so for the ordinary non-negative ids of the driver
    * corpus the bucket is bit-identical to the historical raw form, while
    * an extreme id (a Long.MaxValue sentinel row in a real crawl) no
    * longer overflows the multiply — which Spark 4's default ANSI mode
    * turns into an ARITHMETIC_OVERFLOW that kills the whole scan. Callers
    * must keep `m·mult + add` < 2⁶³ (every graft split uses m ≤ 1e9+7,
    * mult ≤ 48271).
    *
    * The oracle twins spell the identical arithmetic inline (DuckDB's `%`
    * keeps the dividend's sign, so floor-mod is written out):
    * `((id % m + m) % m * mult + add) % m`.
    */
  def lcgBucket(id: Column, mult: Long, add: Long, m: Long): Column =
    (pmod(id, lit(m)) * mult + add) % m

  /** Snapshot key of an on-disk path (a parquet table directory or a
    * single file): canonical path + file count + an MD5 fold of every
    * file's (relative path, length, mtime), walked RECURSIVELY — a
    * partitioned/nested layout (`label=0/part-*.parquet`) contributes its
    * leaf files, not an empty signature an in-place rewrite would never
    * change. The ONE key definition for every per-directory memo in the
    * engine (dupMultForDir, CorpusStats.forDir): a directory regenerated
    * within one JVM — a ScaleUp rerun, a Scratch corpus rewrite — or
    * reached via an aliasing relative path changes the key, so the memo
    * re-probes without anyone calling an invalidation hook. MD5 of the
    * full fold, not String.hashCode: a 32-bit hash can collide between
    * two same-file-count snapshots, silently serving the stale entry the
    * key exists to retire. A missing path keys on the canonical path
    * alone — the subsequent read fails loud.
    */
  def pathSnapshotKey(path: String): String = {
    val root = new java.io.File(path).getCanonicalFile
    // Only symlinked DIRECTORIES are skipped (a link cycle inside a
    // scratch/testdata tree must not turn the memo key into an infinite
    // recursion, or fold an unrelated linked tree into every probe).
    // A symlinked regular FILE — a table staged via linked part-files —
    // is included under its link name with the TARGET's (length, mtime)
    // (File.length/lastModified follow links), so rewriting the link
    // targets changes the key like any in-place rewrite. Depth past 16
    // fails loud: a silently truncated signature would never change on
    // rewrite, exactly the stale-memo hazard the key exists to retire
    // (no graft table layout nests past a few partition levels anyway).
    def walk(f: java.io.File, depth: Int): Seq[java.io.File] =
      if (depth > 16)
        throw new IllegalStateException(
          s"pathSnapshotKey: layout under $root nests past depth 16 at " +
            s"$f — refusing to truncate the snapshot signature")
      else if (f.isDirectory) {
        if (java.nio.file.Files.isSymbolicLink(f.toPath)) Nil
        else Option(f.listFiles())
          .map(_.toSeq.sortBy(_.getName).flatMap(walk(_, depth + 1)))
          .getOrElse(Nil)
      }
      else if (f.isFile) Seq(f)
      else Nil
    val files = walk(root, 0)
    val rootPrefix = root.getPath + java.io.File.separator
    val sig = files
      .map(f => (f.getPath.stripPrefix(rootPrefix), f.length, f.lastModified))
      .sortBy(_._1).mkString(";")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"${root.getPath}#${files.size}#$md5"
  }

  private val MemoSep = "\u0000" // NUL never appears in a canonical path


  /** THE group key for snapshot-keyed per-directory memos — one
    * definition beside the memo machinery it feeds, so the
    * eviction/grouping semantics cannot drift between call sites
    * (the pathSnapshotKey "ONE key definition" rule, applied to the
    * group axis).
    */
  def memoGroup(dir: String): String =
    new java.io.File(dir).getCanonicalPath

  /** Seed `group`'s entry under `key`, retiring the group's prior entries
    * (the ANALYZE post-write seed path).
    */
  def snapshotMemoPut[V](
      cache: scala.collection.concurrent.TrieMap[String, V],
      group: String, key: String, value: V): Unit = {
    // insert FIRST, then retire the group's other entries: the reverse
    // order opens a window where the group is empty and a concurrent
    // reader re-pays a probe for nothing
    val full = group + MemoSep + key
    cache.put(full, value)
    cache.keysIterator
      .filter(k => k.startsWith(group + MemoSep) && k != full)
      .foreach(cache.remove)
  }

  /** Drop every memo entry of `group` (explicit-invalidation twin of the
    * eviction [[snapshotMemo]] performs on a fresh-snapshot miss).
    */
  def snapshotMemoEvict[V](
      cache: scala.collection.concurrent.TrieMap[String, V],
      group: String): Unit =
    cache.keysIterator.filter(_.startsWith(group + MemoSep))
      .foreach(cache.remove)

  /** `getOrElseUpdate` for snapshot-keyed memos with group-scoped
    * eviction: inserting a fresh snapshot's entry RETIRES the
    * group's prior entries (stale snapshots of the same canonical
    * directory) instead of stranding them — a long-lived JVM that
    * regenerates a dir in a loop (ScaleUp reruns, a Scratch sweep
    * rewriting its corpus per arm) would otherwise grow the memo without
    * bound. The group is the canonical dir; the key is the snapshot key.
    * TrieMap iteration is snapshot-consistent, so concurrent
    * evict/insert never corrupts the map. Worst concurrent-rewrite case:
    * a thread that read the directory BEFORE a rewrite can miss on its
    * stale key after a fresh-key entry landed, evict that fresh entry,
    * and insert its stale-keyed value — the next fresh-key caller then
    * re-pays one probe (self-healing: the stale entry is unreachable
    * once every caller sees the new listing, and the group holds one
    * entry either way). Correctness is never at stake — a stale KEY is
    * only ever paired with its own snapshot's VALUE.
    */
  def snapshotMemo[V](cache: scala.collection.concurrent.TrieMap[String, V],
      group: String, key: String)(compute: => V): V = {
    val full = group + MemoSep + key
    cache.get(full) match {
      case Some(v) => v
      case None =>
        // compute FIRST, evict after: a compute that throws (transient
        // FS/read failure) leaves the previously valid entry in place —
        // callers still on the old snapshot keep their memo instead of
        // re-paying the probe for a failure that touched nothing
        val v = cache.getOrElseUpdate(full, compute)
        cache.keysIterator
          .filter(k => k.startsWith(group + MemoSep) && k != full)
          .foreach(cache.remove)
        v
    }
  }

  /** THE driver-side collect for product code: every `.collect()` in the
    * engine routes through here with an explicit cap and label, so "no
    * unbounded driver materialization" is an executable contract instead
    * of a per-round by-hand audit of raw collect sites. The input is cut
    * at `cap + 1` rows BEFORE the action, so a frame that violates its
    * audited bound fails with a named error after materializing at most
    * cap+1 rows — never an opaque driver OOM. The `limit` composes with
    * an ordered-limit input (EliminateLimits folds it into the existing
    * TakeOrderedAndProject), so ordered call sites keep their order.
    * Bench's session-warmup collect is the one deliberate exception
    * (fixed 1-row aggregate, not product code).
    */
  def boundedCollect[T](ds: org.apache.spark.sql.Dataset[T], cap: Int,
      label: String): Array[T] = {
    require(cap > 0 && cap < Int.MaxValue,
      s"boundedCollect($label): cap must be a positive Int, got $cap")
    // A root limit collects via executeTake, which by default probes
    // partitions in sequential 1/4/16/… rounds — on a multi-partition
    // frame that turns the site's former ONE parallel job into a ramp of
    // driver-blocking jobs (the per-job scheduler barrier is the q127
    // floor lesson; edgesUpToCap documents the one-job contract
    // explicitly). Setting initialNumPartitions sky-high for the
    // planning of THIS collect makes executeTake's first round scan
    // every partition — the original single-job shape, now with the
    // cap+1 row cut applied per partition before rows reach the driver.
    val spark = ds.sparkSession
    val key = "spark.sql.limit.initialNumPartitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "1000000") // >= any real partition count
    val rows =
      try ds.limit(cap + 1).collect()
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    if (rows.length > cap)
      throw new IllegalStateException(
        s"boundedCollect($label): more than $cap rows reached the " +
          "driver — the frame this site audited as bounded is not; " +
          "shard or redesign before raising the cap")
    rows
  }

  /** [[pathSnapshotKey]] of one testdata table under `dir`. */
  def tableSnapshotKey(dir: String, name: String): String =
    pathSnapshotKey(s"$dir/$name.parquet")

  /** Order-independent 2dp sum of a double column (oracle-stable). */
  def dsum(c: Column): Column = round(sum(c.cast(Dec)), 2).cast("double")

  /** Order-independent average, rounded to `scale` dp (oracle-stable). */
  def davg(c: Column, scale: Int = 4): Column =
    round(sum(c.cast(Dec)).cast("double") / count(c), scale)

  /** SQL twin of [[dsum]] for the DuckDB oracle string. */
  def sqlDsum(x: String): String =
    s"CAST(round(sum(CAST($x AS DECIMAL(38,10))), 2) AS DOUBLE)"

  /** SQL twin of [[davg]]. */
  def sqlDavg(x: String, scale: Int = 4): String =
    s"round(CAST(sum(CAST($x AS DECIMAL(38,10))) AS DOUBLE) / count($x), $scale)"
}
