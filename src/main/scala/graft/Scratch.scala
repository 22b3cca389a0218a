package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev scratchpad for plan inspection (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf — saved-table modes (bucketchain) park their metastore
      // and data under /tmp, never the repo working dir
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("scratch-wh").toString)
      .config("spark.sql.catalogImplementation", "in-memory")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SCRATCH_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val name = args.headOption.getOrElse("q37")
    if (name == "ingest") {
      // live end-to-end smoke: rate source → JSON wire → parse → dedup →
      // idempotent parquet sink, running real micro-batches for a few
      // seconds (the self-contained twin of the Kafka deployment)
      val sink = java.nio.file.Files.createTempDirectory("live-sink").toString
      val ckpt = java.nio.file.Files.createTempDirectory("live-ckpt").toString
      val q = streaming.IngestPipeline.runIngest(spark,
        streaming.TradeSource.rate(spark, rowsPerSecond = 200), sink, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      // poll for the first committed batch (processAllAvailable never
      // returns on an unbounded rate source), then let one more tick land
      val deadline = System.currentTimeMillis() + 60000
      def committedBatches: Int = Option(new java.io.File(sink).listFiles())
        .map(_.count(_.getName.startsWith("batch_id="))).getOrElse(0)
      while (committedBatches < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(500)
      q.stop()
      val out = spark.read.parquet(sink)
      println(s"[live] rows=${out.count()} distinct=${out.select("trade_id").distinct().count()}" +
        s" batches=${out.select("batch_id").distinct().count()}")
      spark.stop()
      return
    }
    if (name == "tokstore") {
      // incremental-path datapoint: drift / perplexity answered from the
      // persisted count stores vs recomputed from the raw corpus. The
      // store paths must not touch documents at all (model side), so the
      // gap widens with corpus size while the store stays vocab-bounded.
      import org.apache.spark.sql.functions._
      val d = Tables.t(spark, dir, "documents")
      println(s"docs = ${d.count()}")
      val root = java.nio.file.Files.createTempDirectory("tokstore").toString
      time("write_token_count_store")(
        { ops.TextOps.writeTokenCountStore(d, s"$root/tokens"); 0L })
      time("write_bigram_store")(
        { ops.SearchOps.writeBigramStore(d, s"$root/bigrams"); 0L })
      time("drift_raw")(ops.TextOps.sourceDriftOn(d).count())
      time("drift_from_store")(
        ops.TextOps.sourceDriftFromStore(spark, s"$root/tokens").count())
      // perplexity scores an incoming batch (20% slice) — raw pays the
      // full model recompute over the whole corpus, store reads counts
      val incoming = d.filter((col("doc_id") * 48271L + 23L) % 100L >= 80L)
      time("ppl_raw_full_corpus")(ops.SearchOps.lmPerplexityOn(d).count())
      time("ppl_batch_from_store")(
        ops.SearchOps.lmPerplexityFromStore(incoming, s"$root/bigrams")
          .count())
      spark.stop()
      return
    }
    if (name == "dsirstore") {
      // incremental DSIR datapoint: the LM side comes from the persisted
      // token-count store (built once, source := lang so the q124 target
      // predicate becomes a source predicate); scoring a 20% batch then
      // never touches `documents` — verified on the executed plan, not
      // just asserted.
      import org.apache.spark.sql.functions._
      val d = Tables.t(spark, dir, "documents")
      println(s"docs = ${d.count()}")
      val root = java.nio.file.Files.createTempDirectory("dsirstore").toString
      time("write_token_count_store_lang")(
        { ops.TextOps.writeTokenCountStore(
          d.select(col("lang").as("source"), col("text")), s"$root/tokens")
          0L })
      // the incoming crawl batch is EXTERNAL data in production — land the
      // 20% slice as its own parquet so the scored plan can prove it
      // never reads the corpus table
      d.filter((col("doc_id") * 48271L + 23L) % 100L >= 80L)
        .write.parquet(s"$root/incoming")
      val batch = spark.read.parquet(s"$root/incoming")
      time("dsir_raw_full_corpus")(
        ops.CurationOps.dsirWeightsOn(d, col("lang") === "en").count())
      val fromStore = ops.CurationOps.dsirWeightsFromStore(batch, spark,
        s"$root/tokens", col("source") === "en")
      time("dsir_batch_from_store")(fromStore.count())
      time("dsir_batch_from_store_again")(fromStore.count())
      val scans = fromStore.queryExecution.executedPlan.toString()
        .linesIterator.filter(_.toLowerCase.contains("scan"))
        .map(_.trim.take(160)).mkString("\n")
      println(s"[plan] store-path scans:\n$scans")
      require(scans.nonEmpty, "plan probe matched no scan nodes")
      println(s"[plan] touches documents.parquet: " +
        s"${scans.contains("documents")}")
      spark.stop()
      return
    }
    if (name == "doremistore") {
      // incremental DoReMi datapoint: the bigram LM comes from the
      // persisted store (built once); recomputing mix weights for a crawl
      // batch then never touches `documents` — verified on the executed
      // plan like the dsirstore probe.
      import org.apache.spark.sql.functions._
      val d = Tables.t(spark, dir, "documents")
      println(s"docs = ${d.count()}")
      val root = java.nio.file.Files.createTempDirectory("doremistore").toString
      time("write_bigram_store")(
        { ops.SearchOps.writeBigramStore(d, s"$root/bigrams"); 0L })
      d.filter((col("doc_id") * 48271L + 23L) % 100L >= 80L)
        .select("doc_id", "source", "text")
        .write.parquet(s"$root/incoming")
      val batch = spark.read.parquet(s"$root/incoming")
      time("doremi_raw_full_corpus")(
        ops.CurationOps.doremiWeightsOn(d).count())
      val fromStore = ops.CurationOps.doremiFromStore(batch, s"$root/bigrams")
      time("doremi_batch_from_store")(fromStore.count())
      time("doremi_batch_from_store_again")(fromStore.count())
      val scans = fromStore.queryExecution.executedPlan.toString()
        .linesIterator.filter(_.toLowerCase.contains("scan"))
        .map(_.trim.take(160)).mkString("\n")
      println(s"[plan] store-path scans:\n$scans")
      require(scans.nonEmpty, "plan probe matched no scan nodes")
      println(s"[plan] touches documents.parquet: " +
        s"${scans.contains("documents")}")
      spark.stop()
      return
    }
    if (name == "mixgov") {
      // streaming mix-governor datapoint: replay the foreachBatch body
      // (token segment + DoReMi partials + report) over K successive
      // crawl slices and time the REPORT recompute per batch — the claim
      // under test is that per-batch cost stays flat as the stores grow
      // (report reads are |sources|·|vocab| + |sources|·|batches|
      // bounded, never corpus-sized).
      import org.apache.spark.sql.functions._
      val d = Tables.t(spark, dir, "documents")
      println(s"docs = ${d.count()}")
      val root = java.nio.file.Files.createTempDirectory("mixgov").toString
      time("seed_frozen_lm")(
        { ops.SearchOps.writeBigramStore(d, s"$root/lm"); 0L })
      val k = 5
      (0 until k).foreach { i =>
        val slice = d.filter(pmod(col("doc_id") * 48271L + 23L, lit(k.toLong))
          === i.toLong)
        time(s"batch_${i}_token_segment")(
          { ops.TextOps.writeTokenCountBatch(slice, s"$root/tokens", i); 0L })
        time(s"batch_${i}_doremi_partials")(
          { ops.CurationOps.doremiBatchPartials(slice, s"$root/lm")
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$root/partials/batch_id=$i"); 0L })
        time(s"batch_${i}_report")(
          streaming.MixGovernorPipeline.mixReport(spark, s"$root/tokens",
            s"$root/partials").count())
      }
      time("compact_partials")(
        { ops.CurationOps.compactDoremiPartials(spark, s"$root/partials"); 0L })
      time("report_post_compact")(
        streaming.MixGovernorPipeline.mixReport(spark, s"$root/tokens",
          s"$root/partials").count())
      spark.stop()
      return
    }
    if (name == "crawlstore") {
      // incremental crawl-index datapoints: the 80% "already indexed" side
      // seeds the shingle store once; the 20% batch then probes/appends
      // with NO access to the indexed corpus. Bloom refresh reads the
      // store's key table (distinct-shingle-sized, not corpus-sized).
      import org.apache.spark.sql.functions._
      val d = Tables.t(spark, dir, "documents")
      println(s"docs = ${d.count()}")
      val existing = (col("doc_id") * 48271L + 23L) % 100L < 80L
      val indexed = d.filter(existing)
      val batch = d.filter(!existing)
      val root = java.nio.file.Files.createTempDirectory("crawlstore").toString
      time("write_shingle_store_80pct")(
        { ops.SpanOps.writeShingleStore(indexed, s"$root/sh"); 0L })
      println(s"store keys = ${spark.read.parquet(s"$root/sh").count()}")
      time("bloom_from_store")(
        { ops.SpanOps.writeBloomStoreFromShingles(spark, s"$root/sh",
          s"$root/bl", nBits = 1 << 27); 0L })
      time("dup_spans_batch_vs_store")(
        ops.SpanOps.dupSpansAgainstStore(batch, s"$root/sh").count())
      time("novelty_batch_vs_store")(
        ops.SpanOps.noveltyAgainstStore(batch, s"$root/sh").count())
      time("append_batch_to_store")(
        { ops.SpanOps.appendToShingleStore(batch, s"$root/sh"); 0L })
      time("compact_store")(
        { ops.SpanOps.compactShingleStore(spark, s"$root/sh"); 0L })
      spark.stop()
      return
    }
    if (name == "mvstore") {
      // media/vector index datapoints: PQ codes and phash fingerprints
      // persist once; incremental search/screen touches only the stores.
      import org.apache.spark.sql.functions._
      val e = Tables.t(spark, dir, "embeddings")
      val d = Tables.t(spark, dir, "documents")
      println(s"vectors = ${e.count()}  docs = ${d.count()}")
      val root = java.nio.file.Files.createTempDirectory("mvstore").toString
      var cb: Array[Array[Double]] = null
      time("kmeans_codebook_k16x3")(
        { cb = ops.SimilarityOps.kmeansCentroids(e, k = 16, iters = 3); 0L })
      time("write_pq_store")(
        { ops.SimilarityOps.writePqStore(e, cb, s"$root/pq"); 0L })
      val q = e.filter(col("vec_id") === 0L)
        .select("embedding").head().getSeq[Float](0).toArray
      time("ann_pq_from_store")(
        ops.SimilarityOps.annPqFromStore(spark, s"$root/pq", cb, q,
          excludeId = 0L).count())
      time("ann_pq_from_store_again")(
        ops.SimilarityOps.annPqFromStore(spark, s"$root/pq", cb, q,
          excludeId = 0L).count())
      time("ann_pq_inline_rebuild")(
        ops.SimilarityOps.annPqWith(e, cb).count())
      val existing = (col("doc_id") * 48271L + 23L) % 100L < 80L
      time("write_phash_store_80pct")(
        { ops.MultimodalOps.writePhashStore(d.filter(existing),
          s"$root/ph"); 0L })
      time("phash_screen_20pct_batch")(
        ops.MultimodalOps.phashPairsAgainstStore(d.filter(!existing),
          s"$root/ph").count())
      spark.stop()
      return
    }
    if (name == "manifest") {
      // q122 scale datapoints: the distributed-rank manifest (exact global
      // positions) and the writeOrdered shard export on the same hash key.
      import org.apache.spark.sql.functions._
      val d = Tables.t(spark, dir, "documents")
      println(s"docs = ${d.count()}")
      val shardSize = 4096
      def manifest = ops.CurationOps.trainingManifestOn(d, shardSize)
      manifest.count() // warm the scan
      // forced: fold every output column so nothing prunes away
      time("manifest_forced") {
        // bit_xor: overflow-free under ANSI, still touches every column
        manifest.select(xxhash64(col("doc_id"), col("source"), col("pos"),
          col("shard")).as("x")).agg(expr("bit_xor(x)")).head()
        0L
      }
      val outDir = java.nio.file.Files
        .createTempDirectory("manifest-shards").toString + "/shards"
      val nShards = ((d.count() + shardSize - 1) / shardSize).toInt
      time("write_ordered_shards") {
        ops.ScaleOps.writeOrdered(
          d.withColumn("_h", md5(concat(lit("graft-order:"),
            col("doc_id").cast("string")))),
          outDir, Seq(col("_h"), col("doc_id")), nShards)
        0L
      }
      println(s"shards = $nShards")
      spark.stop()
      return
    }
    if (name == "prof48") {
      // component timing of the q33/q48 scoring pass: which term costs?
      import org.apache.spark.sql.functions._
      val d = Tables.t(spark, dir, "documents")
      def probe(label: String)(c: org.apache.spark.sql.Column): Unit =
        time(label) {
          d.withColumn("toks", split(trim(col("text")), " "))
            .agg(sum(c)).head()
          0L
        }
      probe("baseline_len")(length(col("text")))
      probe("split_size")(size(col("toks")))
      probe("distinct")(size(array_distinct(col("toks"))))
      probe("translate")(length(translate(col("text"), " ", "")))
      probe("punct_regex")(
        length(regexp_replace(col("text"), "[^a-zA-Z0-9 ]", "")))
      probe("extract_all")(
        size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0))))
      probe("q31_re_tokens")(
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))))
      probe("q59_extract")(
        size(regexp_extract_all(col("text"),
          lit("\\b(table|value|key)\\b"), lit(0))))
      probe("q59_replace")(
        length(regexp_replace(col("text"),
          "\\b(table|value|key)\\b", "[MASKED]")))
      probe("q36_norm")(
        length(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      spark.stop()
      return
    }
    if (name == "bucketchain") {
      // the TPC-H chain (q21/q22/q76/q98 all re-derive the lineitem →
      // per-order contraction) on plain parquet vs the bucketed layout:
      // lineitem bucketed on l_orderkey + orders on o_orderkey pays the
      // fact shuffles once at write; every chain query then plans its
      // contraction and fact join exchange-free. Reports write cost and
      // per-query warm timings for both layouts.
      import ops.{RelationalOps, ScaleOps}
      val li = Tables.t(spark, dir, "lineitem")
      val o = Tables.t(spark, dir, "orders")
      val c = Tables.t(spark, dir, "customer")
      val n = Tables.t(spark, dir, "nation")
      val r = Tables.t(spark, dir, "region")
      val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "32").toInt
      time("write_bucketed") {
        ScaleOps.writeBucketed(li, "li_bkt", "l_orderkey", buckets)
        ScaleOps.writeBucketed(o, "ord_bkt", "o_orderkey", buckets)
        0L
      }
      val (lb, ob) = (spark.table("li_bkt"), spark.table("ord_bkt"))
      def chain(liT: DataFrame, oT: DataFrame): Seq[(String, DataFrame)] = Seq(
        "q21" -> RelationalOps.topCustomerRevenueOn(liT, oT, c),
        "q22" -> RelationalOps.regionRevenueOn(liT, oT, c, n, r),
        "q76" -> RelationalOps.revenueCubeOn(liT, oT, c, n, r),
        "q98" -> RelationalOps.revenueShareOn(liT, oT, c, n, r))
      for ((qn, df) <- chain(li, o)) {
        df.count() // warm
        time(s"${qn}_plain")(df.count())
      }
      for ((qn, df) <- chain(lb, ob)) {
        df.count() // warm
        time(s"${qn}_bucketed")(df.count())
      }
      spark.stop()
      return
    }
    if (name == "datechain") {
      // the scan-side twin of bucketchain: events partitioned by event day
      // (ScaleOps.writePartitioned), then the dashboard-style recent-window
      // queries — the reference re-scans the WHOLE table ordered by
      // timestamp on every poll (dashboard.py:28); with a date-partitioned
      // layout the same queries prune to the matching directories and the
      // scan cost tracks the window, not the corpus. Reports the one-time
      // write cost and warm plain-vs-pruned timings; row equality asserted.
      import org.apache.spark.sql.functions._
      import ops.EventOps
      val ev = Tables.t(spark, dir, "events")
      val pdir = java.nio.file.Files.createTempDirectory("events-bydate")
        .toString
      time("write_partitioned") {
        ops.ScaleOps.writePartitioned(
          ev.withColumn("event_date", to_date(col("ts"))), pdir, "event_date")
        0L
      }
      val part = spark.read.parquet(pdir)
      val maxDay = ev.agg(max(to_date(col("ts")))).head().getDate(0)
      println(s"last day = $maxDay, " +
        s"days = ${part.select("event_date").distinct().count()}")
      val cases: Seq[(String, DataFrame => DataFrame)] = Seq(
        "q01_recent" -> (df => EventOps.recentEventsOn(df)),
        "q06_minutely" -> (df => EventOps.minutelyTimeseriesOn(df)),
        "q02_kpi" -> (df => EventOps.kpiOverviewOn(df)))
      // scan volume is the scale-invariant evidence (wall-clock at 10M
      // rows understates a 100 TB win): execute the query's OWN plan and
      // read the scan node's numFiles/filesSize metrics
      // by-name: the plan must be BUILT with AQE off or the adaptive root
      // hides the scan node (and its metrics) from collectLeaves
      def scanned(build: => DataFrame): String = {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          val qe = build.queryExecution
          qe.executedPlan.execute().count()
          val m = qe.executedPlan.collectLeaves().head.metrics
          def v(k: String) = m.get(k).map(_.value).getOrElse(-1L)
          s"files=${v("numFiles")} bytes=${v("filesSize")}"
        } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      for ((qn, f) <- cases) {
        val plain = f(ev.filter(to_date(col("ts")) === lit(maxDay)))
        val pruned = f(part.filter(col("event_date") === lit(maxDay)))
        assert(plain.count() == pruned.count(), qn) // also warms both
        time(s"${qn}_lastday_plain")(plain.count())
        time(s"${qn}_lastday_pruned")(pruned.count())
        println(s"${qn} scan: plain " +
          scanned(f(ev.filter(to_date(col("ts")) === lit(maxDay)))) +
          " | pruned " +
          scanned(f(part.filter(col("event_date") === lit(maxDay)))))
      }
      spark.stop()
      return
    }
    if (name == "decision") {
      // 1000×-extrapolation spot check for the contracted dedup arms:
      // dedupDecision (the schema-stable dispatch target) per method, on
      // whatever SCRATCH_DIR points at (built via ScaleUp with the
      // documents,embeddings subset). Reports wall-clock + cluster count;
      // compare against the 100× sweep for linear-ish scaling.
      graft.functions.GraftFunctions.ensureRegistered(spark)
      val d = Tables.t(spark, dir, "documents")
      println(s"docs = ${d.count()}")
      for (m <- args.drop(1) match {
        case Array() => Seq("jaccard", "simhash", "minhash")
        case ms => ms.toSeq
      }) {
        val out = ops.DedupOps.dedupDecision(d, method = m)
        time(s"decision_$m")(out.count())
        time(s"decision_${m}_again")(
          ops.DedupOps.dedupDecision(d, method = m).count())
      }
      spark.stop()
      return
    }
    if (name == "skewjoin") {
      // joinSkewAware under real skew: ~80% of event rows collapse onto one
      // hot key (deterministic, no rand), dim = one row per key. Broadcast
      // is disabled to simulate the non-broadcastable-dim regime — the only
      // one where salting matters (a broadcast join never shuffles the
      // fact, so a hot key spreads across map tasks for free). Compares the
      // straggler (plain sort-merge, AQE off), AQE's runtime skew split,
      // and the stats-dispatched salted join.
      import org.apache.spark.sql.functions._
      import ops.ScaleOps
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ev = Tables.t(spark, dir, "events")
      val fact = ev.select(
        when(pmod(col("user_id"), lit(10)) < 8, lit(0L))
          .otherwise(col("user_id")).as("k"),
        col("value")).localCheckpoint(true)
      val dim = fact.select("k").distinct()
        .withColumn("attr", col("k") * 2).localCheckpoint(true)
      val st = ScaleOps.KeySkewStats.compute(fact, "k")
      println(f"stats = $st skewRatio=${st.skewRatio}%.1f " +
        s"salts=${ScaleOps.saltsFor(st, 200000, 32)}")
      def measure(label: String)(df: => DataFrame): Unit = {
        df.count() // warm
        time(label)(df.count())
      }
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      measure("plain_noaqe")(fact.join(dim, "k"))
      measure("salted_noaqe")(ScaleOps.joinSkewAware(fact, dim, "k",
        hotKeyRows = 200000, stats = Some(st)))
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      measure("plain_aqe")(fact.join(dim, "k"))
      measure("salted_aqe")(ScaleOps.joinSkewAware(fact, dim, "k",
        hotKeyRows = 200000, stats = Some(st)))
      spark.stop()
      return
    }
    if (name == "splitaudit") {
      // incremental split-audit datapoint (the doremistore convention):
      // the held-out 5-gram store is seeded once from the corpus's held
      // split; scoring an incoming train batch then reads ONLY the batch
      // and the store — verified on the executed plan, vs the full-corpus
      // q130 recompute.
      import org.apache.spark.sql.functions._
      val d = Tables.t(spark, dir, "documents")
      println(s"docs = ${d.count()}")
      val root = java.nio.file.Files.createTempDirectory("splitaudit").toString
      val split = ops.CurationOps.withDefaultSplit(d)
      time("seed_held_store")({
        ops.CurationOps.heldoutNgramsOn(
          split.filter(col("split") =!= "train"))
          .write.parquet(s"$root/held/batch_id=0"); 0L })
      // the incoming crawl batch is EXTERNAL data in production — land a
      // 1% train slice as its own parquet so the scored plan can prove it
      // never reads the corpus table
      // modulus coprime to the scale-up key span (5000-aligned copies):
      // % 100 would pick the SAME base docs in every copy (one source)
      split.filter(col("split") === "train")
        .filter((col("doc_id") * 48271L + 23L) % 97L === 0L)
        .select("doc_id", "source", "text")
        .write.parquet(s"$root/incoming")
      val batch = spark.read.parquet(s"$root/incoming")
      println(s"batch = ${batch.count()}")
      time("q130_full_corpus")(ops.CurationOps.splitLeakageOn(d).count())
      val fromStore = ops.CurationOps.leakageRollup(
        ops.CurationOps.decontaminationAgainstStore(batch, s"$root/held"))
      time("audit_batch_from_store")(fromStore.count())
      time("audit_batch_from_store_again")(fromStore.count())
      val scans = fromStore.queryExecution.executedPlan.toString()
        .linesIterator.filter(_.toLowerCase.contains("scan"))
        .map(_.trim.take(160)).mkString("\n")
      println(s"[plan] store-path scans:\n$scans")
      require(scans.nonEmpty, "plan probe matched no scan nodes")
      println(s"[plan] touches documents.parquet: " +
        s"${scans.contains("documents")}")
      spark.stop()
      return
    }
    if (name == "q132dup") {
      // dup-dense q132 datapoint: the scale-up corpora replicate every
      // embedding N× (copies straddle the split), so the gated direct
      // scan's LSH cells carry the full copy mass — measure the forced
      // arms and the dispatcher's own pick side by side
      val e = Tables.t(spark, dir, "embeddings")
      println(s"vectors = ${e.count()}")
      def audit(tag: String, maxDupMult: Long): Unit =
        time(tag)(ops.SimilarityOps.semanticLeakageOn(e,
          maxDupMult = maxDupMult).count())
      audit("contracted", 0L)
      audit("contracted-again", 0L)
      audit("dispatched", ops.SimilarityOps.MaxDupMult)
      audit("direct-gated", Long.MaxValue)
      spark.stop()
      return
    }
    if (name == "q127stage") {
      // per-stage timing of q127 contrastive triplets (r10 bench watch
      // item: best-of-18 floor rose 19% vs r8 quiet while its dominant
      // q44 component got FASTER). Times each stage the bench's way
      // (count(), best-of-N) so a floor rise localizes to (a) the q44
      // all-NN pass, (b) the global rank ladder, or (c) the rotation
      // join in isolation (checkpointed inputs), instead of reading as
      // "q127 got slower".
      import org.apache.spark.sql.functions._
      graft.functions.GraftFunctions.ensureRegistered(spark)
      val reps = args.lift(1).map(_.toInt).getOrElse(5)
      val e = Tables.t(spark, dir, "embeddings")
      println(s"vectors = ${e.count()}  reps = $reps")
      // jobs-per-execution is the load-sensitivity number: each Spark job
      // is a scheduler barrier, so a query's floor inflates by (per-job
      // overhead × #jobs) on a busy box — q127 pays the most jobs of the
      // watched set (eager rank checkpoint + broadcasts)
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); ()
          }
        })
      def best(tag: String)(f: => Long): Unit = {
        val runs = (1 to reps).map { _ =>
          spark.sharedState.cacheManager.clearCache()
          val j0 = jobs.get()
          val t0 = System.nanoTime()
          val n = f
          ((System.nanoTime() - t0) / 1e9, n, jobs.get() - j0)
        }
        // jobs: first rep (includes one-time memo-warming probes) AND
        // the steady state the floor model should use
        println(f"$tag rows=${runs.head._2} jobs=${runs.head._3}" +
          f"/steady=${runs.last._3} best=${runs.map(_._1).min}%.3f" +
          s" all=[${runs.map(r => f"${r._1}%.2f").mkString(",")}]")
      }
      def ladder = ops.ScaleOps.withGlobalRowNumber(
        e.select(col("vec_id")), Seq(col("vec_id")), "rk",
        totalOut = Some("n"))
      best("stage_a_nn_pass_q44")(ops.SimilarityOps.nnDedupOn(e).count())
      best("stage_b_rank_ladder")(ladder.count())
      // rotation pairing alone: both inputs pre-materialized so only the
      // explode-pair aggregation + the NN join + filter are on the clock
      val pos = ops.SimilarityOps.nnDedupOn(e).localCheckpoint(true)
      val ranked = ladder.localCheckpoint(true)
      best("stage_c_rotation_pair") {
        val d = when(lit(48271L) % col("n") === 0, 48270L).otherwise(48271L)
        val pairs = ranked
          .select(explode(array(
            struct(col("rk").as("k"), col("vec_id").as("aid"),
              lit(null).cast("long").as("neg_id")),
            struct((pmod(col("rk") - 1L - d, col("n")) + 1L).as("k"),
              lit(null).cast("long").as("aid"),
              col("vec_id").as("neg_id")))).as("r"))
          .select(col("r.*"))
          .groupBy("k")
          .agg(max("aid").as("aid"), max("neg_id").as("neg_id"))
        pos.join(pairs, col("vec_id") === col("aid"))
          .filter(col("neg_id") =!= col("vec_id") &&
            col("neg_id") =!= col("nn_id"))
          .count()
      }
      best("full_q127")(
        ops.SimilarityOps.contrastiveTriplets(spark, dir).count())
      best("control_q44")(ops.SimilarityOps.nnDedup(spark, dir).count())
      // per-job scheduler overhead: 18 trivial jobs back-to-back — q127's
      // floor ≈ stage compute + (this / 18) × its job count, which is why
      // the MOST-jobs query of the watched set is also the most
      // load-sensitive one
      best("overhead_18_empty_jobs") {
        var i = 0
        while (i < 18) { spark.range(1).count(); i += 1 }
        18L
      }
      spark.stop()
      return
    }
    // jobs-per-query census over the whole catalog: each Spark job is a
    // scheduler barrier (~tens of ms on this box, a cluster-wide sync
    // point on a real fleet), so an outsized count marks a query that
    // is (a) the most box-noise-sensitive in the bench and (b) worth a
    // structural look for double-computed subtrees — the pattern the
    // q127 decomposition caught (a rank frame joined twice replayed its
    // whole post-checkpoint branch). Runs each query twice and reports
    // the SECOND run's count (first pays memo-warming probes).
    // SparkListener events ride the ASYNC AsyncEventQueue: a counter read
    // right after count() races late deliveries, which only printed odd
    // numbers while the census was informational but would flake the
    // jobbudget GATE (spurious red, or masked creep). waitUntilEmpty is
    // private[spark] — reflection, with a settle-sleep fallback.
    def drainListenerBus(): Unit = {
      val sc = spark.sparkContext
      try {
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethods.find(m =>
          m.getName == "waitUntilEmpty" && m.getParameterCount == 0) match {
          case Some(m) => m.invoke(bus); ()
          case None => Thread.sleep(300)
        }
      } catch { case _: ReflectiveOperationException => Thread.sleep(300) }
    }
    def runJobCensus(): Seq[(String, Int, Double)] = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); ()
          }
        })
      SparkEntry.queries.toSeq.sortBy(_._1).map {
        case (qn, fn) =>
          def once(): (Int, Double) = {
            spark.sharedState.cacheManager.clearCache()
            drainListenerBus()
            val j0 = jobs.get(); val t0 = System.nanoTime()
            fn(spark, dir).count()
            drainListenerBus()
            (jobs.get() - j0, (System.nanoTime() - t0) / 1e9)
          }
          once()
          val (j, sec) = once()
          (qn, j, sec)
      }
    }
    if (name == "jobcensus") {
      val counts = runJobCensus()
      counts.sortBy(-_._2).foreach { case (qn, j, sec) =>
        println(f"$qn%-28s jobs=$j%3d warm=$sec%6.2f s")
      }
      val total = counts.map(_._2).sum
      println(f"TOTAL jobs=$total over ${counts.size} queries " +
        f"(mean ${total.toDouble / counts.size}%.1f)")
      spark.stop()
      return
    }
    if (name == "jobbudget") {
      // the census, turned into a GATE (r11 judge item 6): every catalog
      // query carries a recorded job budget (JOB_BUDGETS.json, regenerated
      // by this arm with `jobbudget <sfDir> write`); a query exceeding its
      // budget by more than 2 fails loud — the q127 class (silent
      // per-execution job creep from a replayed subtree) cannot recur
      // unobserved. Drops are reported so the ledger can ratchet.
      val budgetFile = new java.io.File("JOB_BUDGETS.json")
      // a GATE must not self-disarm: a missing ledger in gate mode (wrong
      // cwd, deleted file) fails loud — only the explicit `write` arg
      // regenerates (r12 review finding)
      if (!args.lift(2).contains("write") && !budgetFile.exists())
        sys.error(s"jobbudget: ${budgetFile.getAbsolutePath} not found — " +
          "run from the repo root, or regenerate with " +
          "`jobbudget <dir> write`")
      val counts = runJobCensus()
      if (args.lift(2).contains("write")) {
        val json = counts.sortBy(_._1).map { case (qn, j, _) =>
          s"""  "$qn": $j""" }.mkString("{\n", ",\n", "\n}\n")
        java.nio.file.Files.write(budgetFile.toPath,
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"wrote ${counts.size} budgets to $budgetFile")
        spark.stop()
        return
      }
      val budgets = {
        val txt = new String(
          java.nio.file.Files.readAllBytes(budgetFile.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        """"(q\w+)":\s*(\d+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toInt).toMap
      }
      val over = counts.filter { case (qn, j, _) =>
        budgets.get(qn).exists(b => j > b + 2) }
      val missing = counts.filterNot { case (qn, _, _) => budgets.contains(qn) }
      val dropped = counts.filter { case (qn, j, _) =>
        budgets.get(qn).exists(b => j < b) }
      dropped.foreach { case (qn, j, _) =>
        println(f"$qn%-28s jobs=$j%3d (budget ${budgets(qn)}%3d) — " +
          "improved; ratchet with `jobbudget <dir> write`") }
      missing.foreach { case (qn, j, _) =>
        println(f"$qn%-28s jobs=$j%3d NEW (no budget) — record it") }
      if (over.nonEmpty) {
        over.foreach { case (qn, j, _) =>
          println(f"$qn%-28s jobs=$j%3d EXCEEDS budget ${budgets(qn)}%3d " +
            "+2 — find the replayed subtree or document in PLANS.md") }
        spark.stop()
        sys.exit(1)
      }
      println(s"job budgets OK: ${counts.size} queries within budget+2" +
        (if (missing.nonEmpty) s"; ${missing.size} NEW unrecorded" else ""))
      spark.stop()
      return
    }
    // shared by the canary and timeq arms: prefix -> catalog query, and
    // the cleared-cache cold/warm timing body — ONE definition so the
    // two arms can never measure different things
    def resolveQuery(prefix: String,
        arm: String): (String, (SparkSession, String) => DataFrame) =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .find(_._1.startsWith(prefix + "_"))
        .orElse(SparkEntry.queries.find(_._1 == prefix))
        .getOrElse(sys.error(s"$arm $prefix not in catalog"))
    def timeOnce(fn: (SparkSession, String) => DataFrame): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    if (name == "timeq") {
      // one-off cold+warm timing of a single catalog query against
      // SCRATCH_DIR — the canary harness for queries outside the
      // standing set (6M-vector trained-face datapoints, ad-hoc
      // adjudication): `SCRATCH_DIR=<dir> Scratch timeq q151`
      val prefix = args.lift(1).getOrElse(sys.error("timeq <queryPrefix>"))
      val (qn, fn) = resolveQuery(prefix, "timeq")
      val cold = timeOnce(fn); val warm = timeOnce(fn)
      println(f"$qn%-28s cold $cold%6.2f s  warm $warm%6.2f s")
      spark.stop()
      return
    }
    if (name == "canary") {
      // the standing 100× scale-canary set (r11 judge item 5): ten
      // queries spanning the catalog's distinct shuffle shapes, run
      // cold + warm against whatever corpus SCRATCH_DIR points at
      // (build one with `graft.ScaleUp /root/testdata/sf0.01 <dst> 100`).
      // One table per round in PLANS.md; a >25% cold regression vs the
      // prior round's table is explained or fixed, not shrugged at.
      val canaries = Seq(
        "q102" -> "span explode + gap stitch",
        "q107" -> "persisted store probe",
        "q121" -> "winnowing fingerprint join",
        "q127" -> "contrastive triplets (rank zip)",
        "q65" -> "Aho–Corasick decontamination",
        "q44" -> "NN dedup (dispatch-probed)",
        "q46" -> "connected-components clusters",
        "q81" -> "BM25 scoring",
        "q124" -> "DSIR importance weights",
        "q131" -> "DoReMi mix weights",
        // r12 addition: the probe-set BNLJ + cell-fanout shape is new
        "q135" -> "IVF recall eval (probe fan-out)",
        // r13 addition: the quartet's one-pass topk-aggregate shape
        "q139" -> "RP recall eval (topk aggregate)",
        // r14 addition: the t-closeness class×band grid (checkpointed
        // contraction + null-safe joins + per-class cumulative windows)
        "q145" -> "t-closeness EMD grid")
      println(f"${"query"}%-28s ${"shape"}%-34s cold_s  warm_s")
      canaries.foreach { case (prefix, shape) =>
        val (qn, fn) = resolveQuery(prefix, "canary")
        // a partial corpus (documents-only 1000× sweeps) skips the
        // canaries whose tables are absent instead of aborting the set
        try {
          val cold = timeOnce(fn); val warm = timeOnce(fn)
          println(f"$qn%-28s $shape%-34s $cold%6.2f  $warm%6.2f")
        } catch {
          case e: Exception =>
            println(f"$qn%-28s $shape%-34s SKIP (${e.getClass.getSimpleName})")
        }
      }
      spark.stop()
      return
    }
    if (name == "storegate") {
      // the store-equivalence gate (r14 judge item 3): every persisted
      // store family runs its LIVED crawl sequence — build from crawl 1,
      // fold crawl 2 in through the append/merge face (replaying the
      // append where the family documents replay-tolerance), compact —
      // and each from-store consumer must answer EXACTLY like the inline
      // computation over the whole corpus (or like a store rebuilt fresh
      // from it, for faces whose only contract is store-in/store-out).
      // The sbt-test twins pin each equality in isolation on synthetic
      // rows; this arm proves the whole layer on a real corpus in one
      // driver-visible PASS/FAIL line, wired into `sbt gates`.
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val docsAll = Tables.t(spark, dir, "documents")
        .select("doc_id", "source", "lang", "text")
      val isC1 = Tables.lcgBucket(col("doc_id"), 48271L, 23L, 100L) < 80L
      val c1 = docsAll.filter(isC1)
      val c2 = docsAll.filter(!isC1)
      // a cross-crawl probe batch (10%, independent multiplier) so every
      // probe face matches against BOTH seeded and appended segments
      val probe = docsAll.filter(
        Tables.lcgBucket(col("doc_id"), 9301L, 11L, 100L) < 10L)
      val root = java.nio.file.Files.createTempDirectory("storegate")
        .toString
      var failures = List.empty[String]
      var nOk = 0
      def gate(family: String)(body: => Unit): Unit =
        try { body; nOk += 1; println(s"[storegate] $family OK") }
        catch { case scala.util.control.NonFatal(e) =>
          failures ::= s"$family: ${e.getMessage}"
          println(s"[storegate] $family FAILED: ${e.getMessage}")
        }
      // bounded by contract: every gate frame is an audit/top-k/
      // per-source contraction, far under the cap (the grep audit in
      // BoundedCollectSpec forbids raw collects here too — rightly:
      // storegate is wired into `sbt gates`, not a dev scratch path)
      def dump(df: DataFrame) =
        Tables.boundedCollect(df, 1 << 20, "storegate frame")
          .map(_.toSeq).toSeq

      gate("fingerprint") {
        val p = s"$root/fingerprints"
        ops.CurationOps.writeFingerprintStore(c1, p)
        val admitted = ops.CurationOps.freshAgainstStore(c2, p)
        ops.CurationOps.appendToFingerprintStore(admitted, p)
        ops.CurationOps.appendToFingerprintStore(admitted, p) // replay
        ops.CurationOps.compactFingerprintStore(spark, p)
        val stored = spark.read.parquet(p).select("norm")
        val exact = docsAll.select(ops.DedupOps.normText.as("norm"))
          .distinct()
        require(stored.exceptAll(exact).isEmpty &&
          exact.exceptAll(stored).isEmpty,
          "compacted store norms != whole-corpus distinct norms")
        val novel = Seq((9000000001L, "srcX",
          "a sentence no crawl has ever produced zqx"))
          .toDF("doc_id", "source", "text")
        require(ops.CurationOps.freshAgainstStore(novel, p).count() == 1L,
          "a genuinely new doc must survive the store probe")
      }
      gate("shingle") {
        val p = s"$root/shingles"
        ops.SpanOps.writeShingleStore(c1, p)
        ops.SpanOps.appendToShingleStore(c2, p)
        ops.SpanOps.appendToShingleStore(c2, p) // replay
        ops.SpanOps.compactShingleStore(spark, p)
        val viaStore = dump(ops.SpanOps.noveltyAgainstStore(probe, p)
          .orderBy("doc_id"))
        val inline = dump(ops.SpanOps.noveltyAgainstKeys(probe,
            ops.SpanOps.distinctShingleKeys(docsAll, ops.SpanOps.DefaultK),
            ops.SpanOps.DefaultK)
          .orderBy("doc_id"))
        require(viaStore == inline,
          s"novelty from store != inline over whole corpus " +
            s"(${viaStore.size} vs ${inline.size} rows)")
      }
      gate("bloom") {
        val pb = s"$root/bloom"
        ops.SpanOps.writeBloomStoreFromShingles(spark, s"$root/shingles",
          pb, nBits = 1 << 22)
        val rebuilt = s"$root/bloom_rebuilt"
        ops.SpanOps.writeBloomStore(docsAll, rebuilt, nBits = 1 << 22)
        val (b1, k1) = ops.SpanOps.readBloomStore(spark, pb)
        val (b2, k2) = ops.SpanOps.readBloomStore(spark, rebuilt)
        require(k1 == k2 && java.util.Arrays.equals(b1, b2),
          "bloom refreshed from the appended shingle store != bloom " +
            "built from the whole corpus (bit arrays must be identical)")
      }
      gate("winnow") {
        val p = s"$root/winnow"
        ops.TextOps.writeWinnowStore(c1, p)
        ops.TextOps.appendToWinnowStore(c2, p)
        ops.TextOps.appendToWinnowStore(c2, p) // replay
        ops.TextOps.compactWinnowStore(spark, p)
        val rebuilt = s"$root/winnow_rebuilt"
        ops.TextOps.writeWinnowStore(docsAll, rebuilt)
        require(dump(ops.TextOps.matchesAgainstStore(probe, p)) ==
          dump(ops.TextOps.matchesAgainstStore(probe, rebuilt)),
          "winnow matches from the incremental store != rebuilt store")
      }
      gate("phash") {
        val p = s"$root/phash"
        ops.MultimodalOps.writePhashStore(c1, p)
        ops.MultimodalOps.appendToPhashStore(c2, p)
        ops.MultimodalOps.appendToPhashStore(c2, p) // replay
        ops.MultimodalOps.compactPhashStore(spark, p)
        val rebuilt = s"$root/phash_rebuilt"
        ops.MultimodalOps.writePhashStore(docsAll, rebuilt)
        require(dump(ops.MultimodalOps.phashPairsAgainstStore(probe, p)) ==
          dump(ops.MultimodalOps.phashPairsAgainstStore(probe, rebuilt)),
          "phash screen from the incremental store != rebuilt store")
      }
      val emb = Tables.t(spark, dir, "embeddings")
      val embC1 = emb.filter(
        Tables.lcgBucket(col("vec_id"), 48271L, 23L, 100L) < 80L)
      val embC2 = emb.filter(
        Tables.lcgBucket(col("vec_id"), 48271L, 23L, 100L) >= 80L)
      val cbook = ops.SimilarityOps.kmeansCentroids(emb, k = 16, iters = 2)
      gate("codebook") {
        val p = s"$root/codebook"
        ops.SimilarityOps.writeCodebookStore(spark, cbook, p, trainIters = 2)
        val back = ops.SimilarityOps.readCodebookStore(spark, p)
        require(back.length == cbook.length &&
          back.zip(cbook).forall { case (a, b) => a.sameElements(b) },
          "codebook must round-trip bit-identically")
      }
      gate("pq_codes") {
        val p = s"$root/pq"
        ops.SimilarityOps.writePqStore(embC1, cbook, p)
        ops.SimilarityOps.appendToPqStore(embC2, cbook, p)
        ops.SimilarityOps.appendToPqStore(embC2, cbook, p) // replay
        ops.SimilarityOps.compactPqStore(spark, p)
        val q = emb.filter(col("vec_id") === 0L)
          .select("embedding").head().getSeq[Float](0).toArray
        val viaStore = Tables.boundedCollect(
          ops.SimilarityOps.annPqFromStore(spark, p, cbook, q,
            excludeId = 0L), 100, "pq store top-k")
          .map(r => (r.getLong(0), r.getString(2), r.getDouble(3))).toSeq
        val inline = Tables.boundedCollect(
          ops.SimilarityOps.annPqWith(emb, cbook), 100, "pq inline top-k")
          .map(r => (r.getLong(0), r.getString(2), r.getDouble(3))).toSeq
        require(viaStore == inline,
          s"ADC from the compacted store != in-plan form " +
            s"($viaStore vs $inline)")
      }
      gate("ivfpq_index") {
        val p = s"$root/ivfpq"
        val valid = ops.SimilarityOps.validLabeled(emb)
        val vC1 = valid.filter(
          Tables.lcgBucket(col("vec_id"), 48271L, 23L, 100L) < 80L)
        val vC2 = valid.filter(
          Tables.lcgBucket(col("vec_id"), 48271L, 23L, 100L) >= 80L)
        val rcb = ops.SimilarityOps.pqResidualCodebook(valid, cbook,
          k = 8, iters = 2)
        ops.SimilarityOps.writeIvfPqStore(vC1, cbook, rcb, p)
        ops.SimilarityOps.appendToIvfPqStore(vC2, cbook, rcb, p)
        ops.SimilarityOps.appendToIvfPqStore(vC2, cbook, rcb, p) // replay
        ops.SimilarityOps.compactIvfPqStore(spark, p)
        val q = emb.filter(col("vec_id") === 0L)
          .select("embedding").head().getSeq[Float](0).toArray
        def key(r: org.apache.spark.sql.Row) =
          (r.getLong(0), r.getInt(2), r.getString(3), r.getDouble(4))
        val viaStore = Tables.boundedCollect(
          ops.SimilarityOps.annIvfPqFromStore(spark, p, cbook, rcb, q,
            excludeId = 0L), 100, "ivfpq store top-k").map(key).toSeq
        val inline = Tables.boundedCollect(
          ops.SimilarityOps.annIvfPqWith(valid, cbook, rcb), 100,
          "ivfpq inline top-k").map(key).toSeq
        require(viaStore == inline,
          s"residual ADC from the compacted inverted lists != in-plan " +
            s"form ($viaStore vs $inline)")
      }
      gate("cardinality") {
        val p = s"$root/cardinality"
        ops.CurationOps.writeCardinalityStore(c1, p)
        ops.CurationOps.mergeIntoCardinalityStore(c2, p)
        ops.CurationOps.mergeIntoCardinalityStore(c2, p) // replay: set-idem
        val est = Tables.boundedCollect(
          ops.CurationOps.cardinalityFromStore(spark, p), 1 << 16,
          "cardinality store rows")
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val exact = Tables.boundedCollect(docsAll
          .select(col("source"),
            explode(split(trim(col("text")), " ")).as("token"))
          .groupBy("source").agg(countDistinct("token").as("n")),
          1 << 16, "exact cardinality rows")
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        require(est.keySet == exact.keySet, s"source sets differ: " +
          s"${est.keySet} vs ${exact.keySet}")
        // merged sketches lose the HIP estimator (composite fallback) —
        // the store's contract is the SKETCH's ±0.8% @ lgK 14, gated
        // here at 3% to stay load-noise-proof
        exact.foreach { case (src, n) =>
          val rel = math.abs(est(src) - n).toDouble / math.max(n, 1L)
          require(rel <= 0.03,
            s"cardinality estimate for $src off by ${rel * 100}%: " +
              s"est ${est(src)} vs exact $n")
        }
      }
      val events = Tables.t(spark, dir, "events")
      val evC1 = events.filter(
        pmod(xxhash64(col("event_id")), lit(100L)) < 80L)
      val evC2 = events.filter(
        pmod(xxhash64(col("event_id")), lit(100L)) >= 80L)
      val kanonPath = s"$root/kanon"
      gate("kanon") {
        ops.ScrubOps.writeKanonStore(evC1, kanonPath)
        ops.ScrubOps.appendToKanonStore(evC2, kanonPath)
        ops.ScrubOps.compactKanonStore(spark, kanonPath)
        require(dump(ops.ScrubOps.kanonAuditFromStore(spark, kanonPath)) ==
          dump(ops.ScrubOps.kanonAuditOn(events, ops.ScrubOps.KAnonK)),
          "k-anon audit from the compacted store != exact event scan")
      }
      gate("ldiv") {
        require(dump(ops.ScrubOps.ldivAuditFromStore(spark, kanonPath)) ==
          dump(ops.ScrubOps.ldivAuditOn(events, ops.ScrubOps.LDivL)),
          "l-diversity audit from the store != exact event scan")
      }
      gate("tclose") {
        require(dump(ops.ScrubOps.tcloseAuditFromStore(spark, kanonPath)) ==
          dump(ops.ScrubOps.tcloseAuditOn(events, ops.ScrubOps.TCloseT)),
          "t-closeness audit from the store != exact event scan")
      }
      gate("token_counts") {
        val p = s"$root/token_counts"
        ops.TextOps.writeTokenCountStore(c1, p)
        ops.TextOps.appendToTokenCountStore(c2, p) // counts: admit ONCE
        ops.TextOps.compactTokenCountStore(spark, p)
        require(dump(ops.TextOps.sourceDriftFromStore(spark, p)) ==
          dump(ops.TextOps.sourceDriftOn(docsAll)),
          "source drift from the compacted count store != inline")
      }
      val lmPath = s"$root/bigrams"
      gate("bigram_lm") {
        ops.SearchOps.writeBigramStore(c1, lmPath)
        ops.SearchOps.appendToBigramStore(c2, lmPath) // counts: admit ONCE
        ops.SearchOps.compactBigramStore(spark, lmPath)
        val viaStore = ops.SearchOps.lmPerplexityFromStore(docsAll, lmPath)
        require(viaStore.filter(col("n_oov") =!= 0L).isEmpty,
          "LM trained on the whole corpus must score it with zero OOV")
        require(dump(viaStore
            .select("doc_id", "n_bigrams", "avg_logp", "ppl")) ==
          dump(ops.SearchOps.lmPerplexityOn(docsAll)),
          "perplexity from the appended LM store != one-shot inline LM")
      }
      gate("doremi_partials") {
        val p = s"$root/doremi_partials"
        ops.CurationOps.doremiBatchPartials(c1, lmPath)
          .coalesce(1).write.mode("overwrite").parquet(s"$p/batch_id=0")
        ops.CurationOps.doremiBatchPartials(c2, lmPath)
          .coalesce(1).write.mode("overwrite").parquet(s"$p/batch_id=1")
        ops.CurationOps.compactDoremiPartials(spark, p)
        require(dump(ops.CurationOps.doremiFromPartials(
            spark.read.parquet(p))) ==
          dump(ops.CurationOps.doremiFromStore(docsAll, lmPath)),
          "DoReMi from compacted partials != one-shot from the LM store")
      }
      gate("dsir") {
        val p = s"$root/dsir_tokens"
        def langDocs(df: DataFrame) =
          df.select(col("lang").as("source"), col("text"))
        ops.TextOps.writeTokenCountStore(langDocs(c1), p)
        ops.TextOps.appendToTokenCountStore(langDocs(c2), p)
        require(dump(ops.CurationOps.dsirWeightsFromStore(docsAll, spark,
            p, col("source") === "en")) ==
          dump(ops.CurationOps.dsirWeightsOn(docsAll,
            col("lang") === "en")),
          "DSIR weights from the appended count store != inline")
      }
      val total = nOk + failures.size
      if (failures.nonEmpty) {
        spark.stop()
        sys.error(s"storegate FAIL: ${failures.size}/$total families " +
          s"broken —\n  ${failures.reverse.mkString("\n  ")}")
      }
      println(s"storegate PASS: $nOk/$total store families " +
        "from-store == exact")
      spark.stop()
      return
    }
    if (name == "ivfpqphase") {
      // r15 optimization-round instrumentation: split the trained-face
      // cost (q140/q143/q151/q153/q154) into its lifecycle phases so the
      // optimization targets the measured leg, not a guess (guide §1).
      import org.apache.spark.sql.functions.col
      import org.apache.spark.metrics.source.CodegenMetrics
      def phase(n: String)(f: => Unit): Unit = {
        val c0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
        val t0 = System.nanoTime()
        f
        val dc = CodegenMetrics.METRIC_COMPILATION_TIME.getCount - c0
        println(f"[ivfpqphase] $n%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
          f"  janino_compiles=$dc")
      }
      (1 to args.lift(1).map(_.toInt).getOrElse(2)).foreach { i =>
        println(s"[ivfpqphase] --- pass $i ---")
        spark.sharedState.cacheManager.clearCache()
        val valid = ops.SimilarityOps.validLabeled(
          Tables.t(spark, dir, "embeddings"))
        phase("valid.count")(valid.count())
        var cells: Array[Array[Double]] = null
        phase("kmeansCentroids (coarse)") {
          cells = ops.SimilarityOps.kmeansCentroids(valid,
            ops.SimilarityOps.IvfTrainK, ops.SimilarityOps.IvfTrainIters)
        }
        var rcb: Array[Array[Double]] = null
        phase("pqResidualCodebook") {
          rcb = ops.SimilarityOps.pqResidualCodebook(valid, cells)
        }
        phase("annIvfPqWith search")(
          ops.SimilarityOps.annIvfPqWith(valid, cells, rcb).count())
        phase("annIvfPqRecallWith sweep")(
          ops.SimilarityOps.annIvfPqRecallWith(valid, cells, rcb).count())
        phase("annIvfPqRefinedWith")(
          ops.SimilarityOps.annIvfPqRefinedWith(valid, cells, rcb).count())
        phase("pqTrainedCodebook (raw, q140)")(
          ops.SimilarityOps.pqTrainedCodebook(valid.drop("label")))
        // split one representative kmeans-update iteration into plan vs
        // execute: where do the ~350 ms/job actually go?
        val upd = ops.SimilarityOps.assignClusters(valid, cells)
          .select(col("cluster"),
            org.apache.spark.sql.functions.posexplode(col("embedding"))
              .as(Seq("pos", "v")))
          .groupBy("cluster", "pos")
          .agg(org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.sum(
              col("v").cast("decimal(38,10)")).cast("double") /
              org.apache.spark.sql.functions.count(
                org.apache.spark.sql.functions.lit(1)), 6).as("cv"))
        phase("update: analyze+optimize")(upd.queryExecution.executedPlan)
        phase("update: execute (collect)")(upd.collect())
        phase("trivial job (range.count)")(spark.range(1000).count())
      }
      spark.stop()
      return
    }
    if (name == "q41lsh") {
      // the q41 kernel blocked by LSH bucket instead of label — the
      // documented handoff once label blocks outgrow memory
      import org.apache.spark.sql.functions.col
      time("q41lsh")(ops.SimilarityOps.cosineTopPairsOn(
        Tables.t(spark, dir, "embeddings"), 50,
        ops.SimilarityOps.lshBlock(col("embedding"))).count())
      spark.stop()
      return
    }
    // exact key, else unique prefix (deterministic — ambiguity is an error)
    def resolve(n: String) = {
      val ms = SparkEntry.queries.filter { case (k, _) =>
        k == n || k.startsWith(n)
      }.toSeq.sortBy(_._1)
      ms match {
        case Seq((_, fn)) => fn(spark, dir)
        case Seq() => sys.error(s"no query named $n")
        case many => many.find(_._1 == n)
          // "q10" must keep meaning q10_json_props now that q100/q101
          // exist: a qNN_ boundary match beats the bare prefix
          .orElse(many.find(_._1.startsWith(n + "_")))
          .map(_._2(spark, dir))
          .getOrElse(sys.error(
            s"ambiguous prefix $n: ${many.map(_._1).mkString(", ")}"))
      }
    }
    // force FULL evaluation of every output column (a bare count() lets
    // Spark prune computed columns out of projection-only queries)
    def force(d: DataFrame): Long = {
      import org.apache.spark.sql.functions.{count, expr, lit, struct, xxhash64}
      d.select(xxhash64(struct(d.columns.map(d.col): _*)).as("h"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"))
        .head().getLong(0)
    }
    val df = resolve(name)
    if (args.length > 1 && args(1) == "explain") df.explain("formatted")
    else if (args.length > 1 && args(1) == "force") {
      (name +: args.drop(2).toSeq).foreach { n =>
        time(n)(force(resolve(n)))
        time(s"$n-again")(force(resolve(n)))
      }
    }
    else if (args.length > 1 && args(1) == "dump") {
      df.write.mode("overwrite").parquet(s"/tmp/scratch_out/$name.parquet")
      println(s"[info] dumped $name")
    } else {
      // one JVM, many queries: `runMain graft.Scratch q20 q21 q22`
      (name +: args.drop(1).toSeq).foreach { n =>
        time(n)(resolve(n).count())
        time(s"$n-again")(resolve(n).count())
      }
    }
    spark.stop()
  }
}
