package graft

import graft.pipeline.{Dedup, Importance, LanguageModel, Repetition, Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup-family scale stress: replicate the sf0.1 documents table N× under
  * shifted ids (an adversarially dup-heavy corpus — every doc is a member
  * of an N-clique of exact duplicates) and time each operator, logging the
  * gate decisions (collapse branch, union-find edge count) that the
  * SCALE.md linearity claims rest on.
  *
  *   sbt "runMain graft.Stress 100"         # 100× = 500k docs
  *   sbt "runMain graft.Stress 1000 crawl"  # crawl family only at 5M docs
  *
  * The optional second arg filters to one family: `dedup` (exact dedup,
  * clusters, survivors, PPJoin), `incdedup` (incremental shard-vs-corpus
  * dedup: bloom prefilter vs plain anti-join), `fuzzyjoin` (R-S PPJoin
  * exchange-volume instrumentation on a replica-salted linear-output
  * corpus), `score` (repetition, DSIR, LM,
  * substring), `crawl` (html_extract, line_dedup, domain_stats, WARC
  * round-trip), `stream` (1M-event multi-batch sessionization:
  * batch-parity + bounded-state assertions; ignores the replication arg),
  * `raster` (dense-grid cube ops — resample_spatial average/near/bilinear,
  * tiled kernel stencil, 2-D neighborhood, merge_cubes resolver join,
  * aggregate_temporal_period — on a synthesized rep·100k-cell grid: the
  * scale class the reference documents as its own dask OOM ceiling,
  * docs/scalability/aggregate-large-spatial-extents.md:9-26).
  *
  * Results are recorded in SCALE.md's measured-scale-up table.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(100)
    val familyFilter = args.drop(1).headOption
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.SparkTuning.tune(spark)

    // replicate under shifted ids and round-trip through PARQUET: the timed
    // plans must see real file statistics (size-gated broadcasts fire off
    // Catalyst's scan estimates), exactly like a production corpus — a
    // checkpointed in-memory corpus reports unknown stats and silently
    // degrades every maybeBroadcast join to sort-merge. LAZY: the `stream`
    // family is synthetic-event-only and must not pay a corpus build.
    lazy val corpus: org.apache.spark.sql.DataFrame = {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"))
      val nBase = base.count()
      val corpusPath = s"/tmp/graft_stress_${rep}x"
      spark.range(rep).toDF("r")
        .crossJoin(base)
        .select((col("doc_id") + col("r") * 10000000L).as("doc_id"),
          col("text"), col("lang"))
        .repartition(32) // scan parallelism like a real many-file corpus
        .write.mode("overwrite").parquet(corpusPath)
      val c = spark.read.parquet(corpusPath)
      println(s"[stress] corpus: $nBase base docs x $rep = ${c.count()}")
      c
    }

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // noop writes, never count(): count() lets Catalyst prune every
    // unreferenced projection/join (a left join against a grouped-by-key
    // side preserves row count, so "time a count" times nothing)
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def family(name: String)(body: => Unit): Unit =
      if (familyFilter.forall(_ == name)) body

    family("dedup") { time("exact dedup (groups)") {
      force(Dedup.exact(corpus, "doc_id", md5(col("text").cast("binary"))))
    } }
    // ---- incremental (shard vs corpus) dedup: bloom prefilter vs the
    // plain anti-join it replaces. This family needs the REALISTIC ingest
    // workload, not the adversarial dup-heavy clique corpus: per-replica
    // tags make corpus keys distinct (the ScaleUp discipline), the shard
    // is ~1% of the corpus with half true duplicates of corpus rows and
    // half genuinely new — so the bloom admits ~hit-rate + fpp of the
    // corpus instead of half of it. (On the clique corpus every text has
    // `rep` exact copies, the bloom prunes nothing, and the prefilter
    // measures pure overhead — an honest non-goal, noted in SCALE.md.)
    family("incdedup") {
      val uCorpus = corpus.select(col("doc_id"),
        concat(col("text"), lit(" rep "),
          (col("doc_id") / 10000000L).cast("bigint").cast("string"))
          .as("text"))
      // materialize the shard as its OWN small table — a real ingest
      // shard arrives as a file, not as a filter over the corpus; deriving
      // it lazily made every pass over the 1%-sized shard re-scan the full
      // corpus and mis-charged the bloom build a whole corpus scan
      val shardPath = s"/tmp/graft_stress_incshard_${rep}x"
      uCorpus.filter(pmod(col("doc_id"), lit(97L)) === 0L)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          when(pmod(col("doc_id"), lit(2L)) === 0L, col("text"))
            .otherwise(concat(col("text"), lit(" fresh-"),
              col("doc_id").cast("string"))).as("text"))
        .write.mode("overwrite").parquet(shardPath)
      val shard = spark.read.parquet(shardPath)
      val key = md5(col("text").cast("binary"))
      val shardN = shard.count()
      println(s"[stress]   shard docs: $shardN")
      // wall-clock alone can't show the operator's point on one box —
      // local shuffle runs at memory speed — so ALSO measure exchanged
      // bytes: the quantity that crosses the network on a real cluster
      val shuffled = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffled.addAndGet(
            e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      Thread.sleep(1500) // drain stragglers from the count() jobs above
      spark.sparkContext.addSparkListener(listener)
      def measured(name: String)(f: => Unit): Unit = {
        shuffled.set(0)
        time(name)(f)
        Thread.sleep(1500) // let the listener bus drain
        println(f"[stress]   $name shuffle write: ${shuffled.get() / 1e6}%.1f MB")
      }
      try {
        measured("incremental (bloom prefilter)") {
          force(Dedup.incrementalNew(shard, uCorpus, "doc_id", key,
            expectedNewKeys = math.max(shardN, 1024L)))
        }
        measured("incremental (plain anti-join)") {
          force(shard.withColumn("_k", key).join(
            uCorpus.select(key.as("_k")), Seq("_k"), "left_anti").drop("_k"))
        }
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    // ---- R-S fuzzy join (PPJoin prefix filter): the sf0.1 probe verified
    // the set arrays stay scan-local; this family measures it AT SCALE.
    // The replica salt is interleaved between every pair of words, so
    // every shingle carries the replica tag: cross-replica Jaccard is 0,
    // the true-match structure per replica equals the base corpus's, and
    // the workload scales linearly in rows instead of quadratically in
    // output — the geometry a real record-linkage corpus has.
    family("fuzzyjoin") {
      // 120-char records (name/address-scale record linkage): doc COUNT is
      // the scale axis, and the truncation keeps the 5M point's shuffle
      // spill inside this box's disk budget (the untruncated 5M run
      // filled /tmp — prefix-build shuffles + the prefix cache). The
      // prefix cache is OFF for the same reason: it disk-spills a second
      // copy of the exploded index; recomputing the build for the L and R
      // arms trades CPU for the scarcer resource here.
      val saltedPath = s"/tmp/graft_stress_fuzzy_${rep}x"
      corpus.select(col("doc_id"),
        regexp_replace(substring(col("text"), 1, 120), lit(" "),
          concat(lit(" r"), (col("doc_id") / 10000000L).cast("bigint")
            .cast("string"), lit(" "))).as("text"))
        .write.mode("overwrite").parquet(saltedPath)
      val t = spark.read.parquet(saltedPath)
      val probe = t.filter(pmod(col("doc_id"), lit(97L)) === 0L)
      val ref = t.filter(pmod(col("doc_id"), lit(97L)) =!= 0L)
      println(s"[stress]   probe docs: ${probe.count()}  ref docs: ${ref.count()}")
      val shuffled = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffled.addAndGet(
            e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      // drain straggler stages from the preceding count() jobs BEFORE
      // attaching, so the counter sees only the timed join; detach in a
      // finally so the listener never outlives the family
      Thread.sleep(1500)
      spark.sparkContext.addSparkListener(listener)
      val exchanged = try {
        time("fuzzy join (prefix)") {
          force(Dedup.jaccardJoin(probe, ref, "doc_id", col("text"),
            shingleLen = 3, threshold = 0.5, cachePrefix = false))
        }
        Thread.sleep(1500) // let the listener bus drain
        shuffled.get()
      } finally spark.sparkContext.removeSparkListener(listener)
      println(f"[stress]   prefix-join shuffle write: ${exchanged / 1e6}%.1f MB")
      // counterfactuals, COMPUTED not guessed: (a) the bytes the exchanges
      // would carry if the verification set arrays shuffled (sum of
      // distinct-shingle string bytes + per-element array overhead);
      // (b) the candidate pairs an any-shared-shingle join would verify
      // (sum over shingles of nL·nR) vs the true result size
      val sh = t.select(col("doc_id"),
        explode(graft.pipeline.Dedup.shingleArray(col("text"), 3)).as("s"))
      val arrBytes = sh.agg(sum(length(col("s")) + lit(16))).first().getLong(0)
      val shL = sh.join(probe.select("doc_id"), Seq("doc_id"))
      val shR = sh.join(ref.select("doc_id"), Seq("doc_id"))
      val naiveCands = shL.groupBy(col("s")).agg(count(lit(1)).as("cl"))
        .join(shR.groupBy(col("s")).agg(count(lit(1)).as("cr")), Seq("s"))
        .agg(sum(col("cl") * col("cr"))).first().getLong(0)
      println(f"[stress]   set-array counterfactual: ${arrBytes / 1e6}%.1f MB " +
        f"(${arrBytes.toDouble / math.max(exchanged, 1)}%.1f x the measured exchange)")
      println(s"[stress]   any-shared-shingle candidate pairs: $naiveCands " +
        "(the no-prefix-filter verification load)")
    }
    // ---- PQ/IVFADC ANN on the VECTOR-count axis: the sf tables stop at
    // 20k embeddings, so this synthesizes rep·50k deterministic 64-dim
    // vectors (xxhash64-derived; parquet round-trip for real scan stats)
    // and measures what crosses the wire on a cluster — exchange BYTES of
    // the code-join shape vs the full-vector counterfactual — plus
    // IVFADC's bounded probe fan-out. Production discipline throughout:
    // quantizers train on a bounded dense-id sample, cells ∝ n.
    family("annpq") {
      val nVec = rep * 50000L
      val vecPath = s"/tmp/graft_stress_vec_${rep}x"
      spark.range(nVec).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          (pmod(xxhash64(col("id"), d), lit(2001L)) - lit(1000L))
            .cast("double") / 1000.0).as("embedding"))
        .repartition(32).write.mode("overwrite").parquet(vecPath)
      val emb = spark.read.parquet(vecPath)
      println(s"[stress]   vectors: ${emb.count()}")
      val sample = emb.filter(col("vec_id") < 100000L)
      val nCells = math.max(16, (nVec / 10000L).toInt)
      val (cents, book) = time("quantizer training (bounded sample)") {
        (Similarity.strideCentroids(sample, "vec_id", "embedding", nCells),
          Similarity.pqCodebook(sample, "vec_id", "embedding", 64, 16, 32))
      }
      val qMod = math.max(nVec / 64L, 1L)
      val queries = emb.filter(pmod(col("vec_id"), lit(qMod)) === 0L)
      println(s"[stress]   queries: ${queries.count()}  cells: $nCells (probes 3)")
      val shuffled = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffled.addAndGet(
            e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      Thread.sleep(1500) // drain stragglers from the counts above
      spark.sparkContext.addSparkListener(listener)
      def measured(name: String)(f: => Unit): Unit = {
        shuffled.set(0)
        time(name)(f)
        Thread.sleep(1500) // let the listener bus drain
        println(f"[stress]   $name shuffle write: ${shuffled.get() / 1e6}%.1f MB")
      }
      try {
        measured("ivfadc topk (k=3, sl=25)") {
          force(Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding",
            cents, book, k = 3, shortlist = 25, probes = 3))
        }
        // counterfactuals, COMPUTED not guessed: per corpus vector the
        // code join moves 16 one-byte codes + an 8-byte id; shipping raw
        // vectors would move 64 doubles + the id
        val codeBytes = nVec * (16L + 8L)
        val rawBytes = nVec * (64L * 8L + 8L)
        println(f"[stress]   full-vector counterfactual: ${rawBytes / 1e6}%.1f MB " +
          f"vs ${codeBytes / 1e6}%.1f MB of codes " +
          f"(${rawBytes.toDouble / codeBytes}%.1f x)")
        if (rep <= 10)
          measured("pq-refine flat (no IVF)") {
            force(Similarity.pqTopKRefined(queries, emb, "vec_id",
              "embedding", book, k = 3, shortlist = 25))
          }
        else
          println("[stress]   pq-refine flat: skipped at this scale " +
            "(O(n·q) by construction — SCALE.md pins flat as the " +
            "probe-every-cell baseline)")
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    family("score") { time("repetition scan") {
      force(corpus.select(col("doc_id"), Repetition.stats(col("text")).as("s")))
    } }
    // caches OFF for the corpus-sized intermediates (the r4 stress
    // protocol): at scale the gram/trigram/window tables exceed executor
    // storage and recomputing the scan is the cheaper, predictable path —
    // the cached diamond is a small-corpus optimization
    family("score") {
      time("dsir_weights") {
        force(Importance.dsirWeights(corpus, "doc_id", col("text"),
          col("lang") === "en", cacheGrams = false))
      }
      time("lm_score") {
        force(LanguageModel.charTrigramScore(corpus, "doc_id", col("text"),
          col("lang") === "en", cacheTrigrams = false))
      }
      time("substring_dup") {
        force(Dedup.substringDupStats(corpus, "doc_id", col("text"),
          cacheWindows = false))
      }
    }
    // ---- web-crawl family (r5 ops, r6 scale rows) ----
    // the same id-derived page wrapper the driver query uses: one match
    // per boilerplate class, so both extraction forms do representative work
    val page = concat(
      lit("<html><head><style>p {color: red}</style>"),
      lit("<script>var x = \"<b>bold</b>\";</script></head><body><h1>Doc "),
      col("doc_id").cast("string"),
      lit("</h1><p>"), substring(col("text"), 1, 500),
      lit("</p><ul><li>first &amp; second</li><li>10 &lt; 20</li></ul>"),
      lit("<div>tail&nbsp;words</div></body></html>"))
    family("crawl") {
      time("html_extract (one-pass expr)") {
        force(corpus.select(col("doc_id"),
          TextAnalysis.htmlExtract(page).as("clean")))
      }
      time("html_extract (regex chain)") {
        force(corpus.select(col("doc_id"),
          TextAnalysis.htmlExtractChain(page).as("clean")))
      }
    }
    // line dedup over spliced boilerplate sentences (the driver-query
    // shape): on the replicated corpus EVERY line is a 100-clique member —
    // the adversarial case for the first-occurrence rule
    family("crawl") { time("line_dedup") {
      val aug = concat(lit("Cookie notice applies. "),
        substring(col("text"), 1, 120),
        lit(". All rights reserved. "),
        substring(col("text"), 60, 120),
        lit(". Subscribe to newsletter"))
      force(Dedup.lineDedup(corpus.select(col("doc_id"), aug.as("t")),
        "doc_id", col("t")))
    } }
    family("crawl") {
      time("domain_stats (PSL eTLD+1)") {
        val tld = when(pmod(col("doc_id"), lit(4L)) === 0L, lit("org"))
          .when(pmod(col("doc_id"), lit(4L)) === 1L, lit("co.uk"))
          .when(pmod(col("doc_id"), lit(4L)) === 2L, lit("com.au"))
          .otherwise(lit("bd"))
        val url = concat(lit("https://host"),
          pmod(col("doc_id"), lit(50L)).cast("string"), lit(".example"),
          pmod(col("doc_id"), lit(7L)).cast("string"), lit("."), tld,
          lit("/p/"), col("doc_id").cast("string"))
        force(corpus.select(length(col("text")).as("n_chars"), url.as("u"))
          .select(col("n_chars"),
            TextAnalysis.urlHost(col("u")).as("host"))
          .withColumn("domain", TextAnalysis.registeredDomain(col("host")))
          .groupBy(col("domain"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("host")).as("n_hosts"),
            sum(col("n_chars")).as("sum_chars")))
      }
    }
    // ---- WARC round-trip (r6): write the whole corpus as sharded
    // .warc.gz, then re-ingest through gzip → envelope → HTTP → UTF-8 →
    // canonical URL → PSL domain. Shard count = partition count; both
    // directions are file-parallel with zero shuffles.
    family("crawl") {
      val warcDir = s"/tmp/graft_stress_warc_${rep}x"
      val warcShards = time("warc write (sharded sink)") {
        val url = concat(lit("https://crawl"),
          pmod(col("doc_id"), lit(5L)).cast("string"), lit(".example"),
          pmod(col("doc_id"), lit(3L)).cast("string"), lit(".org/docs/"),
          col("doc_id").cast("string"))
        graft.sources.WarcWriter.writeResponses(
          corpus.select(url.as("url"), page.as("text")), warcDir)
      }
      println(s"[stress]   warc shards: ${warcShards.size}")
      time("warc ingest (responses)") {
        force(graft.sources.WarcReader.loadResponses(spark, warcShards)
          .select(col("canonical_url"), col("domain"),
            TextAnalysis.htmlExtract(col("text")).as("clean")))
      }
    }
    family("dedup") {
      val clusters = time("clusters (collapsed path)") {
        val c = graft.core.Caching.eager(
          Dedup.nearDupClustersCollapsed(corpus, "doc_id", col("text")))
        println(s"[stress]   clustered docs: ${c.count()}")
        c
      }
      time("survivors (collapsed path)") {
        val s = Dedup.survivorsCollapsed(corpus, "doc_id", col("text")).count()
        println(s"[stress]   survivors: $s")
      }
      // PPJoin n-gram Jaccard belongs AFTER the collapse in a production
      // pipeline — run it on the unique-text set, same blocking + threshold
      // as the driver query
      time("ngram-jaccard PPJoin (uniques)") {
        val uniq = corpus.groupBy(md5(col("text").cast("binary")).as("k"))
          .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"),
            first(col("lang")).as("lang"))
        val p = Dedup.ngramJaccardNearDups(uniq, "doc_id", col("text"),
          blockCols = Seq("lang"), shingleLen = 3, threshold = 0.5)
        println(s"[stress]   jaccard pairs: ${p.count()}")
      }
      clusters.unpersist()
    }

    // ---- raster family: dense-grid cube ops at rep·100k cells ----
    // The §2 cube operators' 100-TB claims rest on plan shape (single-
    // shuffle binning, arithmetic halo exchange, no coordinate crossJoins);
    // this family turns them into measured rows like the dedup family.
    // Grid: side×side×4 timesteps with rep·100k total cells (rep=10 → 1M,
    // rep=100 → 10M), written to a 32-file parquet so the timed plans see
    // real file statistics, values id-derived and deterministic.
    family("raster") {
      import graft.core.DataCube
      import graft.operators.{AggregateOps, KernelOps, MergeOps, ResampleOps, WindowOps}
      val nT = 4L
      val side = math.sqrt(rep.toDouble * 100000.0 / nT).toLong
      val rasterPath = s"/tmp/graft_stress_raster_${rep}x"
      val epoch = 1704067200000000L // 2024-01-01T00:00:00Z micros
      spark.range(side * side * nT)
        .select(
          (col("id") % side).as("x"),
          (expr(s"id div $side") % side).as("y"),
          timestamp_micros(lit(epoch) +
            expr(s"id div ${side * side}") * 86400000000L).as("t"),
          (pmod(col("id") * 2654435761L, lit(10000L)).cast("double") / 10.0)
            .as("value"))
        .repartition(32)
        .write.mode("overwrite").parquet(rasterPath)
      val grid = spark.read.parquet(rasterPath)
      println(s"[stress] raster grid: $side x $side x $nT = ${grid.count()} cells")
      def cube = DataCube.fromTable(grid, Seq("x", "y", "t"), "value")

      time("resample_spatial avg 4x4") {
        force(ResampleOps.resampleSpatialAgg(cube, 4.0, 4.0,
          v => graft.functions.Reducers.meanR(v)).df)
      }
      time("resample_spatial near 4x4") {
        force(ResampleOps.resampleSpatialNear(cube, 4.0, 4.0).df)
      }
      time("resample bilinear 10k targets") {
        // bounded re-grid target list (broadcast), grid never shuffles
        val step = side / 100.0
        val targets = for { i <- 0 until 100; j <- 0 until 100 }
          yield (i * step + 0.25, j * step + 0.25)
        force(ResampleOps.resampleSpatialBilinear(cube, targets).df)
      }
      time("apply_kernel tiled 5x5") {
        val k = Seq.fill(5)(Seq.fill(5)(1.0 / 25))
        force(KernelOps.applyKernelTiled(cube, k, KernelOps.Replicate,
          xRange = (0L, side - 1), yRange = (0L, side - 1)).df)
      }
      time("apply_neighborhood 8x8") {
        force(WindowOps.applyNeighborhood2D(cube, 8, 8,
          v => graft.functions.Reducers.meanR(v)).df)
      }
      time("merge_cubes resolver join") {
        // fully-overlapping label sets + resolver: the data-sized
        // full-outer equi-join — the one merge shape that cannot broadcast
        val other = cube.withDf(_.withColumn("value", col("value") * 0.5))
        force(MergeOps.mergeCubes(cube, other,
          Some((a, b) => a + b)).df)
      }
      time("aggregate_temporal_period day") {
        force(AggregateOps.aggregateTemporalPeriod(cube, "day",
          v => graft.functions.Reducers.meanR(v)).df)
      }
      time("reduce_dimension plain (mean over t)") {
        force(graft.operators.ReduceOps.reduceDimension(cube, "t",
          v => graft.functions.Reducers.meanR(v)).df)
      }
      time("reduce_dimension ordered-array (composed callback over t)") {
        // the general openEO reducer path: per-pixel ordered value array
        // along t + composed scalar folds. Same single exchange as the
        // plain path (PlanAuditSpec); the array length is the reduced
        // dim's cardinality (here nT) — bounded by the cube's time depth,
        // never by spatial size, which is what makes collect_list safe at
        // 100-TB spatial extents
        import graft.functions.ArrayFns
        force(graft.operators.ReduceOps.reduceDimensionArray(cube, "t",
          arr => ArrayFns.arrayMean(arr) + ArrayFns.arraySd(arr)).df)
      }
    }

    // ---- streaming family: bounded-state sessionization at 1M events ----
    // The claim under test (SCALE.md "sessionize (stream)" row): state is
    // bounded by genuinely ACTIVE keys, not by every key ever seen — idle
    // users' sessions close via EventTimeTimeout and their state is
    // REMOVED as the watermark advances. Users are active in staggered
    // ~169-min windows (user u starts at u·3.6 s; 45 one-minute steps +
    // 4 thirty-one-minute session gaps), the event stream arrives
    // time-ordered in 20 micro-batches, so the watermark continually
    // expires users whose windows have passed. Mid-activity expiry is
    // impossible — the largest intra-activity gap (31 min) is below
    // timeout + watermark delay (30 + 10 min) — and a user never
    // reappears after expiry, so the per-user max-fold of Update
    // snapshots is exact and parity with the batch window computation is
    // REQUIRED, not sampled. (The newest ~40 min of users never time out
    // — the watermark is capped at maxEventTime − delay — but their last
    // in-batch snapshot already carries their exact totals.)
    family("stream") {
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val nUsers = 20000
      val perUser = 50 // = 1M events
      val gapMicros = 1800L * 1000000L
      // user u, event i: start at u·3.6 s; every 10th event jumps 31 min
      // (> gap, opens a new session), others step 60 s — 5 sessions/user
      val rows = (0 until nUsers).iterator.flatMap { u =>
        var t = u.toLong * 3600000L // micros: u * 3.6 s stagger
        (0 until perUser).iterator.map { i =>
          t += (if (i % 10 == 0 && i > 0) 31L * 60 else 60L) * 1000000L
          (u.toLong, t)
        }
      }.toArray
      val ordered = rows.sortBy(_._2)
      val groundTruth = time("batch ground truth") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("tsu"))
        ordered.toSeq.toDF("user_id", "tsu")
          .withColumn("prev", lag(col("tsu"), 1).over(w))
          .withColumn("ns", when(col("prev").isNull ||
            col("tsu") - col("prev") > gapMicros, 1).otherwise(0))
          .withColumn("sid", sum(col("ns")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("sid")).agg(count(lit(1)).as("len"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"), max(col("len")).as("longest"))
          .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      }
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val stream = MemoryStream[(Long, Long)]
      val out = graft.streaming.StreamingOps.sessionizeStream(
        stream.toDS(), gapMicros)
      val q = out.writeStream.outputMode("update")
        .format("memory").queryName("stress_sess").start()
      val nBatches = 20
      val per = (ordered.length + nBatches - 1) / nBatches
      // scan the FULL progress history, not just lastProgress: after a
      // data batch Spark runs a watermark-advance batch that evicts state,
      // and sampling only the latest entry would read the post-eviction
      // count — understating the peak in the direction that flatters the
      // claim. recentProgress retains 100 entries > the ~40 this run emits.
      def peakState(): Long =
        q.recentProgress.iterator
          .flatMap(_.stateOperators.map(_.numRowsTotal)).foldLeft(0L)(math.max)
      var maxState = 0L
      time(s"stream 1M events / $nBatches batches") {
        ordered.grouped(per).foreach { chunk =>
          stream.addData(chunk.toIndexedSeq)
          q.processAllAvailable()
          maxState = math.max(maxState, peakState())
        }
        // a final empty batch advances the watermark one last time,
        // closing every user whose window ends > delay before the stream's
        // max event time (the newest tail stays open by construction)
        stream.addData()
        q.processAllAvailable()
        maxState = math.max(maxState, peakState())
      }
      val got = spark.table("stress_sess")
        .groupBy(col("user_id"))
        .agg(max(col("n_sessions")).as("n"), max(col("longest")).as("l"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      q.stop()
      println(s"[stress]   users: ${got.size} / $nUsers  peak state rows: $maxState")
      require(got.size == nUsers, s"lost users: ${nUsers - got.size}")
      val bad = groundTruth.count { case (u, v) => got.get(u) != Some(v) }
      require(bad == 0, s"$bad users diverge from batch ground truth")
      // bounded-state claim, graded in two tiers so a Spark-version or
      // batch-geometry shift is DIAGNOSABLE rather than a hard stress
      // failure on a non-regression:
      // - structural bound (warn): a user's state lives from their first
      //   event until the watermark (batch-granular, delay 10 min) passes
      //   lastEvent + gap (30 min) — at 3.6 s/user stagger that is
      //   (activity window + gap + delay + one batch's arrival span) of
      //   concurrently-live users, doubled for headroom against
      //   watermark-advance cadence drift
      // - hard floor (require): eviction must happen AT ALL — if
      //   EventTimeTimeout/state.remove() ever stop firing, the peak is
      //   the full key population and that IS a regression
      val activityMin = 45 + 4 * 31 // 45 one-min steps + 4 31-min gaps
      val batchSpanMin =
        (nUsers * 3.6 / 60 + activityMin) / nBatches // arrival span per batch
      val structuralBound =
        (((activityMin + 30 + 10 + batchSpanMin) * 60 / 3.6) * 2).toLong
      println(s"[stress]   peak state rows: $maxState " +
        s"(structural bound $structuralBound, population $nUsers)")
      if (maxState >= structuralBound)
        println(s"[stress]   WARNING: peak state $maxState exceeds the " +
          s"structural bound $structuralBound — watermark-advance cadence " +
          "drifted (Spark upgrade? batch split change?); re-derive the " +
          "geometry before trusting the bounded-state row")
      require(maxState < nUsers,
        s"state not bounded AT ALL: peak $maxState of $nUsers users — " +
          "timeout-driven eviction is not firing")
      println(s"[stress]   parity: ${groundTruth.size} users exact; state bounded")
    }
    spark.stop()
  }
}
