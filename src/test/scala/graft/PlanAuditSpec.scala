package graft

import graft.core._
import graft.functions.Reducers
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the scale contract in SCALE.md, asserted on the
  * plans Spark actually produces — pushdown reaches the parquet scan, hot
  * paths stay inside whole-stage codegen, and the per-family shuffle
  * budget is what the shuffle inventory claims.
  */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.SparkTuning.tune(s)
    s
  }

  val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def shuffles(df: DataFrame): Int =
    "Exchange (?:hash|range)partitioning".r.findAllIn(plan(df)).length

  test("filter_temporal predicates reach the parquet scan as PushedFilters") {
    val c = Tables.eventsCube(spark, dir)
    val filtered = FilterOps.filterTemporal(c, "2024-01-05", "2024-01-25")
    val p = plan(filtered.df)
    assert(p.contains("PushedFilters: ["), p)
    // whichever ts encoding the testdata carries, the loader's
    // normalization must not strand the predicate above the scan: the
    // nanos rewrite pushes an INT64 comparison on the raw column, and
    // Catalyst's cast-unwrap pushes the NTZ comparison through the
    // loader's NTZ→LTZ cast (UTC session tz makes it monotone-exact)
    assert("PushedFilters: \\[[^\\]]*GreaterThan".r.findFirstIn(p).isDefined ||
      "PushedFilters: \\[[^\\]]*ThanOrEqual".r.findFirstIn(p).isDefined, p)
  }

  test("scan→reduce pipeline runs inside WholeStageCodegen") {
    val c = Tables.eventsCube(spark, dir)
    val reduced = ReduceOps.reduceDimension(c, "t", v => Reducers.meanR(v))
    // AQE hides codegen wrapping in the initial plan string; ask the
    // codegen explain mode, which compiles the subtrees
    val codegen = reduced.df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen subtree"), codegen.take(500))
  }

  test("bucketed tables join with ZERO exchanges; salted agg matches plain") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey")
    // a previous JVM's managed-table directories survive in the warehouse
    // while the fresh in-memory catalog has no table to DROP — clear both
    for (t <- Seq("li_b", "ord_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dirF = new java.io.File(s"spark-warehouse/$t")
      if (dirF.exists())
        dirF.listFiles().foreach(_.delete())
      dirF.delete()
    }
    core.Layout.writeBucketed(li, "li_b", 4, Seq("l_orderkey"))
    core.Layout.writeBucketed(
      orders.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b", 4,
      Seq("l_orderkey"))
    val auto = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(auto)
    try {
      spark.conf.set(auto, "-1") // rule out broadcast: co-location must carry it
      val joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
      assert(shuffles(joined) == 0,
        plan(joined)) // the lake layout paid the shuffle once, queries never do
      assert(joined.count() == li.count())
    } finally spark.conf.set(auto, prev)

    // salted two-stage aggregation: same answer as the direct groupBy
    val aggs = Seq(
      core.Layout.SaltedAgg.sumOf(col("l_quantity"), "q"),
      core.Layout.SaltedAgg.countAll("n"))
    val salted = core.Layout.saltedAgg(li, Seq("l_orderkey"), 8, aggs)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val plain = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("shuffle budget: reduce=1, exact dedup=1, 2-D neighborhood=1, warp=0") {
    val c = Tables.eventsCube(spark, dir)
    assert(shuffles(ReduceOps.reduceDimension(c, "t",
      v => Reducers.meanR(v)).df) == 1)

    // the general ordered-array reduce (composed callbacks) must cost the
    // SAME single exchange as the plain-aggregate fast path: the
    // collect_list + scalar folds live in one aggregate projection
    assert(shuffles(ReduceOps.reduceDimensionArray(c, "t", arr =>
      graft.functions.ArrayFns.arrayMean(arr) +
        graft.functions.ArrayFns.arraySd(arr)).df) == 1)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(shuffles(pipeline.Dedup.exact(docs, "doc_id",
      md5(col("text").cast("binary")))) == 1)

    val sess = spark
    import sess.implicits._
    val grid = (for { x <- 0 to 9; y <- 0 to 9 }
      yield (x.toDouble, y.toDouble, 1.0)).toDF("x", "y", "value")
    val gc = DataCube.fromTable(grid, Seq("x", "y"), "value",
      Map("x" -> DimType.Spatial, "y" -> DimType.Spatial))
    assert(shuffles(WindowOps.applyNeighborhood2D(gc, 3, 3,
      v => Reducers.sumR(v)).df) == 1)

    val geo = gc.copy(meta = gc.meta.copy(crs = Some("EPSG:4326")))
    assert(shuffles(ResampleOps.warpCube(geo, "EPSG:32633").df) == 0)

    // fused dedup+product (productExactDedupR): the (okey,ln) min-dedup and
    // the ln-product ride the SAME groupBy(okey) — exactly one exchange
    assert(shuffles(SparkEntry.queries("reduce_product")(spark, dir)) == 1)

    // tiled stencil: halo copies are generated arithmetically (no self-join),
    // so the whole convolution costs exactly the one tile groupBy — and the
    // kernel never multiplies the shuffled row count
    val lgrid = (for { x <- 0L to 19L; y <- 0L to 19L }
      yield (x, y, (x * y).toDouble)).toDF("x", "y", "value")
    val lgc = DataCube.fromTable(lgrid, Seq("x", "y"), "value",
      Map("x" -> DimType.Spatial, "y" -> DimType.Spatial))
    val tiled = KernelOps.applyKernelTiled(lgc,
      Seq(Seq(0.0, 1.0, 0.0), Seq(1.0, 4.0, 1.0), Seq(0.0, 1.0, 0.0)),
      KernelOps.Constant(0.0), 1.0, (0L, 19L), (0L, 19L), tileSize = 8)
    assert(shuffles(tiled.df) == 1, plan(tiled.df))

    // as-of join: both sides reach the matching window through ONE exchange
    // above the union — no range-probe join, no nested loop
    val al = Seq(("a", 1L, 1)).toDF("k", "t", "lv")
    val ar = Seq(("a", 1L, 2)).toDF("k", "rt", "p")
    val aj = graft.core.Joins.asofJoin(al, ar, Seq("k"), "t", "rt", Seq("p"))
    assert(shuffles(aj) == 1, plan(aj))
    assert(!plan(aj).contains("NestedLoop") && !plan(aj).contains("Cartesian"))
  }

  test("incremental dedup: corpus prunes to the key column; exchanges carry keys only") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val inc = pipeline.Dedup.incrementalNew(
      docs.filter(col("doc_id") % 10 === 0),
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id",
      md5(col("text").cast("binary")), expectedNewKeys = 4096)
    val p = plan(inc)
    // the corpus side's scan prunes to the key source (+ the test's own
    // shard-split column) — lang/source/n_chars never leave the parquet;
    // at 100 TB the corpus contributes a bloom-filtered key projection,
    // never documents
    assert(
      "ReadSchema: struct<doc_id:bigint,text:string>".r.findAllIn(p).length == 1, p)
    // the bloom probe lands IN the corpus scan (a DataFilter on the
    // FileScan) as the codegen'd expression, so bloom-rejected rows die
    // before any downstream operator and the span stays whole-stage
    assert(p.contains("graft_bloom_probe"), p)
    // the only exchange is the hit-set distinct, on the fixed-width key;
    // the residue broadcasts into a LeftAnti hash join — the shard never
    // shuffles either
    assert(shuffles(inc) == 1 &&
      "Exchange hashpartitioning\\(_k".r.findAllIn(p).length == 1, p)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("incremental NEAR-dup: bloom probe gates the index band scan; " +
      "no cartesian anywhere") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val idx = pipeline.Dedup.minhashIndex(
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", col("text"))
    val near = pipeline.Dedup.incrementalNearNew(
      docs.filter(col("doc_id") % 10 === 0), idx, col("text"),
      materialize = false)
    val p = plan(near)
    // the shard's bloom filters the CORPUS index's band rows before the
    // candidate join — at 100 TB the standing band table contributes
    // only bloom-admitted rows (true bucket collisions + ~fpp noise) to
    // the exchange, never the full index
    assert(p.contains("graft_bloom_probe"), p)
    // banded LSH + equi-joins throughout: candidate volume tracks
    // matches; nothing degenerates to all-pairs
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
    // verification reads corpus shingles through a semi-join on
    // candidate ids — broadcast, so the corpus-sized shingle table is
    // filtered at the scan rather than shuffled
    assert(p.contains("LeftSemi"), p)
  }

  test("fuzzy join: set arrays never shuffle — exchanges carry census + prefix only") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fj = pipeline.Dedup.jaccardJoin(
      docs.filter(col("doc_id") % 10 === 0),
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", col("text"),
      3, 0.5, cachePrefix = false) // lazy plan for the audit
    val p = plan(fj)
    // no Exchange's partitioning or output carries a _set array: the
    // verification arrays are built at the scan on the join's probe side
    val exchanges = p.linesIterator.filter(_.contains("Exchange ")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("_set")), exchanges.mkString("\n"))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("PQ refine: no cartesian, query tables broadcast, no micro-array exchange") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val book = pipeline.Similarity.pqCodebook(emb, "vec_id", "embedding",
      dims = 64, m = 16, k = 32)
    val out = pipeline.Similarity.pqTopKRefined(
      emb.filter(col("vec_id") % 50 === 0), emb, "vec_id", "embedding",
      book, k = 3, shortlist = 25)
    val p = plan(out)
    // the ADC join must be an equi-join with the m×k query tables on the
    // broadcast side — a nested-loop or cartesian over (codes × queries)
    // is the scale-killer shape
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // no exchange carries the micro-unit arrays ("u") or full vectors on
    // the codes path: exchanges partition on ids/(j,c)/window keys only —
    // the r12 fuzzy-join lesson (candidate rows silently carrying array
    // payloads through an exchange), pinned here before scale finds it
    val exchanges = p.linesIterator.filter(_.contains("Exchange ")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains(" u#")), exchanges.mkString("\n"))
    // shortlist + final rank windows partition per query, never globally
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("pipeline ops: scan-speed ops shuffle-free; packing never serializes") {
    // split / redaction / quantization / chunking are single-pass Column
    // programs — ZERO exchanges, the 100-TB contract that makes them free
    // riders on any scan
    for (q <- Seq("train_test_split", "pii_redact", "embed_quantize",
        "doc_chunks", "text_repetition", "html_extract", "url_canonicalize")) {
      val df = SparkEntry.queries(q)(spark, dir)
      assert(shuffles(df) == 0, s"$q: ${plan(df)}")
      assert(!plan(df).contains("Exchange SinglePartition"), q)
    }
    // the distributed prefix sum must NOT fall back to a global window:
    // no SinglePartition exchange anywhere in the packing plan
    val packed = SparkEntry.queries("pack_sequences")(spark, dir)
    assert(!plan(packed).contains("Exchange SinglePartition"), plan(packed))
    // stratified quota windows partition by stratum, never globally
    val strat = SparkEntry.queries("stratified_sample")(spark, dir)
    assert(!plan(strat).contains("Exchange SinglePartition"), plan(strat))
    // decontamination joins on derived shingles only — no cross products
    val dec = SparkEntry.queries("decontaminate")(spark, dir)
    assert(!plan(dec).contains("CartesianProduct") &&
      !plan(dec).contains("BroadcastNestedLoopJoin"), plan(dec))
    // DSIR / substring-dup / mixture: equi-joins on derived keys only — a
    // CartesianProduct over fact rows would be the scale-killer. (DSIR and
    // the mixture DO carry one SinglePartition exchange each: the totals
    // aggregate over the ≤B-row bucket/source table — metadata-sized by
    // construction, not a data serialization point.)
    for (q <- Seq("mixture_sample", "bpe_tokenize", "corpus_report")) {
      val df = SparkEntry.queries(q)(spark, dir)
      assert(!plan(df).contains("CartesianProduct"), s"$q: ${plan(df)}")
    }
    // the composed web-crawl pipeline: equi-joins on ids/derived keys only,
    // and the packing stage must not serialize the corpus
    val crawl = SparkEntry.queries("crawl_e2e")(spark, dir)
    assert(!plan(crawl).contains("CartesianProduct") &&
      !plan(crawl).contains("BroadcastNestedLoopJoin"), plan(crawl))
    assert(!plan(crawl).contains("Exchange SinglePartition"), plan(crawl))
    // The scope-cached operators (dsirWeights / substringDupStats /
    // charTrigramScore) checkpoint their result, which truncates the lineage
    // the audit needs — inspect the cache-disabled form, which is the SAME
    // plan minus the InMemoryRelation nodes.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val audited = Seq(
      "dsir_weights" -> pipeline.Importance.dsirWeights(docs, "doc_id",
        col("text"), col("lang") === "en", cacheGrams = false),
      "substring_dup" -> pipeline.Dedup.substringDupStats(docs, "doc_id",
        col("text"), cacheWindows = false),
      "lm_score" -> pipeline.LanguageModel.charTrigramScore(docs, "doc_id",
        col("text"), col("lang") === "en", cacheTrigrams = false))
    for ((q, df) <- audited)
      assert(!plan(df).contains("CartesianProduct"), s"$q: ${plan(df)}")
    // substring-dup's window table is corpus-sized: IT must never collapse
    // to a single partition
    val sub = pipeline.Dedup.substringDupStats(docs, "doc_id", col("text"),
      cacheWindows = false)
    assert(!plan(sub).contains("Exchange SinglePartition"), plan(sub))
  }

  test("line dedup shuffles fixed-width keys only — line text never moves") {
    val ld = SparkEntry.queries("line_dedup")(spark, dir)
    // budget: groupBy(hash) + groupBy(doc) — the reassembly join broadcasts
    // the kept-position table, so exactly 2 exchanges at this scale
    assert(shuffles(ld) == 2, plan(ld))
    // and NO exchange output may carry line or document text: the scale
    // claim in SCALE.md is that only (_h, _id, _pos) / (_id, positions)
    // rows cross the wire
    val phys = ld.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan // pre-execution this is the initial physical plan
      case p => p
    }
    val exch = phys.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.output.map(_.name)
    }
    assert(exch.nonEmpty)
    for (cols <- exch)
      assert(!cols.contains("_line") && !cols.contains("_text"),
        s"text column in shuffle: $cols")
    // string doc ids must survive (no blind long cast): a UUID-keyed crawl
    val sess = spark
    import sess.implicits._
    val sdf = Seq(("u-b", "same line. unique b"), ("u-a", "same line. unique a"))
      .toDF("id", "txt")
    val out = pipeline.Dedup.lineDedup(sdf, "id", col("txt"))
      .orderBy("id").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("u-a", "u-b"))
    // first occurrence under the id's natural (string) ordering: u-a wins
    assert(out(0).getLong(2) == 2L && out(1).getLong(2) == 1L)
    assert(out(1).getString(3) == "unique b")
  }

  test("Z-order clustered writes produce spatially compact files") {
    val sess = spark
    import sess.implicits._
    val grid = (for { x <- 0 until 16; y <- 0 until 16 }
      yield (x.toDouble, y.toDouble, (x * 16 + y).toDouble))
      .toDF("x", "y", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString
    core.Layout.writeSpatialClustered(grid, dir, "x", "y",
      nFiles = 4, bits = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == 256)
    val files = back.inputFiles
    assert(files.length == 4, files.mkString(","))
    // every file must cover a compact tile: the mean per-file bbox area is
    // near total/4 (Z-order quadrants), nowhere near the full extent a
    // random layout would give each file
    val areas = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y")))
        .first()
      (r.getDouble(1) - r.getDouble(0) + 1) * (r.getDouble(3) - r.getDouble(2) + 1)
    }
    val meanArea = areas.sum / areas.length
    assert(meanArea <= 0.35 * 256, s"mean per-file bbox area $meanArea")
    // and the parquet min/max stats make a bbox read skip files entirely:
    // a quadrant predicate must touch fewer files than the full scan
    val pruned = back.filter(col("x") < 4 && col("y") < 4)
    assert(pruned.count() == 16)
  }

  test("bilinear coordinate bracketing plans contain no cross product") {
    // axisBilinearMap is a sorted-union window, not a coordinate crossJoin —
    // the plan must carry no cartesian/nested-loop join anywhere
    for (q <- Seq("resample_cube_spatial", "resample_bilinear")) {
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
    }
  }

  test("full-PSL registeredDomain compiles to hash-set InSet probes, no giant In") {
    import org.apache.spark.sql.catalyst.expressions.{In, InSet}
    // parquet-backed source (a local relation would constant-fold the
    // whole lookup away before any In→InSet conversion could be observed)
    val df = Tables.documents(spark, dir)
      .select(concat(lit("crawl"), col("doc_id"), lit(".example.co.uk")).as("host"))
      .select(graft.pipeline.TextAnalysis.registeredDomain(col("host")).as("d"))
    val exprs = df.queryExecution.optimizedPlan.expressions
      .flatMap(e => e +: e.collect { case c => c })
    val inSets = exprs.collect { case s: InSet => s.hset.size }
    // the 2-label plain group alone is ~5.4k rules (+ punycode twins); the
    // optimizer must have converted every big literal list to an InSet
    // hash probe — a residual `In` with a thousands-long child list would
    // interpret a linear scan per row
    assert(inSets.nonEmpty && inSets.max > 5000, s"InSet sizes: $inSets")
    val bigIns = exprs.collect { case i: In if i.list.size > 100 => i.list.size }
    assert(bigIns.isEmpty, s"unconverted In lists of sizes $bigIns")
    // the whole lookup stays codegen-compatible (no interpreted fallback)
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(codegen.contains("WholeStageCodegen subtree"), codegen.take(500))
  }

  test("sketch aggregations: one data exchange, sketches on the wire, no key-space shuffle") {
    // value_quantiles: partial sketches combine map-side — the ONLY
    // hash exchange partitions on the groupBy key (event_type), carrying
    // one O(capacity) sketch record per (partition, type), never rows
    val vq = SparkEntry.queries("value_quantiles")(spark, dir)
    assert(shuffles(vq) == 1, plan(vq))
    // source_overlap's sketch stage: ONE exchange for the per-source
    // sketch agg, and NO exchange output carries shingle text (the wire
    // carries O(k) sketch records). The full query checkpoints this tiny
    // frame so the corpus pass runs ONCE — the pair join then reads the
    // checkpoint with ZERO hash exchanges (two 20-row summary frames,
    // bounded by source-count², never document-count)
    val sketchStage = graft.sources.Tables.documents(spark, dir)
      .select(col("source"),
        explode(graft.pipeline.Dedup.shingleArray(col("text"), 3)).as("shingle"))
      .groupBy(col("source"))
      .agg(graft.functions.ThetaSketchAgg.column(
        xxhash64(col("shingle")), 16384).as("sk"))
    val sp = plan(sketchStage)
    assert(shuffles(sketchStage) == 1, sp)
    val exchanges = sp.linesIterator.filter(_.contains("Exchange ")).toSeq
    assert(exchanges.nonEmpty && !exchanges.exists(_.contains("shingle")), sp)
    val so = SparkEntry.queries("source_overlap")(spark, dir)
    assert(shuffles(so) == 0, plan(so))
    // domain_heavy_hitters: global agg — partials merge into one final
    // sketch through a SinglePartition exchange of sketch records (the
    // correct shape for a global top-k: capacity bytes per partition,
    // not the domain key space)
    val hh = SparkEntry.queries("domain_heavy_hitters")(spark, dir)
    assert(shuffles(hh) == 0, plan(hh)) // global agg: SinglePartition only
    assert(plan(hh).contains("Exchange SinglePartition"), plan(hh))
  }

  test("topk_per_type: map-side combine, one exchange of O(k) heaps") {
    // the bounded-heap aggregator must keep the row_number()-window
    // shape OUT of the plan: no Window, no per-group Sort of data rows —
    // one partial (map-side) ObjectHashAggregate per partition, ONE hash
    // exchange on the group key carrying ≤ k-entry heaps, final merge
    val tk = SparkEntry.queries("topk_per_type")(spark, dir)
    val p = plan(tk)
    assert(shuffles(tk) == 1, p)
    assert(!p.contains("Window"), p)
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("partial_topkagg") || p.contains("partial_TopKAgg")
      || p.toLowerCase.contains("partial_topkagg"), p)
  }

  test("aggregate_spatial_window: broadcast axis maps, one agg exchange") {
    // the pixel-window maps are metadata-sized axis frames — they must
    // reach the facts as BROADCAST joins, leaving the keyed aggregation's
    // exchange as the only FACT-table shuffle (the axis frames' own tiny
    // distinct/index exchanges carry axis labels, never fact rows)
    val asw = SparkEntry.queries("aggregate_spatial_window")(spark, dir)
    val p = plan(asw)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("Exchange hashpartitioning\\(_lbl_x".r.findAllIn(p).length == 1, p)
  }

  test("range joins plan as equi-joins on driver data, never nested-loop") {
    for (q <- Seq("range_join", "interval_overlap_join")) {
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
      assert(p.contains("SortMergeJoin") || p.contains("HashJoin"), s"$q: $p")
    }
  }

  test("climatology_anomaly: normals broadcast onto the fact scan, no window") {
    // the normals are metadata-sized (periods x bands): they must reach
    // the events as a BROADCAST join — the fact table itself never
    // shuffles for the subtraction (its only exchange computes the
    // normals), and no Window sneaks in
    val a = SparkEntry.queries("climatology_anomaly")(spark, dir)
    val p = plan(a)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("sampling/quota queries: bounded heap, never a row_number window") {
    for (q <- Seq("uniform_sample_k", "weighted_sample_k",
        "domain_quota_sample", "stratified_sample_k", "quality_topk_gate")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val p = plan(df)
      assert(!p.contains("Window"), s"$q:\n$p")
      assert("ObjectHashAggregate".r.findAllIn(p).length >= 2, s"$q:\n$p")
    }
  }

  test("text_normalize: pure scan-stage tree, zero shuffles") {
    val df = SparkEntry.queries("text_normalize")(spark, dir)
    assert(shuffles(df) == 0, plan(df))
  }

  test("quality_threshold_gate: sketch agg + broadcast threshold, no window") {
    // the scale path must never sort a stratum: ONE hash exchange (the
    // per-source sketch agg, O(capacity) records), thresholds broadcast
    // back onto the scan — no Window, no shuffled join. Audited on the
    // LAZY stored-score shape (cacheScored = false); the driver row's
    // default caches the scored projection, whose audited plan would be
    // the checkpoint scan
    val scored = Tables.documents(spark, dir).select(col("doc_id"),
      col("source"), (col("doc_id") % 997).as("q_milli"))
    val df = graft.pipeline.Sampling.scoreThresholdGate(
      scored, col("q_milli"), Seq("source"), keepPm = 250,
      cacheScored = false)
    val p = plan(df)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(shuffles(df) == 1, p)
  }

  test("bm25: dl rides the postings agg — no corpus-keyed join anywhere") {
    // the document length is reconstructed by first(dl) inside the
    // map-side-combinable tf aggregation, so the ONLY corpus-keyed
    // exchange is the postings agg itself: every join in the plan must be
    // broadcast (df_ and stats are q-row / 1-row frames), and the r16
    // corpus-keyed (id, dl) shuffle join must never reappear. Audited on
    // the LAZY shape (cachePostings = false): the driver rows' default
    // persists the postings and scope-checkpoints the k-row result, whose
    // audited plan would be the checkpoint scan — a corpus-keyed exchange
    // upstream of the postings agg would be invisible there (the r17
    // ADVICE finding).
    val sess = spark
    import sess.implicits._
    val docs = Tables.read(spark, dir, "documents")
    val probe = Seq((1L, "vector"), (1L, "merge"), (2L, "scan"),
      (2L, "window")).toDF("query_id", "term")
    val lazyShapes = Seq(
      "bm25_topk" -> pipeline.Retrieval.bm25TopK(docs,
        Seq("vector", "merge", "scan", "window"), k = 20,
        cachePostings = false),
      "bm25_batch_topk" -> pipeline.Retrieval.bm25BatchTopK(docs, probe,
        k = 10, cachePostings = false))
    for ((q, df) <- lazyShapes) {
      val p = plan(df)
      assert(!p.contains("SortMergeJoin"), s"$q:\n$p")
      assert(!p.contains("ShuffledHashJoin"), s"$q:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$q:\n$p")
    }
  }
}
