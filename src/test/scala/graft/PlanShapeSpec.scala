package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Physical-plan regression guards for the scale-posture claims the
  * query comments make. These don't check answers (oracles and the
  * other specs do) — they check the PLAN is still the plan we
  * designed, so a refactor that silently inserts a shuffle, loses
  * parquet pushdown, or widens a scan fails here instead of only
  * showing up as a 100 TB regression.
  */
class PlanShapeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Formatted explain (full scan details — the default treeString
    * truncates PushedFilters mid-list) plus the executed-plan tree.
    */
  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")) +
      "\n" + df.queryExecution.executedPlan.toString

  private def q(name: String): DataFrame = Registry.queries(name)(spark, dir)

  test("q02 filter+project: predicate and column pruning reach the parquet scan") {
    val plan = planOf(q("q02_filter_project"))
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_shipdate.*"),
      "the shipdate predicate must be pushed to the scan")
    // scan must not read the full 11-column lineitem schema
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(readSchemas.nonEmpty &&
      readSchemas.forall(_.split(",").length < 11),
      s"scan reads too many columns: $readSchemas")
  }

  test("q36 unpivot is a pure Expand: no shuffle before the final sort") {
    val plan = planOf(q("q36_unpivot"))
    assert(plan.contains("Expand"), "unpivot should plan as Expand")
    // the only exchange allowed is the range partition for orderBy
    val exchanges = "Exchange (\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toList
    assert(exchanges.forall(_.startsWith("rangepartitioning")),
      s"unexpected non-sort exchange(s): $exchanges")
  }

  test("q38 bloom prefilter stage is a scan-level filter, not a join") {
    import org.apache.spark.sql.graftbridge.BloomBridge
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val bloomBytes = orders.filter(col("o_orderpriority") === "1-URGENT")
      .agg(BloomBridge.bloomAgg(col("o_orderkey"), 10000L, 81920L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val pre = lineitem.filter(
      BloomBridge.mightContain(lit(bloomBytes), col("l_orderkey")))
    val plan = planOf(pre)
    assert(!plan.contains("Join"), s"prefilter must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"prefilter must not shuffle:\n$plan")
    assert(plan.contains("might_contain"), "bloom probe missing from plan")
  }

  test("q05 bounded dims join broadcast, not sort-merge") {
    val plan = planOf(q("q05_revenue_by_nation"))
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "small-dim joins must not sort-merge at this scale")
  }

  test("q50 exact dedup shuffles the 64-hex key, not document bodies") {
    val plan = planOf(q("q50_exact_dedup"))
    // the text column must not survive into any exchange: the scan may
    // read it (sha2 input) but every exchange row is (hash, doc_id, ...)
    val exchangeLines = plan.linesIterator
      .filter(_.contains("Exchange")).mkString("\n")
    assert(!exchangeLines.contains("text"),
      s"document bodies cross the shuffle:\n$exchangeLines")
  }

  test("q79 vocab: the rank window runs on the top-K cut, never corpus cardinality") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Window => LWindow}
    // assert on the optimized LOGICAL plan (explain text prints
    // parent-first, so substring checks around the Window node are
    // vacuous): the Window's own subtree must contain the limit —
    // i.e. the top-K cut executes BEFORE id assignment, so the
    // single-partition rank only ever sees K rows — and the corpus
    // aggregate must sit BELOW that limit, not between limit and
    // window
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan}
    // nodes on the path from `from` down to the first GlobalLimit
    // (exclusive of the limit itself); None if no limit is reachable
    def pathToLimit(from: LogicalPlan): Option[Seq[LogicalPlan]] = from match {
      case _: GlobalLimit => Some(Seq.empty)
      case p => p.children.view.flatMap(pathToLimit).headOption.map(p +: _)
    }
    val optimized = q("q79_vocab").queryExecution.optimizedPlan
    val windows = optimized.collect { case w: LWindow => w }
    assert(windows.nonEmpty, s"expected a Window in:\n$optimized")
    windows.foreach { w =>
      val path = pathToLimit(w.child)
      assert(path.isDefined,
        s"the window must be fed by a limited subtree, got:\n${w.child}")
      // nothing cardinality-expanding or re-aggregating may sit
      // BETWEEN the window and its limit — otherwise the rank window
      // is back at corpus cardinality even though a limit exists
      // somewhere below
      path.get.foreach {
        case bad @ (_: Aggregate | _: Join | _: Generate) =>
          fail(s"${bad.nodeName} between the Window and its limit:\n$optimized")
        case _ =>
      }
      val limits = w.child.collect { case l: GlobalLimit => l }
      assert(limits.exists(_.collect { case a: Aggregate => a }.nonEmpty),
        "the token aggregate must lie below the limit, not above it")
    }
  }

  test("q109 BM25: query terms, df, and corpus stats ride broadcasts") {
    val plan = planOf(q("q109_bm25"))
    // the bounded sides (top-3 terms, term-cardinality df, 1-row
    // stats) must ride broadcasts; the tf ⋈ dl doc-keyed join is the
    // one legitimately corpus-scale shuffle in the plan
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"no broadcast join in q109 plan:\n$plan")
  }

  test("q111 decontamination: capped eval side broadcasts like q60") {
    val plan = planOf(q("q111_semantic_decontamination"))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"eval side should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "decontamination scan must never be a cartesian product")
  }

  test("q80 quality band: percentile bounds broadcast; no corpus-wide window or sort-merge") {
    val plan = planOf(q("q80_quality_band"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the 1-row bounds must broadcast back over the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "bounds attachment must not sort-merge")
    assert(!plan.contains("Window"),
      "the band filter must not be computed via a corpus-wide window")
  }

  test("q93 contamination: benchmark shingles ride a broadcast semi join") {
    val plan = planOf(q("q93_contamination_frac"))
    assert(plan.contains("LeftSemi"),
      s"benchmark membership must be a semi join:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "the benchmark shingle set is the bounded side and must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "corpus windows must never sort-merge against the benchmark")
  }

  test("q94 training order: global prefix is TakeOrdered, never a full sort") {
    val plan = planOf(q("q94_training_order"))
    assert(plan.contains("TakeOrderedAndProject"),
      s"the bounded prefix must plan as TakeOrderedAndProject:\n$plan")
    // the only exchange is the per-source hash partition for the window
    val exchanges = "Exchange (\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toList
    assert(exchanges.nonEmpty && exchanges.forall(_.startsWith("hashpartitioning")),
      s"unexpected exchange(s) — a rangepartitioning here is a global sort: $exchanges")
  }

  // Structural scan census: direct parquet scans vs cached-table
  // reads. Traversal, not string matching, because a cached plan's
  // own scan renders inside every InMemoryRelation string.
  private def scanCensus(name: String): (Int, Int) = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def collectAll[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] = {
      val below = p match {
        case a: AdaptiveSparkPlanExec => collectAll(a.inputPlan)(f)
        case _ => p.children.flatMap(c => collectAll(c)(f))
      }
      (if (f.isDefinedAt(p)) Seq(f(p)) else Nil) ++ below
    }
    val plan = q(name).queryExecution.executedPlan
    val files = collectAll(plan) { case s: FileSourceScanExec => s }.size
    val caches = collectAll(plan) { case m: InMemoryTableScanExec => m }.size
    spark.catalog.clearCache()
    (files, caches)
  }

  test("q95 source KL: consumers read the cached pair aggregate, never re-scan the corpus") {
    // the source totals, corpus token counts, and grand total must all
    // derive from the persisted (source, token) aggregate — without the
    // persist, Spark shares no plan subtree and the corpus is re-read
    // per consumer (measured: 12 parquet scans)
    val (fileScans, cacheReads) = scanCensus("q95_source_kl")
    assert(fileScans == 0, s"direct corpus re-scan leaked into the plan ($fileScans)")
    assert(cacheReads == 4, s"expected 4 cached-aggregate readers, found $cacheReads")
  }

  test("q98 bigram xent: one corpus scan beyond the cached bigram table") {
    // the per-token join and both model tables derive from the
    // persisted exploded-bigram table; the only direct scan left is
    // the vocabulary-size aggregation
    val (fileScans, cacheReads) = scanCensus("q98_bigram_xent")
    assert(fileScans == 1, s"expected only the vocab scan, found $fileScans")
    assert(cacheReads == 3, s"expected 3 cached-bigram readers, found $cacheReads")
  }

  test("q54/q100 read the shared stage tables: no shingling, no Jaccard, no corpus scan in-plan") {
    // the session-shared stages exist so the composed dedup family
    // computes its pair/verdict relations ONCE — the consumers' plans
    // must therefore be pure reads of the materialized tables, with
    // zero trace of the verification machinery
    val p54 = planOf(q("q54_ngram_neardup")).toLowerCase
    assert(!p54.contains("shingle_hashes") && !p54.contains("jaccard"),
      s"q54 must read the shared pair table, not recompute it:\n$p54")
    assert(!p54.contains("documents.parquet"),
      "q54's plan must not touch the corpus at all")
    val p100 = planOf(q("q100_dedup_verdicts")).toLowerCase
    assert(!p100.contains("shingle_hashes") && !p100.contains("jaccard") &&
      !p100.contains("sha2"),
      s"q100 must read the shared verdict table:\n$p100")
    spark.catalog.clearCache()
  }

  test("q157/q160 never read resident text; q161 scans the corpus zero times") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def collectScans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val below = p match {
        case a: AdaptiveSparkPlanExec => collectScans(a.inputPlan)
        case _ => p.children.flatMap(collectScans)
      }
      (p match { case s: FileSourceScanExec => Seq(s); case _ => Nil }) ++ below
    }
    def docScans(name: String): Seq[FileSourceScanExec] =
      collectScans(q(name).queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths
          .exists(_.toString.contains("documents.parquet")))

    // q157 (incremental manifest): resident text is NEVER re-read —
    // every documents.parquet scan in the plan is the BATCH slice,
    // with the id-threshold filter PUSHED to the scan
    val s157 = docScans("q157_incremental_manifest")
    assert(s157.nonEmpty, "q157 must scan the batch slice")
    for (sc <- s157)
      assert(sc.dataFilters.exists(f =>
          f.toString.contains("doc_id") && f.toString.contains(">=")),
        s"q157 scans documents without the batch threshold: ${sc.dataFilters}")
    // the semantic delta arm probes the CELL-PARTITIONED persisted
    // train embeddings under dynamic partition pruning (the q128/q154
    // scan discipline) — never a full resident-embedding scan
    val p157 = planOf(q("q157_incremental_manifest"))
    assert(p157.contains("dynamicpruning"),
      s"q157's semantic delta arm carries no dynamic partition pruning:\n$p157")

    // q160 (manifest-store read): the served manifest composes ONLY
    // persisted state — zero raw-corpus scans, and the three store
    // roots appear in the plan
    assert(docScans("q160_manifest_store_read").isEmpty,
      "q160 must not touch documents.parquet at all")
    val p160 = planOf(q("q160_manifest_store_read"))
    for (store <- Seq("manifest-store", "verdict-store", "containment-store"))
      assert(p160.contains(store), s"q160 must read the $store:\n$p160")

    // q161 (index-served image near-dup): the probe batch is hashed
    // ONCE and checkpointed before the banded probe, so the serving
    // plan contains ZERO raw-corpus scans — everything reads the
    // stored index (bands + hashes) against the materialized probe
    val s161 = docScans("q161_incremental_phash")
    assert(s161.isEmpty,
      s"q161's serving plan must not scan documents.parquet, saw ${s161.size}")
    val p161 = planOf(q("q161_incremental_phash"))
    assert(p161.contains("phash-index"),
      s"q161's corpus side must come from the stored index:\n$p161")
    spark.catalog.clearCache()
  }

  test("q131/q141 are store reads: zero raw-corpus scans, no per-read " +
      "component loop — verdicts, clusters and scores come from " +
      "maintained state") {
    // q131: text half from the persisted VerdictStore, semantic half
    // from the persisted component relation
    val p131 = planOf(q("q131_crossmodal_verdicts"))
    for (raw <- Seq("documents.parquet", "embeddings.parquet"))
      assert(!p131.contains(raw), s"q131 must not scan $raw:\n$p131")
    for (store <- Seq("verdict-store", "emb-neardup-comps"))
      assert(p131.contains(store), s"q131 must read the $store:\n$p131")

    // q141: clusters from the persisted component table, scores from
    // the persisted CalibrationStore — the only scans are maintained
    // state
    val p141 = planOf(q("q141_quality_canonical"))
    for (raw <- Seq("documents.parquet", "embeddings.parquet"))
      assert(!p141.contains(raw), s"q141 must not scan $raw:\n$p141")
    for (store <- Seq("calibration-store", "neardup-comps"))
      assert(p141.contains(store), s"q141 must read the $store:\n$p141")
    spark.catalog.clearCache()
  }

  test("q114 serves from the stored index: the corpus text is scanned zero times") {
    // exactly ONE documents.parquet scan (the probe batch); the corpus
    // side must come from the index's stored hash arrays — shingling
    // appears only on the probe projection
    // count physical scan NODES in the formatted section (each scan
    // prints its Location exactly once there; the AQE tree dump
    // repeats nodes, so it can't be counted)
    val fmt = q("q114_incremental_neardup").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val docScans = "documents\\.parquet".r.findAllIn(fmt).length
    assert(docScans == 1,
      s"q114 must scan documents.parquet exactly once (the probe batch), saw $docScans:\n$fmt")
    assert(fmt.toLowerCase.contains("shingle_hashes"),
      "the probe batch is shingled in-plan")
    // the corpus side reads the index store's hash arrays
    assert(fmt.contains("minhash-index"),
      s"the corpus side must come from the stored index:\n$fmt")
    spark.catalog.clearCache()
  }

  test("q153 is a pure store read: zero documents scans, zero hashing — " +
      "everything was signed and decided at ingest") {
    val fmt = q("q153_verdict_store_read").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val docScans = "documents\\.parquet".r.findAllIn(fmt).length
    assert(docScans == 0,
      s"q153 must not scan the corpus at all, saw $docScans scans:\n$fmt")
    assert(!fmt.toLowerCase.contains("shingle_hashes") &&
      !fmt.toLowerCase.contains("sha2"),
      s"q153 must not re-sign anything — signatures live in the store:\n$fmt")
    assert(fmt.contains("verdict-store"),
      s"the read must come from the persisted store:\n$fmt")
    spark.catalog.clearCache()
  }

  test("q124 covariance: the d² explode sits ABOVE the aggregate, not below") {
    // the scale contract: rows fold into the 2080-slot buffer map-side
    // (ObjectHashAggregate partial merge), and the pair explode runs on
    // the single post-aggregate row — a refactor that explodes terms
    // before aggregating would shuffle rows×d² tuples at 100 TB
    val plan = q("q124_embedding_covariance").queryExecution.executedPlan.toString
    val aggIdx = plan.indexOf("ObjectHashAggregate")
    val genIdx = plan.indexOf("Generate")
    assert(aggIdx >= 0, s"expected an ObjectHashAggregate in:\n$plan")
    assert(genIdx >= 0 && genIdx < aggIdx,
      // treeString prints parents first: the Generate (explode) must
      // appear ABOVE (= before, in print order) the aggregate
      s"explode must consume the aggregate output, not feed it:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q132/q136 per-doc signals are map-side: the only exchange is " +
      "the final sort's range partition") {
    // the repetition counts / chunk boundaries are HOF folds over
    // each row's own token array — a refactor that swaps in the
    // explode + groupBy formulation would add a token-cardinality
    // shuffle and fail here
    for (name <- Seq("q132_repetition_signals", "q136_cdc_chunking")) {
      val plan = q(name).queryExecution.executedPlan.toString
      val exchanges =
        "Exchange (\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toList
      assert(exchanges.forall(_.startsWith("rangepartitioning")) &&
        exchanges.size == 1,
        s"$name: expected one range exchange, got $exchanges")
    }
  }

  test("q132/q133 read the shared quality-signal stage: the corpus " +
      "text is folded once, not per consumer") {
    for (name <- Seq("q132_repetition_signals",
        "q133_quality_filter_verdicts")) {
      val plan = planOf(q(name))
      assert(!plan.contains("documents.parquet"),
        s"$name must read the persisted signal relation, not the corpus:\n$plan")
      assert(plan.contains("quality-signals"),
        s"$name must scan the shared signal stage:\n$plan")
      assert(!plan.toLowerCase.contains("array_distinct"),
        s"$name's plan must carry no per-doc fold machinery:\n$plan")
    }
    spark.catalog.clearCache()
  }

  test("q134 z-order census: pruned scan, one aggregation shuffle") {
    val plan = planOf(q("q134_zorder_key_census"))
    // the interleave needs only the two key columns + the measure
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(readSchemas.nonEmpty && readSchemas.forall(_.split(",").length <= 3),
      s"census scan reads too many columns: $readSchemas")
    val exchanges =
      "Exchange (\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toList
    assert(exchanges.count(_.startsWith("hashpartitioning")) == 1,
      s"expected exactly one aggregation shuffle, got $exchanges")
  }

  test("q135 hard negatives broadcast the query side like q60") {
    val plan = q("q135_hard_negatives").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"capped query side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q137/q138/q140 read the shared chunk store: the corpus text " +
      "is never re-chunked in-plan") {
    for (name <- Seq("q137_chunk_dedup_census", "q138_boilerplate_removal",
        "q140_chunk_decontamination")) {
      val plan = planOf(q(name))
      assert(!plan.contains("documents.parquet"),
        s"$name must read the persisted chunk relation, not the corpus:\n$plan")
      assert(plan.contains("chunk-index"),
        s"$name must scan the shared chunk store:\n$plan")
      assert(!plan.toLowerCase.contains("md5"),
        s"$name's plan must carry no chunk-boundary machinery:\n$plan")
    }
    // q140's eval side additionally reads the persisted eval chunk
    // set, not a per-run distinct over the store
    val p140 = planOf(q("q140_chunk_decontamination"))
    assert(p140.contains("eval-chunks"),
      s"q140 must read the persisted eval chunk set:\n$p140")
    spark.catalog.clearCache()
  }

  test("q158 fingerprints: one codegen'd phash64 per row, fused with " +
      "the zero-token filter") {
    // the 22.8s → 1.3s win (commit 476c251) is the native PHash64
    // kernel evaluated ONCE per row INSIDE whole-stage codegen; two
    // silent ways to lose it again are (a) a projection refactor that
    // lets CollapseProject duplicate the struct (hi and lo each
    // extracted from their own phash64 copy → the 72-cell fold runs
    // twice), and (b) a plan change that drops the projection out of
    // codegen (the kernel falls back to per-row interpreted eval)
    val fp = graft.queries.MultimodalOps.phashFingerprints(
      spark.read.parquet(s"$dir/documents.parquet"))
    val plan = fp.queryExecution.executedPlan.toString
    val kernelLines = plan.linesIterator.filter(_.contains("phash64")).toList
    assert(kernelLines.nonEmpty, s"phash64 kernel missing from:\n$plan")
    for (line <- kernelLines) {
      assert("phash64".r.findAllIn(line).length == 1,
        s"phash64 must be evaluated once per row, not per extracted half:\n$line")
      assert(line.contains("*("),
        s"phash64's projection fell out of whole-stage codegen:\n$plan")
    }
    // the zero-token filter fuses into the same codegen stage as the
    // kernel projection — no exchange, no extra stage between them
    assert(!plan.contains("Exchange"),
      s"fingerprinting must be a single map-side stage:\n$plan")
  }

  test("q165 ADC pair projection stays 8-lookups-thin: no per-pair " +
      "array/map reconstruction above the cross join (the r13 hot-" +
      "loop fix, pinned structurally)") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Project}
    import org.apache.spark.sql.types.{ArrayType, MapType}
    val plan = q("q165_pq_adc_search").queryExecution.optimizedPlan
    // the Project that DEFINES the approximate pair score — the one
    // expression evaluated per (query × code) pair, the term that
    // dominates a 100 TB ADC pass
    val scoring = plan.collect {
      case p: Project if p.projectList.exists {
        case a: Alias => a.name == "ascore"
        case _ => false
      } => p
    }
    assert(scoring.nonEmpty, "no Project defines 'ascore' — the ADC " +
      "scoring projection moved; re-pin this spec to the new shape")
    scoring.foreach { p =>
      assert(p.collectFirst { case j: Join => j }.isDefined,
        "the ascore projection is no longer above the pair join")
      val nodes = p.projectList.flatMap(_.collect { case e => e })
      def none(pred: Expression => Boolean, what: String): Unit =
        assert(!nodes.exists(pred),
          s"per-pair $what in the ADC scoring projection — the r13 " +
            "reconstruction hot loop is back (a pair must cost 8 " +
            "array lookups + adds off broadcast-side LUTs)")
      none(_.isInstanceOf[CreateArray], "array construction")
      none(_.isInstanceOf[CreateMap], "map construction")
      none(_.isInstanceOf[GetMapValue], "map lookup")
      none(_.isInstanceOf[HigherOrderFunction], "higher-order lambda")
      none(_.isInstanceOf[Concat], "concat")
      none({
        case l: Literal => l.dataType.isInstanceOf[ArrayType] ||
          l.dataType.isInstanceOf[MapType]
        case _ => false
      }, "array/map literal (plan-literal codebook state)")
      // exactly PqSubspaces O(1) LUT lookups — nothing else indexes
      // an array per pair (|recon| and |q| are hoisted attributes)
      val lookups = nodes.count(_.isInstanceOf[ElementAt])
      assert(lookups === 8,
        s"expected exactly 8 O(1) LUT lookups per pair, got $lookups")
    }
  }

  test("q142 heap top-k plans as an aggregate: no Window, no full-" +
      "group sort") {
    val plan = q("q142_topk_heap_agg").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"the bounded-heap form must not fall back to a sort window:\n$plan")
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"),
      s"expected the typed-aggregate plan:\n$plan")
    // the only exchanges: one hash shuffle for the aggregate, one
    // range partition for the output ordering
    val exchanges =
      "Exchange (\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toList
    assert(exchanges.count(_.startsWith("hashpartitioning")) == 1 &&
      exchanges.count(_.startsWith("rangepartitioning")) == 1,
      s"unexpected exchange set: $exchanges")
  }
}
