package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query (or just the names
  * passed as args) against `SPARK_GRAFT_SF_DIR` and emits ONE JSON
  * line, also written to `SPARK_GRAFT_BENCH_OUT` (default
  * `BENCH_LOCAL.json`) because the stdout line is easily buried in
  * sbt log decoration.
  *
  * A query failure is NOT swallowed into a fake timing: the failure
  * is recorded per-query in `errors`, the total is marked, and the
  * process exits nonzero — a regression must look like one.
  *
  * Each query is timed `SPARK_GRAFT_REPS` times (default 3) and the
  * MEDIAN is recorded: the round-3 end-of-round snapshot recorded a
  * 151.8s total whose re-run measured 76.3s — single-shot timings on
  * a shared machine are one GC pause or noisy neighbor away from a
  * phantom 10× regression, and the median of 3 absorbs exactly that
  * one-off spike.
  */
object Bench {
  /** Default local parallelism — single source for the session AND
    * the artifact-routing guard below (divergence would silently
    * stale the committed BENCH_LOCAL.json).
    */
  private val DefaultCpus = "4"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", DefaultCpus).trim
    // The committed BENCH_LOCAL.json is the default-config full-surface
    // record. Guard it against the two accidental-clobber classes that
    // have actually happened: an ad-hoc subset run (args given) and a
    // different-parallelism run (driver uses local[32]) both default to
    // side files instead. SPARK_GRAFT_BENCH_OUT still overrides.
    val defaultOut =
      if (args.nonEmpty) "BENCH_PARTIAL.json"
      else if (cpus != DefaultCpus) s"BENCH_LOCAL_cpus$cpus.json"
      else "BENCH_LOCAL.json"
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Disabled: Spark 4.1's union output-partitioning propagation
      // executes co-partitioned unions as a partition zip, which AQE
      // can break at runtime by re-planning one child's partition
      // count ("Can't zip RDDs with unequal numbers of partitions",
      // hit by q157's component-table union); the claim also elides
      // any explicit repartition above the union, so it cannot be
      // worked around plan-side.
      .config("spark.sql.unionOutputPartitioning", "false")
      // ObjectHashAggregate (every TypedImperativeAggregate here:
      // decimal vector sums, KMV/top-cells sketches) falls back to
      // SORT-based aggregation at 128 distinct groups per task — the
      // PQ subspace folds group by (sub, code) = 512 groups, so every
      // training pass paid a per-task spill + sort (measured ~0.4s of
      // pure overhead per task on 63-row tasks). The battery's typed
      // aggregates all carry model-bounded state (≤ ~130 KB sketch
      // buffers, ≤ 3 KB decimal sums) at model-bounded group counts
      // (cells × codes ≤ 512, sources ≤ dozens), so 4096 in-memory
      // groups is ≤ a few hundred MB worst-case and the sort fallback
      // still engages beyond it. Same setting in Verify for identical
      // execution; results are strategy-independent either way.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4096")
      // tiny-task shuffles: the bypass writer opens one file PER
      // REDUCE PARTITION per map task (32x32 file creations per
      // exchange here — measured as most of the fixed per-task cost
      // on sub-MB shuffles); below the threshold Spark uses the sort
      // writer, one data+index file per map task regardless of R. At
      // production R (thousands) bypass never engages anyway.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    // JIT warmup: run the selected queries once against a tiny scale
    // factor so steady-state timings aren't dominated by first-call
    // JIT compilation of the interpreted-expression paths (round-1
    // numbers showed >10× spreads between identically-shaped queries
    // purely from run order). Disable with SPARK_GRAFT_WARMUP=0.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0")
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () } // a real failure surfaces in the timed run
        // warmup queries persist intermediates too — don't let ~100
        // queries' worth of dead sf0.001 caches pile onto the first
        // timed measurement
        spark.catalog.clearCache()
      }
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    // Machine-state SENTINEL: a fixed CPU-bound range-agg timed
    // immediately before each query's reps. Two rounds running, the
    // committed medians have carried ≥1.5× "regressions" on queries
    // untouched by any commit — machine drift, not code — and
    // without a co-recorded reference there is no way to tell a real
    // regression from a busy machine. Design choices, all measured:
    // CPU-bound range (not a parquet scan — page cache state leaks
    // into scans), MIN of 3 runs (uncontended time is a floor;
    // contention only inflates, so min is the stable statistic where
    // a single shot swings ±60%), per query rather than per rep
    // (medians are per query; ~0.4s × queries ≈ 1 minute of total
    // overhead at the full surface). The artifact ships the raw
    // medians (`queries`, unchanged contract), the per-query
    // sentinel floor (`sentinel` + `sentinel_ref` = median of
    // floors), and `queries_norm` = raw × (nominal / sentinel_ref):
    // ONE run-level factor for the whole run. Round 8 normalized by
    // the PER-QUERY sentinel sample instead, and the round-8 verdict
    // measured why that was wrong: individual ~0.08s floors span 3×
    // within one run (0.045–0.14s), so per-query normalization ADDS
    // noise to sub-2s queries (q106 raw 1.58s → "norm" 2.76s, a
    // phantom 1.7×). The run MEDIAN of ~146 min-of-3 floors is the
    // stable machine-speed statistic; the per-query floors stay in
    // the artifact for drift diagnosis only.
    def sentinelOnce(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(0, 8000000L, 1, cpus.toInt)
        .select(pmod(xxhash64(col("id")), lit(1000000)).as("h"))
        .agg(sum(col("h")))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def sentinel(): Double = (1 to 3).map(_ => sentinelOnce()).min
    (1 to 3).foreach(_ => sentinelOnce()) // JIT-warm the sentinel itself
    // SUSTAINED-parallel sentinel, once per RUN: the per-query
    // sentinel's ~250k-row tasks finish inside a CPU's turbo-burst
    // window, so a box in a high-turbo state reads "fast" while the
    // battery's sustained 32-wide stages run at the lower all-core
    // clock — the round-13 driver record normalized 1.61× against
    // its own ~1.4× raw drift exactly this way (turbo-state
    // divergence the 2.0× flag never saw). 8M rows/task keeps every
    // core busy past the burst window, so this floor tracks the
    // clock the wide stages actually get; it feeds the far-from-
    // nominal FLAG below, not the normalization factor (queries_norm
    // keeps its cross-round contract).
    def sentinelWideOnce(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(0, 8000000L * cpus.toInt, 1, cpus.toInt)
        .select(pmod(xxhash64(col("id")), lit(1000000)).as("h"))
        .agg(sum(col("h")))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val sentinelWide = {
      (1 to 2).foreach(_ => sentinelWideOnce()) // JIT/scheduler warm
      (1 to 3).map(_ => sentinelWideOnce()).min
    }
    var errors = List.empty[(String, String)]
    var sentinels = Map.empty[String, Double]
    var mins = Map.empty[String, Double]
    val results = selected.map { case (name, fn) =>
      val sFloor = sentinel()
      val times = (1 to reps).map { rep =>
        val t0 = System.nanoTime()
        // noop sink, NOT count(): count() lets Catalyst prune the
        // query's own projections (a pure map query would measure an
        // empty scan); the noop write materializes every output row.
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch {
          case e: Throwable =>
            if (rep == 1) // record once; later reps of a broken query repeat it
              errors ::= name -> Option(e.getMessage).getOrElse(e.getClass.getName)
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // queries may persist() intermediates; release between reps so
        // later runs aren't measured under dead-cache memory pressure
        // (and rep 2+ re-does the persists — a real timing, not a
        // cache hit). Blocking unpersist must run FIRST: clearCache()
        // releases asynchronously AND drops its entries from the
        // persistentRDDs map, so running it first would leave the
        // blocking pass nothing to block on — dead blocks would
        // linger into the next measurement (seen as neighbor-order-
        // dependent 2–3× swings on individual query medians).
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache() // metadata for already-freed blocks
        System.gc()
        dt
      }
      sentinels += name -> sFloor
      // the MIN rep is the uncontended floor — the per-query statistic
      // that survives BURSTY machine load. Round 9 measured why the
      // median alone cannot: two same-code full runs 25 minutes apart
      // had 46/123 per-query medians differing >20% even after
      // run-level sentinel normalization (contention hits whichever
      // query is running, not all queries uniformly), while their
      // normalized TOTALS agreed within 5%. Contention only ever
      // inflates a rep, so min-of-reps converges where median-of-3
      // needs 2 of 3 reps clean. THE REGRESSION RULE (calibrated on
      // two same-code cpus32 runs 18 min apart): a query is credibly
      // regressed only when `queries_min_norm` moves >20% AND >0.2s
      // between runs of the same cpus mode — at that threshold the
      // calibration pair flagged 3/147 (the residual scheduler
      // noise); relative-only flagged 19, median-based 35. Medians
      // stay in the artifact as the totals-compatible historical
      // contract.
      mins += name -> times.min
      name -> times.sorted.apply(times.size / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sentinelRef =
      if (sentinels.isEmpty) 0.0
      else sentinels.values.toSeq.sorted.apply(sentinels.size / 2)
    val sentJson = sentinels.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // THE ROUND-15 RE-BASE (the round-14 verdict's #1): queries_norm
    // now normalizes by the SUSTAINED WIDE sentinel, not the burst
    // one. Two consecutive rounds self-flagged far-from-nominal
    // because this host's frequency governor is BIMODAL: the ~250k-
    // row burst sentinel reads 0.096–0.108 idle but ~0.043–0.053
    // mid-battery (sustained load locks the governor high), so the
    // burst nominal is unsampleable in the state the battery actually
    // runs in, while the wide sentinel's 8M-rows/task floor tracks
    // the all-core clock the wide stages really get (measured ±1.5%
    // over consecutive settled readings vs the base's ±20%). The
    // burst sentinel stays in the artifact (sentinel/sentinel_ref)
    // as a turbo-state DIAGNOSTIC only. Historical contract: r1–r14
    // records normalized by the burst pin 0.0766 — cross-era
    // comparisons should use raw common-surface totals (BASELINE.md
    // records the re-base).
    //
    // Wide pin provenance: BENCH_PIN_r15.json — the median of the
    // in-battery wide floors observed across full cpus32 batteries
    // (r14 builder 0.187, r15 battery A 0.173, r15 battery B — see
    // that file for the raw samples; idle-state partials read
    // ~0.31–0.33 and are NOT the battery state, hence excluded). A
    // mode without a pin normalizes by 1 (norm == raw).
    val sentinelWideNominal = Map("32" -> 0.18).get(cpus)
    val normFactor = sentinelWideNominal match {
      case Some(nom) if sentinelWide > 0 => nom / sentinelWide
      case _ => 1.0
    }
    // Burst nominal: kept ONLY to feed the turbo-state flag below.
    val sentinelNominal = Map("32" -> 0.0766, "4" -> 0.082).get(cpus)
    // far-from-nominal: linear CPU-speed rescaling only holds near
    // the pin — flag rather than silently rescale. The WIDE sentinel
    // alone gates (1.3×); the burst sentinel only corroborates (its
    // solo excursions are governor state, not machine speed — the
    // round-14 ADVICE low: a single-observation wide pin plus a
    // trigger-happy base flag diluted the signal).
    def far(ref: Double, nomOpt: Option[Double]): Boolean =
      nomOpt.exists(nom => ref > 0 &&
        (ref / nom > 1.3 || nom / ref > 1.3))
    val sentinelFar = far(sentinelWide, sentinelWideNominal)
    // diagnostic only: the burst sentinel vs its historical pin —
    // reads the governor's turbo state, not the battery's clock
    val burstFar = far(sentinelRef, sentinelNominal)
    val normJson = results.map { case (k, v) =>
      "\"" + k + "\":" + (v * normFactor)
    }.mkString("{", ",", "}")
    val minJson = mins.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val minNormJson = mins.map { case (k, v) =>
      "\"" + k + "\":" + (v * normFactor)
    }.mkString("{", ",", "}")
    // escape EVERY control char, not just the common whitespace ones —
    // exception messages embed caret diagnostics and arbitrary input
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val errJson = errors.reverse
      .map { case (k, m) => "\"" + k + "\":\"" + esc(m.take(200)) + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""queries_norm":$normJson,"queries_min":$minJson,""" +
        s""""queries_min_norm":$minNormJson,"sentinel":$sentJson,""" +
        s""""sentinel_ref":$sentinelRef,"norm_factor":$normFactor,""" +
        s""""sentinel_wide":$sentinelWide,""" +
        s""""sentinel_far_from_nominal":$sentinelFar,""" +
        s""""sentinel_burst_far":$burstFar,""" +
        s""""errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get(out), line + "\n")
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries FAILED: " +
        errors.reverse.map(_._1).mkString(", "))
      sys.exit(1)
    }
  }
}
