package graft
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main. Prints ONE JSON line with per-query wall seconds.
  *
  * Methodology (round-2 fixes per VERDICT):
  *  - Materializes the full physical plan via `queryExecution.toRdd.foreach`
  *    — a bare `.count()` lets Catalyst drop sorts/projections and times a
  *    cheaper plan than the one Verify checks.
  *  - Warms the JVM/codegen/parquet-footer caches with three representative
  *    untimed queries first, so the first timed query isn't charged ~4s of
  *    one-time startup cost.
  */
object Bench {

  /** The 16 round-1 queries whose subtotal is BASELINE.md's regression
    * gate (≤ 2× the 9.6 s r2-harness steady state). */
  private[graft] val R1Set: Set[String] = Set(
    "q1_agg", "q2_filter_sort", "q3_minmax", "q4_projection", "q5_join",
    "q6_multijoin", "q7_window", "q8_distinct", "q9_intersect", "q10_except",
    "q11_topk", "q12_scalar", "q13_having", "q14_semijoin", "q15_antijoin",
    "q16_case")

  private def materialize(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreach(_ => ())

  /** Compact one-line error description for the bench JSON. */
  private[graft] def describe(e: Throwable): String = {
    val cut = Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(160)
    // a 160-char cut can split a surrogate pair — drop the lone half
    val m = if (cut.nonEmpty && Character.isHighSurrogate(cut.last))
      cut.dropRight(1) else cut
    s"${e.getClass.getSimpleName}: $m"
  }

  /** The errors map as a JSON object — through Jackson, not hand-rolled
    * escaping (the serializer the rest of the engine already trusts). */
  private[graft] def errorsJson(errors: scala.collection.Map[String, String]): String = {
    val node = graft.delta.ActionCodec.mapper.createObjectNode()
    errors.foreach { case (k, v) => node.put(k, v) }
    graft.delta.ActionCodec.mapper.writeValueAsString(node)
  }

  /** Time one query run; a throw records the error instead of silently
    * reading as a fast success (r9 VERDICT: a broken query must not
    * improve the bench total). */
  private[graft] def timeOne(run: () => Unit): (Double, Option[String]) = {
    val t0 = System.nanoTime()
    val err = try { run(); None } catch { case e: Throwable => Some(describe(e)) }
    ((System.nanoTime() - t0) / 1e9, err)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.delta.GraftSparkExtensions")
      .config("spark.sql.catalog.spark_catalog", "graft.delta.catalog.GraftCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional subset run (stress sweeps, targeted regressions):
    // SPARK_GRAFT_BENCH_ONLY=q24_dedup_jaccard,q25_minhash_lsh
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val qs = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    // Absolute machine-speed probe BEFORE warmup (and again after the
    // timed loop): fixed work, so its seconds depend on machine health
    // alone — the r8 whole-machine slowdown that `contended` cannot see.
    val calStPre = BenchCalibration.singleThreadSec()
    // Warmup: one agg, one join, one semi-join — covers codegen paths.
    Seq("q1_agg", "q5_join", "q14_semijoin").foreach { w =>
      qs.get(w).foreach(fn => try materialize(fn(spark, sfDir))
                        catch { case _: Throwable => () })
    }
    // Per-query session-health telemetry. Round 6 found r5's 2.7×-of-gate
    // "session degradation" does NOT reproduce at identical code + identical
    // invocation (r1-set back to ~10 s, q13_having 0.6 s) — i.e. it was
    // machine contention during the driver's run, not engine state. To make
    // that separable forever, the JSON now carries per-query JVM CPU seconds
    // (`cpu`) next to wall seconds (`queries`): a query whose wall grows but
    // whose CPU doesn't was starved by the MACHINE; one whose CPU grows got
    // slower in the ENGINE. `load1m` samples the OS run-queue per query.
    val debug = sys.env.get("SPARK_GRAFT_BENCH_DEBUG").contains("1")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def processCpuNanos: Long = osBean match {
      case sun: com.sun.management.OperatingSystemMXBean => sun.getProcessCpuTime
      case _ => -1L
    }
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    var lastGc = gcMillis

    /** One full timed sweep + its calibration/contention telemetry.
      * `calPre` is the pre-warmup probe for attempt 1 and a fresh probe for
      * a retry (the machine state is exactly what a retry re-measures). */
    final case class Sweep(results: mutable.LinkedHashMap[String, Double],
                           cpuSec: mutable.LinkedHashMap[String, Double],
                           load1m: mutable.LinkedHashMap[String, Double],
                           errors: mutable.LinkedHashMap[String, String],
                           contended: Boolean, calSt: Double,
                           calStWorst: Double, calMt: Double) {
      def total: Double = if (results.nonEmpty) results.values.sum else 0.0
      def degraded: Boolean = calSt > BenchCalibration.DegradedStSec
      def degradedMt: Boolean = calMt > BenchCalibration.DegradedMtSec
      def unhealthy: Boolean = contended || degraded || degradedMt
    }

    def runSweep(calPre: Double): Sweep = {
      val cpuSec = mutable.LinkedHashMap[String, Double]()
      val load1m = mutable.LinkedHashMap[String, Double]()
      val errors = mutable.LinkedHashMap[String, String]()
      val results = mutable.LinkedHashMap[String, Double]()
      qs.foreach { case (name, fn) =>
        val c0 = processCpuNanos
        val (sec, err) = timeOne(() => materialize(fn(spark, sfDir)))
        err.foreach(errors(name) = _)
        cpuSec(name) = if (c0 < 0) -1.0 else (processCpuNanos - c0) / 1e9
        load1m(name) = osBean.getSystemLoadAverage
        if (debug) {
          val rt = Runtime.getRuntime
          val heapMb = (rt.totalMemory - rt.freeMemory) / (1 << 20)
          val gc = gcMillis
          val threads = Thread.activeCount()
          val blocks = org.apache.spark.SparkEnv.get.blockManager
            .getMatchingBlockIds(_ => true).size
          System.err.println(
            f"BENCHDBG $name%-24s ${sec}%8.2fs cpu=${cpuSec(name)}%7.2fs heap=${heapMb}MB gcDelta=${gc - lastGc}ms threads=$threads blocks=$blocks load=${load1m(name)}%.1f")
          lastGc = gc
        }
        results(name) = sec
      }
      // Self-classify machine contention from the run's own telemetry
      // (BenchContention; gate rule: compare cpu-seconds when contended).
      val isContended = BenchContention.contended(
        results.values.toSeq, cpuSec.values.toSeq, load1m.values.toSeq)
      val calStPost = BenchCalibration.singleThreadSec()
      val calMt = BenchCalibration.multiThreadSec(
        Runtime.getRuntime.availableProcessors())
      // min of pre/post: the healthiest speed the machine showed this
      // sweep — a sweep is degraded only if it NEVER ran at class speed
      Sweep(results, cpuSec, load1m, errors, isContended,
        math.min(calPre, calStPost), math.max(calPre, calStPost), calMt)
    }

    var sweep = runSweep(calStPre)
    // A contended/degraded primary artifact is not comparable across rounds
    // (r10's BENCH_sf1.json had to be hand-re-run). Full runs retry ONCE
    // when the sweep self-classifies unhealthy, then emit the healthier of
    // the two; subset runs and SPARK_GRAFT_BENCH_NORETRY=1 skip the retry.
    var retried = false
    if (sweep.unhealthy && only.isEmpty &&
        !sys.env.get("SPARK_GRAFT_BENCH_NORETRY").contains("1")) {
      System.err.println(
        s"BENCHRETRY primary sweep unhealthy (contended=${sweep.contended} " +
        s"degraded=${sweep.degraded} degraded_mt=${sweep.degradedMt}) — retrying once")
      val second = runSweep(BenchCalibration.singleThreadSec())
      retried = true
      // Selection order: fewest FAILED queries first (a crashed query
      // records ~0 s, so a total built on errors must never win — the r9
      // honesty rule, one layer up), then health, then lower wall.
      val chosen =
        if (second.errors.size != sweep.errors.size)
          (if (second.errors.size < sweep.errors.size) second else sweep)
        else if (sweep.unhealthy && !second.unhealthy) second
        else if (second.unhealthy && !sweep.unhealthy) sweep
        else if (second.total < sweep.total) second else sweep
      val discarded = if (chosen eq second) sweep else second
      if (discarded.errors.nonEmpty)
        System.err.println(
          s"BENCHRETRY discarded sweep had errors: ${errorsJson(discarded.errors)}")
      sweep = chosen
    }

    // Locale.ROOT: the f"" interpolator formats with the JVM default
    // locale — a comma-decimal locale would emit "value":71,6000 and break
    // the driver's JSON parse (r7 ADVICE).
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def toJson(m: scala.collection.Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val results = sweep.results
    val qjson = toJson(results)
    val total = sweep.total
    val cpuTotal =
      if (sweep.cpuSec.values.exists(_ < 0)) -1.0 else sweep.cpuSec.values.sum
    val loadMed = BenchContention.median(sweep.load1m.values.toSeq.filter(_ >= 0))
    // the regression-gate subtotal (BASELINE.md: 16-query r1 set ≤ 2×9.6 s),
    // emitted machine-readable so the gate never has to be recomputed; a
    // SUBSET run can't produce the gate number — sentinel -1, not a
    // partial sum a reader would mistake for a trivially passing gate
    val r1Subtotal =
      if (Bench.R1Set.forall(results.contains)) Bench.R1Set.toSeq.map(results).sum
      else -1.0
    // The primary stdout line carries what the driver's tail capture
    // parses (value + queries + sf) plus three SHORT contention scalars.
    // Round 6's driver recorded `parsed: null` because the full cpu/load1m
    // telemetry MAPS pushed `value` out of the tail window — the per-query
    // maps stay on stderr, next to BENCHDBG.
    System.err.println(
      s"""BENCHTEL {"cpu":${toJson(sweep.cpuSec)},"load1m":${toJson(sweep.load1m)}}""")
    // a failed query records ~0 s — `errors` makes that loud instead of
    // letting a broken query masquerade as a fast one
    val ejson = errorsJson(sweep.errors)
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qjson,"errors":$ejson,"sf":"$sfDir","r1_set_subtotal":${fmt(r1Subtotal)},"retried":$retried,"contended":${sweep.contended},"cpu_total":${fmt(cpuTotal)},"load_med":${fmt(loadMed)},"cal_st":${fmt(sweep.calSt)},"cal_st_worst":${fmt(sweep.calStWorst)},"cal_mt":${fmt(sweep.calMt)},"degraded":${sweep.degraded},"degraded_mt":${sweep.degradedMt}}"""
    println(line)
    // optional artifact write (the per-round BENCH_sf1.json scale record)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    spark.stop()
  }
}
