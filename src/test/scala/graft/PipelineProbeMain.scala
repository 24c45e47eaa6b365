package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops._

/** End-to-end composed LLM-data-pipeline probe at volume (r12 verdict #1):
  * shingle → MinHash-LSH candidates → exact Jaccard verify → connected
  * components → survivors → sequence packing, as ONE lineage over the full
  * `documents` table — per-stage walls and the end-to-end total for
  * BASELINE.md. Every kernel is individually proven (q25/q53/q56 gates +
  * sf10 sub-linearity); this runs the COMPOSITION a real 100 TB curation
  * job executes.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf10 sbt "Test/runMain graft.PipelineProbeMain"
  */
object PipelineProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val total0 = System.nanoTime()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    println(s"PROBE documents $n")

    // Stage 1: shingle → MinHash signatures → banded LSH buckets →
    // bucket-join candidates → exact Jaccard verification. The production
    // degenerate-bucket cap stays ON here (unlike the uncapped oracle
    // gate): this is the 100 TB configuration.
    val pairs = timed("stage 1: LSH candidates + exact verify") {
      val p = Dedup.minhashLshPairs(docs, "text", "doc_id", 1, 2)
        .localCheckpoint(true)
      println(s"PROBE   near-dup pairs ${p.count()}")
      p
    }

    // Stage 2: duplicate families (min-label propagation) + one survivor
    // per family (longest text, then lowest id).
    val survivors = timed("stage 2: connected components + survivors") {
      val s = Clustering.survivors(docs, "doc_id", pairs,
          Seq(length(col("text")).desc, col("doc_id")))
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
        .select("doc_id", "n_tokens")
        .localCheckpoint(true)
      println(s"PROBE   survivors ${s.count()} (removed ${n - s.count()})")
      s
    }

    // Stage 3: pack survivors into 2048-token training sequences and
    // assert the invariants the q56/q77 gates pin.
    val budget = 2048L
    // pack partitions track the corpus (~1200 docs each): a 100 TB run
    // spans thousands, which is what makes a takedown wave's incremental
    // repack O(wave) instead of O(corpus) in stage 4
    val packParts = math.max(64L, n / 1200L).toInt
    val packed = timed(s"stage 3: sequence packing ($packParts partitions) + invariants") {
      val packed = Packing.packSequences(survivors, "doc_id", "n_tokens",
        budget = budget, numPartitions = packParts).localCheckpoint(true)
      val inv = packed.agg(
        count(lit(1)).as("docs_packed"),
        countDistinct("doc_id").as("docs_distinct"),
        sum("n_tokens").as("tokens_packed"),
        countDistinct("bin_id").as("n_bins")).collect()(0)
      val over = packed.groupBy("bin_id")
        .agg(sum("n_tokens").as("bt"), count(lit(1)).as("nd"))
        .where(col("bt") > budget && col("nd") > 1).count()
      val survCount = survivors.count()
      val survTokens = survivors.agg(sum("n_tokens")).collect()(0).getLong(0)
      assert(inv.getLong(0) == survCount && inv.getLong(1) == survCount,
        s"packing not exactly-once: $inv vs $survCount survivors")
      assert(inv.getLong(2) == survTokens,
        s"token conservation broken: ${inv.getLong(2)} != $survTokens")
      assert(over == 0, s"$over multi-doc bins over budget")
      println(s"PROBE   bins ${inv.getLong(3)}, tokens ${inv.getLong(2)}, " +
        f"mean fill ${inv.getLong(2).toDouble / inv.getLong(3) / budget}%.3f")
      packed
    }

    println(f"PROBE end-to-end pipeline total ${(System.nanoTime() - total0) / 1e9}%8.2f s")

    // Stage 4 (r17): a ~500-doc takedown wave against the PACKED corpus —
    // repackDeletes recomputes only the affected hash partitions' bins,
    // vs the full-repack control it must equal. The bin CDF sizes the
    // downstream training-shard invalidation.
    val survCount2 = survivors.count()
    val step = math.max(1L, survCount2 / 500)
    val wave = survivors.filter(pmod(col("doc_id"), lit(step)) === 0)
      .select("doc_id").localCheckpoint(true)
    val nWave = wave.count()
    val (repacked, cdf) = timed(s"stage 4: $nWave-doc takedown → repackDeletes") {
      val (rep, c) = Packing.repackDeletes(packed, wave, budget)
      (rep.localCheckpoint(true), c.localCheckpoint(true))
    }
    // telemetry OUTSIDE the timed block: the whole-corpus distinct-count
    // would otherwise dominate the recorded wall at probe scale and the
    // O(wave)-vs-full comparison is the number this probe exists to record
    println(s"PROBE   bins changed ${cdf.count()} of " +
      s"${packed.select("bin_id").distinct().count()}; affected partitions " +
      s"${cdf.select(shiftright(col("bin_id"), 32)).distinct().count()} of $packParts")
    val control = timed("stage 4 control: full repack of the remainder") {
      Packing.packSequences(
        survivors.join(wave, Seq("doc_id"), "left_anti"),
        "doc_id", "n_tokens", budget = budget, numPartitions = packParts)
        .localCheckpoint(true)
    }
    // scale path honesty: the one-session control is cheap at probe scale
    // because the whole corpus is hot in page cache — the claim the
    // assertion proves is EQUIVALENCE; the O(wave) claim is the affected-
    // partition count above
    val diff = repacked.exceptAll(control).count() +
      control.exceptAll(repacked).count()
    assert(diff == 0, s"incremental repack != full repack ($diff rows differ)")
    println(s"PROBE   incremental repack ≡ full repack " +
      s"(${control.count()} rows); cdf rows ${cdf.count()}")
    spark.stop()
  }
}
