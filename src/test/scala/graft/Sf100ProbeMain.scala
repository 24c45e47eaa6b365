package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Relational + dedup-kernel scale probe (r13 verdict #3): the r1-set
  * queries plus the unbounded dedup kernels (exact, MinHash-LSH pairs,
  * survivor clustering) over one SF dir, each timed. Run at sf10 and
  * sf100 and compare per-query ratios — a kernel whose wall grows faster
  * than the data is a cliff.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf100 sbt "Test/runMain graft.Sf100ProbeMain"
  */
object Sf100ProbeMain {
  private val R1 = Seq("q1_agg", "q2_filter_sort", "q3_minmax",
    "q4_projection", "q5_join", "q6_multijoin", "q7_window", "q8_distinct",
    "q9_intersect", "q10_except", "q11_topk", "q12_scalar", "q13_having",
    "q14_semijoin", "q15_antijoin", "q16_case")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    // SPARK_GRAFT_SHUFFLE sizes shuffles for the SF under test (the fixed
    // 32 of the bench is a spill generator at 600M rows); SPARK_GRAFT_ONLY
    // comma-filters the query list for targeted re-runs
    val shuffleParts =
      sys.env.get("SPARK_GRAFT_SHUFFLE").map(_.toInt).getOrElse(32)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    def wanted(q: String) = only.isEmpty || only.contains(q)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%9.2f s  ($rows rows)")
    }

    println(s"PROBE sfDir $sfDir lineitem rows " +
      spark.read.parquet(s"$sfDir/lineitem.parquet").count())

    R1.filter(wanted).foreach { q =>
      timed(q) { SparkEntry.queries(q)(spark, sfDir).count() }
    }

    // unbounded dedup kernels (the gate shapes are correctness-sized;
    // these run the operators over the WHOLE SF)
    if (wanted("dedup_exact")) {
      val events = spark.read.parquet(s"$sfDir/events.parquet")
      timed("dedup_exact (events)") {
        graft.ops.Dedup.exact(events,
          Seq("user_id", "event_type", "value"), "event_id").count()
      }
    }
    if (wanted("minhash")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      // one lineage: LSH pairs feed clustering feed survivors — time the
      // stages separately via localCheckpoint boundaries
      val t0 = System.nanoTime()
      val pairs = graft.ops.Dedup.minhashLshPairs(docs, "text", "doc_id", 1, 2)
        .localCheckpoint(true)
      val nPairs = pairs.count()
      println(f"PROBE minhash_lsh_pairs (docs)    ${(System.nanoTime() - t0) / 1e9}%9.2f s  ($nPairs rows)")
      timed("survivor_clustering") {
        graft.ops.Clustering.survivors(docs.select("doc_id", "text"), "doc_id",
          pairs, Seq(length(col("text")).desc, col("doc_id"))).count()
      }
    }
    spark.stop()
  }
}
