package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the formatted physical plan of selected
  * queries so pushdown (PushedFilters/ReadSchema), join strategies, and
  * WholeStageCodegen spans can be inspected. Usage:
  * `sbt "runMain graft.Explain q2_filter_sort q6_multijoin"` (no args → a
  * representative default set). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .config("spark.sql.extensions", "graft.delta.GraftSparkExtensions")
      // same catalog as Bench/Verify — without it the catalog-DDL queries
      // would audit a V2SessionCatalog plan nobody benches (r12 review)
      .config("spark.sql.catalog.spark_catalog", "graft.delta.catalog.GraftCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q2_filter_sort", "q4_projection", "q6_multijoin", "q11_topk",
        "q17_delta_roundtrip", "q22_dedup_exact", "q29_ann_cosine")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n========== $n ==========")
          println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
