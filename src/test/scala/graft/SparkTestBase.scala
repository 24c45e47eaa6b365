package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole forked test JVM. */
trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.session
}

object SparkTestBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", false)
    .config("spark.sql.extensions", "graft.delta.GraftSparkExtensions")
    .config("spark.sql.catalog.spark_catalog", "graft.delta.catalog.GraftCatalog")
    .getOrCreate()
}
