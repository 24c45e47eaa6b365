package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: regex — run only matching queries (local iteration;
    // the driver always passes two args and gets the full dump)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, f) => (a, b, Some(f.r))
      case _ =>
        System.err.println("usage: graft.Verify <sfDir> <outDir> [queryRegex]")
        sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // µs-typed parquet output (not INT96) so the driver's pyarrow/duckdb
      // compare sees the same timestamp type the oracle produces.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      // run the correctness gate with the engine's optimizer rules active,
      // so stats-only rewrites and scan re-scoping are oracle-validated too
      .config("spark.sql.extensions", "graft.delta.GraftSparkExtensions")
      .config("spark.sql.catalog.spark_catalog", "graft.delta.catalog.GraftCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // static-conf extensions only apply at first-session creation; fail fast
    // if that assumption ever breaks rather than silently running un-ruled
    require(spark.sessionState.analyzer.postHocResolutionRules
        .exists(_.isInstanceOf[graft.delta.GraftDeltaInserts.type]),
      "GraftSparkExtensions not applied — extensions config must precede session creation")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.forall(_.findFirstIn(name).isDefined))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // oracle_sql.json through Jackson — the serializer the rest of the
    // engine already trusts; a gap in a bespoke escaper would silently
    // zero the round's correctness (r11 class, r12 review: the hand-rolled
    // escaper here was the last one standing)
    val node = graft.delta.ActionCodec.mapper.createObjectNode()
    // subset runs dump only the matching oracles — check.py fails any
    // oracle key with no result dir, so the dump must mirror the run
    SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .filter { case (k, _) => only.forall(_.findFirstIn(k).isDefined) }
      .foreach { case (k, v) => node.put(k, v) }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      graft.delta.ActionCodec.mapper.writeValueAsString(node))
    spark.stop()
  }
}
