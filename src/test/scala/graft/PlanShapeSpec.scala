package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards for the scale claims the operators make
  * in their scaladoc: candidate generation must never be all-pairs, small
  * sides must broadcast, top-k must not global-sort, projections must prune
  * the scan. A silent optimizer/API change that breaks one of these would
  * still pass the value-level gates on small data — these assertions fail
  * it loudly. */
class PlanShapeSpec extends AnyFunSuite with SparkTestBase {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
  }

  test("MinHash-LSH candidates come from the band join, never all-pairs") {
    val p = plan("q25_minhash_lsh")
    assert(!p.contains("CartesianProduct"),
      s"q25 regressed to an all-pairs plan:\n$p")
  }

  test("SimHash candidates come from the band join, never all-pairs") {
    val p = plan("q26_simhash")
    assert(!p.contains("CartesianProduct"))
  }

  test("contamination joins the broadcast benchmark side, never all-pairs") {
    val p = plan("q59_contamination")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin") || p.contains("broadcast"),
      s"benchmark shingles should broadcast:\n$p")
  }

  test("brute-force ANN top-k is TakeOrdered, not a global sort") {
    val p = plan("q29_ann_cosine")
    assert(p.contains("TakeOrderedAndProject"), s"q29 plan:\n$p")
  }

  test("top-k relational query is TakeOrdered, not a global sort") {
    val p = plan("q11_topk")
    assert(p.contains("TakeOrderedAndProject"), s"q11 plan:\n$p")
  }

  test("2-column projection prunes the parquet read schema") {
    val p = plan("q4_projection")
    // the lineitem scan must read only the projected columns
    val readSchemas = "ReadSchema: [^\\n]+".r.findAllIn(p).toSeq
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(s => !s.contains("l_comment")),
      s"projection failed to prune:\n$p")
  }

  test("filtered relational scan pushes its predicate to parquet") {
    val p = plan("q2_filter_sort")
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(p).isDefined,
      s"no pushed filters in q2 plan:\n$p")
  }

  test("row-identity resolution BROADCASTS the file-info lookup (no shuffle on the scan)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("plan-rt-").resolve("t").toString
    graft.delta.GraftWriter.write(
      (0 until 100).map(i => (i.toLong, "x")).toDF("id", "v"), dir,
      configuration = Some(Map(
        graft.delta.TableConfig.EnableRowTracking -> "true")))
    val df = graft.delta.DeltaTable.forPath(spark, dir).withRowIds
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop") ||
      p.contains("broadcast"),
      s"file-info lookup must broadcast, not shuffle:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"row-identity scan shuffles on the table side:\n$p")
    assert(df.select(col("_row_id")).distinct().count() == 100)
  }
}
