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

  test("composed pipeline (q77) stays bucketed end-to-end — no all-pairs stage") {
    val p = plan("q77_dedup_pipeline")
    // (the single-row invariant crossJoins legitimately plan as broadcast
    // NL over ONE row; the only statically checkable scale claim here is
    // no-all-pairs — AQE decides broadcast-vs-SMJ for the rest at runtime)
    assert(!p.contains("CartesianProduct"),
      s"the composed pipeline regressed to an all-pairs plan:\n$p")
  }

  test("committed-IVF probe (q79) partition-prunes the posting scan") {
    // build a tiny committed index, probe 2 of 4 clusters, and require the
    // scan's input files to stay inside the probed partition directories
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // under target/ so `sbt clean` (not /tmp accretion) owns the lifetime
    val root = {
      val d = new java.io.File(s"target/plan-ivf-${java.util.UUID.randomUUID()}")
      d.mkdirs(); d.getAbsolutePath
    }
    graft.ops.IvfIndex.build(spark, vecs, "vec_id", "embedding", root, nClusters = 4)
    val qv = vecs.filter(col("vec_id") === 1)
      .select("embedding").as[Array[Float]].head()
    val res = graft.ops.IvfIndex.topK(spark, root, qv, k = 5, nProbe = 2)
    val postingFiles = res.inputFiles.filter(_.contains("postings"))
    val clusters = postingFiles.flatMap(
      "cluster=(\\d+)".r.findFirstMatchIn(_).map(_.group(1))).toSet
    assert(postingFiles.nonEmpty && clusters.size <= 2,
      s"probe scan must touch <= nProbe partitions, got $clusters")
  }

  test("row-identity resolution BROADCASTS the file-info lookup (no shuffle on the scan)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = new java.io.File(
      s"target/plan-rt-${java.util.UUID.randomUUID()}/t").getAbsolutePath
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
