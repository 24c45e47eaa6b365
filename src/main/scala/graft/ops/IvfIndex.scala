package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.delta.{DeltaTable, GraftWriter, PartitionFilter}

/** IVF ANN index MAINTAINED AS GRAFT TABLES (r12 verdict #8): the
  * centroids and posting lists live in committed, partitioned delta
  * tables instead of session-transient DataFrames, so the index survives
  * the session, serves any number of queries without re-clustering, and
  * grows INCREMENTALLY on append — the index shape a 100 TB corpus needs.
  *
  * Layout under `root`:
  *  - `root/centroids` — (cid int, centroid array<float>), |clusters| rows;
  *  - `root/postings`  — (id, cluster, vec) PARTITIONED BY cluster, so a
  *    probe's scan prunes to `nProbe/|clusters|` of the files at the
  *    metadata layer (partition pruning), never touching the rest.
  *
  * [[refresh]] assigns ONLY the new vectors to the nearest EXISTING
  * centroid and appends — the incremental-clustering pattern
  * ([[graft.delta.Optimize.cluster]]): centroids drift only on an explicit
  * [[build]] rebuild, queries stay correct throughout because ranking is
  * exact within probed clusters.
  */
object IvfIndex {

  private def centroidsPath(root: String) = s"$root/centroids"
  private def postingsPath(root: String) = s"$root/postings"

  private def dotQ(a: String, b: String) =
    graft.functions.functions.dot_q(col(a), col(b))

  /** Full (re)build: k-means-lite assignment, then commit both tables.
    * Overwrites any previous index at `root`. */
  def build(spark: SparkSession, vectors: DataFrame, idCol: String,
            vecCol: String, root: String, nClusters: Int = 16,
            kmeansIters: Int = 3): Unit = {
    val assigned = vectors
      .join(Similarity.kmeansAssign(vectors, idCol, vecCol, nClusters, kmeansIters), idCol)
      .select(col(idCol).as("id"), col("cluster"), col(vecCol).as("vec"))
      .localCheckpoint(true) // centroids + postings both read it
    val cents = Similarity.centroids(
      assigned.select(col("cluster"), col("vec")), "vec", "cluster")
      .select(col("cluster").as("cid"), col("centroid"))
    GraftWriter.write(cents.coalesce(1), centroidsPath(root), SaveMode.Overwrite)
    GraftWriter.write(assigned, postingsPath(root), SaveMode.Overwrite,
      partitionBy = Seq("cluster"))
  }

  /** Incremental append: vectors whose ids the index does not yet hold are
    * assigned to the nearest existing centroid and appended to the posting
    * table (one commit). Returns how many were appended. */
  def refresh(spark: SparkSession, vectors: DataFrame, idCol: String,
              vecCol: String, root: String): Long = {
    val existing = DeltaTable.forPath(spark, postingsPath(root)).toDF.select("id")
    val fresh = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .join(existing, Seq("id"), "left_anti")
    val cents = DeltaTable.forPath(spark, centroidsPath(root)).toDF
    // nearest EXISTING centroid via the shared squared-L2 assignment —
    // same metric as the build's kmeans loop and the probe's cluster
    // ranking (one definition, Similarity.SqDistExpr)
    val assigned = fresh
      .join(Similarity.assignToCentroids(fresh, "id", "vec", cents), "id")
      .select(col("id"), col("cluster"), col("vec"))
      .localCheckpoint(true)
    val n = assigned.count()
    if (n > 0)
      GraftWriter.write(assigned, postingsPath(root), SaveMode.Append,
        partitionBy = Seq("cluster"))
    n
  }

  /** Probe the committed index: rank centroids against the query by the
    * ASSIGNMENT metric (squared L2 — [[Similarity.probeClusters]]),
    * PARTITION-PRUNE the posting table to the nProbe best clusters,
    * exact-rank by quantized dot within them. Output (id, dot_q), top-k. */
  def topK(spark: SparkSession, root: String, queryVec: Array[Float],
           k: Int, nProbe: Int = 2): DataFrame = {
    import spark.implicits._
    val query = Seq(Tuple1(queryVec)).toDF("query_vec")
    val probed = Similarity.probeClusters(
        DeltaTable.forPath(spark, centroidsPath(root)).toDF, "cid", query, nProbe)
      .as[Int].collect() // nProbe ints — driver-side by design
    val postings = DeltaTable.forPath(spark, postingsPath(root))
      .toDF(Seq(PartitionFilter.In("cluster", probed.map(_.toString).toSet)))
    postings.crossJoin(broadcast(query))
      .withColumn("dot_q", dotQ("vec", "query_vec"))
      .select(col("id"), col("dot_q"))
      .orderBy(col("dot_q").desc, col("id"))
      .limit(k)
  }
}
