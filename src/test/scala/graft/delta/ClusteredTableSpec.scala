package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** Liquid-clustering authoring: clusterBy writes the delta.clustering
  * domain in delta-spark's shape; Optimize.cluster re-clusters by it. */
class ClusteredTableSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("clusterBy declares features and the domain in the delta-spark shape") {
    val dir = tempTable("cluster-author").toString
    GraftWriter.write((0 until 100).map(i => (i.toLong, i % 7, s"v$i"))
      .toDF("id", "grp", "v"), dir)
    DeltaTable.forPath(spark, dir).clusterBy(Seq("id", "grp"))
    val snap = DeltaLog.forPath(spark, dir).update()
    assert(snap.domainMetadata("delta.clustering") ==
      """{"clusteringColumns":[["id"],["grp"]]}""")
    val wf = snap.writerFeatures.getOrElse(Set.empty)
    assert(wf.contains("clustering") && wf.contains("domainMetadata"))
    assert(DeltaTable.forPath(spark, dir).clusteringColumns == Seq("id", "grp"))
  }

  test("Optimize.cluster re-clusters by the declared columns; content intact") {
    val dir = tempTable("cluster-run").toString
    GraftWriter.write((0 until 2000).map(i => ((i * 37 % 2000).toLong, s"v$i"))
      .toDF("id", "v").repartition(8), dir)
    DeltaTable.forPath(spark, dir).clusterBy(Seq("id"))
    val before = DeltaTable.forPath(spark, dir).toDF
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val m = Optimize.cluster(spark, dir, targetFileBytes = 16 * 1024)
    assert(m.filesRemoved > 0 && m.filesAdded > 0)
    val after = DeltaTable.forPath(spark, dir).toDF
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(after == before)
    // clustering survives the rewrite (domain untouched by OPTIMIZE)
    assert(DeltaTable.forPath(spark, dir).clusteringColumns == Seq("id"))
  }

  test("cluster is INCREMENTAL: a second run rewrites only files added since") {
    val dir = tempTable("cluster-incr").toString
    GraftWriter.write((0 until 1000).map(i => ((i * 37 % 1000).toLong, s"v$i"))
      .toDF("id", "v").repartition(4), dir)
    DeltaTable.forPath(spark, dir).clusterBy(Seq("id"))
    val m1 = Optimize.cluster(spark, dir, targetFileBytes = 16 * 1024)
    assert(m1.filesRemoved == 4, "first run re-lays the whole table")
    val clustered = DeltaLog.forPath(spark, dir).update().files
    assert(clustered.forall(_.tags.exists(_.contains(Optimize.ClusterSpecTag))),
      "clustered outputs must carry the spec tag")

    // nothing new → no-op, zero files churned
    val m0 = Optimize.cluster(spark, dir, targetFileBytes = 16 * 1024)
    assert(m0.filesRemoved == 0 && m0.filesAdded == 0,
      "an up-to-date table must not re-churn")

    // append 3 new files → only they re-cluster; prior outputs untouched
    GraftWriter.write((1000 until 1600).map(i => (i.toLong, s"n$i"))
      .toDF("id", "v").repartition(3), dir,
      org.apache.spark.sql.SaveMode.Append)
    val m2 = Optimize.cluster(spark, dir, targetFileBytes = 16 * 1024)
    assert(m2.filesRemoved == 3,
      s"second run must rewrite ONLY the new files, rewrote ${m2.filesRemoved}")
    val after = DeltaLog.forPath(spark, dir).update().files.map(_.path).toSet
    assert(clustered.map(_.path).forall(after.contains),
      "previously-clustered files must survive untouched")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 1600)

    // changing the declared columns invalidates every tag → full re-layout
    DeltaTable.forPath(spark, dir).clusterBy(Seq("v"))
    val m3 = Optimize.cluster(spark, dir, targetFileBytes = 16 * 1024)
    assert(m3.filesRemoved == after.size,
      "a spec change must re-qualify every file")
  }

  test("cluster on a non-clustered table refuses with guidance") {
    val dir = tempTable("cluster-none").toString
    GraftWriter.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val e = intercept[IllegalArgumentException](Optimize.cluster(spark, dir))
    assert(e.getMessage.contains("clusterBy"))
  }

  test("a FOREIGN clustered table (nested-path domain) clusters and accepts appends") {
    val dir = tempTable("cluster-foreign").toString
    GraftWriter.write((0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir)
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    log.startTransaction()
      .addAction(ProtocolAction(1, 7, None,
        Some(ProtocolSupport.impliedWriterFeatures(snap.minWriterVersion) ++
          Set("clustering", "domainMetadata"))))
      .addAction(DomainMetadataAction("delta.clustering",
        """{"clusteringColumns":[["id"]]}"""))
      .commit()
    assert(DeltaTable.forPath(spark, dir).clusteringColumns == Seq("id"))
    GraftWriter.write(Seq((999L, "x")).toDF("id", "v"), dir, SaveMode.Append)
    Optimize.cluster(spark, dir)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 51)
  }

  test("SQL CREATE TABLE ... CLUSTER BY authors the domain at version 0") {
    val dir = tempTable("cluster-sql").toString
    spark.sql("CREATE TABLE cluster_sql (id BIGINT, grp INT, v STRING) " +
      s"USING `graft-delta` CLUSTER BY (id, grp) OPTIONS (path '$dir')")
    try {
      val snap = DeltaLog.forPath(spark, dir).update()
      assert(snap.domainMetadata("delta.clustering") ==
        """{"clusteringColumns":[["id"],["grp"]]}""")
      val wf = snap.writerFeatures.getOrElse(Set.empty)
      assert(wf.contains("clustering") && wf.contains("domainMetadata"))
      spark.sql("INSERT INTO cluster_sql VALUES (1, 2, 'a')")
      assert(spark.sql("SELECT count(*) FROM cluster_sql").head().getLong(0) == 1)
      Optimize.cluster(spark, dir) // domain drives the layout rewrite
      // detail surfaces the clustering declaration
      val det = spark.sql(s"SELECT clustering_columns FROM graft_detail('$dir')").head()
      assert(det.getString(0) == "id,grp")
    } finally spark.sql("DROP TABLE cluster_sql")
  }

  test("ALTER TABLE CLUSTER BY re-declares; CLUSTER BY NONE removes the domain") {
    val dir = tempTable("cluster-alter").toString
    spark.sql("CREATE TABLE cluster_alter (id BIGINT, grp INT, v STRING) " +
      s"USING `graft-delta` OPTIONS (path '$dir')")
    try {
      spark.sql("ALTER TABLE cluster_alter CLUSTER BY (grp)")
      assert(DeltaTable.forPath(spark, dir).clusteringColumns == Seq("grp"))
      spark.sql("ALTER TABLE cluster_alter CLUSTER BY (id, grp)")
      assert(DeltaTable.forPath(spark, dir).clusteringColumns == Seq("id", "grp"))
      spark.sql("ALTER TABLE cluster_alter CLUSTER BY NONE")
      assert(DeltaTable.forPath(spark, dir).clusteringColumns.isEmpty)
    } finally spark.sql("DROP TABLE cluster_alter")
  }

  test("guardrails: unknown and partition columns refuse") {
    val dir = tempTable("cluster-guard").toString
    GraftWriter.write(Seq((1L, "a", "p1")).toDF("id", "v", "part"), dir,
      partitionBy = Seq("part"))
    val dt = DeltaTable.forPath(spark, dir)
    intercept[IllegalArgumentException](dt.clusterBy(Seq("nope")))
    intercept[IllegalArgumentException](dt.clusterBy(Seq("part")))
  }
}
