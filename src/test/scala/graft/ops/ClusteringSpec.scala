package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def comps(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Clustering.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("chains, triangles and isolated pairs resolve to min-id components") {
    val m = comps(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 20L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("a long path needs diameter rounds and still converges") {
    val path = (0L until 40L).map(i => (i, i + 1))
    val m = comps(path)
    assert(m.size == 41 && m.values.forall(_ == 0L))
  }

  test("matches a BFS reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 200).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    // reference: union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v)).toMap
    // find() roots are min-ids because union always keeps the smaller root
    assert(comps(edges) == expected)
  }

  test("string doc ids cluster on the native type — no null-collapse") {
    // Regression (ADVICE r4): cast(id as long) on non-numeric ids produced
    // nulls, so every unpaired document fell into ONE null component and all
    // but one were dropped.
    val m = Clustering.connectedComponents(
      Seq(("doc-a", "doc-b"), ("doc-b", "doc-c"), ("doc-x", "doc-y"))
        .toDF("id_a", "id_b"))
      .as[(String, String)].collect().toMap
    assert(m == Map("doc-a" -> "doc-a", "doc-b" -> "doc-a", "doc-c" -> "doc-a",
      "doc-x" -> "doc-x", "doc-y" -> "doc-x"))

    val docs = Seq(
      ("doc-a", "short"), ("doc-b", "a much longer body"), ("doc-c", "mid body"),
      ("doc-p", "solo"), ("doc-q", "also solo"), ("doc-r", "third solo")
    ).toDF("doc_id", "text")
    val pairs = Seq(("doc-a", "doc-b"), ("doc-b", "doc-c")).toDF("id_a", "id_b")
    val kept = Clustering.survivors(docs, "doc_id", pairs,
      Seq(length(col("text")).desc, col("doc_id")))
      .select("doc_id").as[String].collect().sorted.toSeq
    // every singleton survives — under the bug only one of doc-p/q/r did
    assert(kept == Seq("doc-b", "doc-p", "doc-q", "doc-r"))
  }

  test("mixed-width integral ids still take the long fast path") {
    val m = Clustering.connectedComponents(
      Seq((1, 2), (2, 3)).toDF("id_a", "id_b")) // IntegerType edges
      .as[(Long, Long)].collect().toMap
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("driver union-find fast path ≡ distributed loop (long and string ids)") {
    // the r17 fast path must label IDENTICALLY to the distributed
    // min-propagation loop on the same edges — force the loop via cap=0
    val rnd = new scala.util.Random(13)
    val edges = (0 until 300).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    def run(): Map[Long, Long] = comps(edges)
    val fast = run()
    spark.conf.set(Clustering.DriverMaxEdgesKey, "0")
    val slow = try run() finally spark.conf.unset(Clustering.DriverMaxEdgesKey)
    assert(fast == slow)

    // string ids, including a supplementary-plane char: the driver min must
    // use UTF-8 byte order like Spark's min aggregate, not UTF-16
    val sPairs = Seq(("�-doc", "😀-doc"), ("b", "a"), ("b", "c"))
      .toDF("id_a", "id_b")
    def runS(df: org.apache.spark.sql.DataFrame): Map[String, String] =
      Clustering.connectedComponents(df).as[(String, String)].collect().toMap
    val fastS = runS(sPairs)
    spark.conf.set(Clustering.DriverMaxEdgesKey, "0")
    val slowS = try runS(sPairs) finally spark.conf.unset(Clustering.DriverMaxEdgesKey)
    assert(fastS == slowS)
    // U+FFFD (3-byte UTF-8) sorts BELOW U+1F600 (4-byte) in byte order
    assert(fastS("😀-doc") == "�-doc")
  }

  test("survivors keeps one row per family by preference, singletons intact") {
    val docs = Seq(
      (1L, "short"), (2L, "a much longer body"), (3L, "mid body"),
      (7L, "solo"), (9L, "also solo")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Clustering.survivors(docs, "doc_id", pairs,
      Seq(length(col("text")).desc, col("doc_id")))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 7L, 9L))
  }

  test("an empty pair set converges immediately (no duplicates found)") {
    // regression: sum over the empty label frame is null — this NPE'd at
    // sf0.1 where the Jaccard threshold yields zero pairs
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Clustering.connectedComponents(empty).count() == 0)
    val docs = Seq((1L, "a"), (2L, "bb")).toDF("doc_id", "text")
    val kept = Clustering.survivors(docs, "doc_id", empty,
      Seq(length(col("text")).desc, col("doc_id")))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L)) // every doc is its own family
  }
}
