package graft.delta

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{catalystExpression => ex}
import org.scalatest.funsuite.AnyFunSuite

/** Regressions for the round-11 optimizer/scan-tier review: timestamp
  * partition typing, canonical read-domain names, exact double/string
  * stats comparisons, subquery-safe plan rewrites, and nested NOT NULL
  * enforcement. */
class OptimizerTierReviewSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  test("timestamp-partitioned tables serve typed partition values and prune") {
    val dir = tempTable("ts-part").toString
    val df = Seq(
      (1L, "2024-01-02 03:04:05"), (2L, "2024-01-02 03:04:05"),
      (3L, "2024-06-07 08:09:10"))
      .toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp_ntz").as("ts"))
    GraftWriter.write(df, dir, SaveMode.ErrorIfExists, partitionBy = Seq("ts"))
    val out = DeltaTable.forPath(spark, dir).toDF
    // partition values come back typed and NON-NULL (the old silent-null
    // path served NULL for every timestamp partition)
    assert(out.filter(col("ts").isNull).count() == 0)
    val hit = out.filter(col("ts") === expr("timestamp_ntz'2024-01-02 03:04:05'"))
    assert(hit.count() == 2)
    assert(hit.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("case-mismatched predicates resolve to the canonical partition name") {
    // Eq("ID", ...) matches no add's partitionValues (keyed "id"), making
    // the read domain empty — conflict detection then wrongly proved
    // disjointness against every concurrent append (lost update)
    val fs = PartitionFilter.fromCatalyst(ex(col("ID") === lit("5")), Seq("id"))
    assert(fs == Seq(PartitionFilter.Eq("id", "5")), fs.toString)
    assert(fs.head.matches(Map("id" -> "5")))
    val in = PartitionFilter.fromCatalyst(ex(col("Id").isin("a", "b")), Seq("id"))
    assert(in == Seq(PartitionFilter.In("id", Set("a", "b"))))
  }

  test("stats pruning keeps files at exact double boundaries (shortest-repr trap)") {
    val m = new ObjectMapper()
    def adds(statJson: String) = Seq(AddAction("f.parquet", 1L, Map.empty, 1L,
      dataChange = true, stats = Some(statJson)))
    // stat "0.1" (shortest repr) vs predicate 0.1d (binary expansion):
    // EQUAL doubles must compare equal — the file holds d == 0.1
    val a = adds("""{"numRecords":1,"minValues":{"d":0.1},"maxValues":{"d":0.1},"nullCount":{"d":0}}""")
    assert(StatsPredicate.prune(a, Seq(StatsPredicate.EqTo("d", 0.1))).size == 1)
    assert(StatsPredicate.prune(a, Seq(StatsPredicate.Ge("d", 0.1))).size == 1)
    assert(StatsPredicate.prune(a, Seq(StatsPredicate.Le("d", 0.1))).size == 1)
    // ...while genuinely-disjoint predicates still prune
    assert(StatsPredicate.prune(a, Seq(StatsPredicate.Gt("d", 0.1))).isEmpty)
    // and the 2^53 integral exactness holds alongside (the r11 fix pair)
    val big = 9007199254740993L
    val b = adds(s"""{"numRecords":1,"minValues":{"c":$big},"maxValues":{"c":$big},"nullCount":{"c":0}}""")
    assert(StatsPredicate.prune(b, Seq(StatsPredicate.Gt("c", big - 1))).size == 1)
    m.readTree("{}") // keep the jackson import honest
  }

  test("string stats order by UTF-8 bytes, not UTF-16 code units") {
    // U+FFFD ("￿" family) sorts ABOVE U+1F600 in UTF-16 (surrogates
    // D83D < FFFD) but BELOW it in UTF-8 — parquet's stats convention
    assert(StatsPredicate.utf8Compare("�", "😀") < 0)
    assert(StatsPredicate.utf8Compare("😀", "�") > 0)
    assert(StatsPredicate.utf8Compare("abc", "abd") < 0)
    assert(StatsPredicate.utf8Compare("ab", "abc") < 0)
    assert(StatsPredicate.utf8Compare("same", "same") == 0)
    // a file whose max is the emoji must stay for `s = "�"` queries
    val a = Seq(AddAction("f.parquet", 1L, Map.empty, 1L, dataChange = true,
      stats = Some("""{"numRecords":2,"minValues":{"s":"a"},"maxValues":{"s":"😀"},"nullCount":{"s":0}}""")))
    assert(StatsPredicate.prune(a, Seq(StatsPredicate.EqTo("s", "�"))).size == 1)
  }

  test("partition filters with scalar subqueries do not crash the plan rewrite") {
    val dir = tempTable("subq-prune").toString
    GraftWriter.write(
      (0 until 40).map(i => (i.toLong, i % 4)).toDF("id", "p"),
      dir, SaveMode.ErrorIfExists, partitionBy = Seq("p"))
    spark.sql(s"CREATE TABLE subq_t USING `graft-delta` LOCATION '$dir'")
    try {
      // the subquery-bearing conjunct must be excluded from plan-time
      // pruning (it is not evaluable yet), not crash the optimizer
      val got = spark.sql(
        "SELECT count(*) FROM subq_t WHERE p = (SELECT max(p) - 3 FROM subq_t)")
        .as[Long].head()
      assert(got == 10)
    } finally spark.sql("DROP TABLE subq_t")
  }

  test("nested NOT NULL fields are enforced; null parents stay legal") {
    val dir = tempTable("nested-notnull").toString
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("addr", StructType(Seq(
        StructField("city", StringType, nullable = false),
        StructField("zip", StringType, nullable = true))), nullable = true)))
    // the violating frame declares an all-nullable schema (nullability is
    // not load-bearing for the append compat check) so Spark's row ENCODER
    // does not pre-empt graft's own enforcement
    val lenient = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("addr", StructType(Seq(
        StructField("city", StringType, nullable = true),
        StructField("zip", StringType, nullable = true))), nullable = true)))
    def frame(rows: Seq[org.apache.spark.sql.Row], s: StructType = schema) =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), s)
    import org.apache.spark.sql.Row
    GraftWriter.write(frame(Seq(Row(1L, Row("ny", "10001")), Row(2L, null))), dir)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 2) // null parent OK
    val e = intercept[Exception] {
      GraftWriter.write(frame(Seq(Row(3L, Row(null, "x"))), lenient),
        dir, SaveMode.Append)
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("NOT NULL addr.city") ||
        Option(e.getCause).exists(_.getMessage.contains("NOT NULL addr.city"))),
      s"expected the nested NOT NULL violation, got $e")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 2)
  }
}
