package graft.queries

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** One-copy enforcement for the micro-unit oracle recipe (r12 review):
  * DeltaQueries' oracle strings and Spark-SQL gate strings restate the
  * `CAST(CAST(x AS DECIMAL(p,s)) * 1000000 AS BIGINT)` conversion many
  * times — a precision fix in [[Relational.dec]] that misses one site
  * would silently split the gate's exactness rules. This spec pins every
  * occurrence, in the RUNTIME oracle map and in the queries-tier source
  * text, to the single canonical spelling [[Relational.DecSql]]. */
class MicroUnitConsistencySpec extends AnyFunSuite {

  // matches both the SQL spelling `... AS DECIMAL(p,s)) * 1000000` and the
  // Scala-string spelling `.cast("decimal(p,s)") * 1000000`
  private val DecimalTokenRe =
    """(?i)(DECIMAL\(\d+,\s*\d+\))"?\)\s*\*\s*1000000""".r

  private def offending(text: String): Seq[String] =
    DecimalTokenRe.findAllMatchIn(text)
      .map(_.group(1).toUpperCase.replace(" ", ""))
      .filterNot(_ == Relational.DecSql).toSeq

  test("every micro-unit conversion in the runtime oracle map uses Relational.DecSql") {
    graft.SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(offending(sql).isEmpty,
        s"$name oracle drifted from ${Relational.DecSql}: ${offending(sql)}")
    }
  }

  test("every micro-unit conversion in the queries-tier SOURCE uses Relational.DecSql") {
    // covers the Spark-side spark.sql(...) gate strings the runtime map
    // cannot see (they live inside query closures)
    val dir = Paths.get("src/main/scala/graft/queries")
    assume(Files.isDirectory(dir), "source tree not present at test cwd")
    Files.list(dir).iterator().asScala.filter(_.toString.endsWith(".scala"))
      .foreach { f =>
        val text = Files.readString(f)
        assert(offending(text).isEmpty,
          s"$f drifted from ${Relational.DecSql}: ${offending(text)}")
      }
  }

  test("the Scala-side recipe and the SQL spelling agree on precision") {
    assert(Relational.DecSql ==
      s"DECIMAL(${Relational.dec.precision},${Relational.dec.scale})")
    assert(Relational.DMICRO.contains(Relational.DecSql))
    assert(Relational.DSUM == s"CAST(SUM(${Relational.DMICRO}) AS BIGINT)")
  }
}
