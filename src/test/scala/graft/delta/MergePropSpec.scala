package graft.delta

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential property test for MERGE INTO: random clause stacks executed
  * by [[MergeBuilder]] are checked against a PURE-SCALA executable model of
  * SQL MERGE (per-row evaluation over collected data — independent of any
  * Spark plan, so the check is not circular).
  *
  * Covered shapes per seed: join on a shifted key, 0-2 matched clauses
  * (update/delete, each with a random guard), optional insert clause,
  * optional not-matched-by-source clause, null-bearing value columns.
  * First-matching-clause-wins ordering and three-valued guard logic are the
  * contract under test.
  */
class MergePropSpec extends AnyFunSuite with SparkTestBase {
  import LogFixtures.tempTable
  import spark.implicits._

  private case class R(id: Long, v: String, n: Option[Long])

  /** The executable model: SQL MERGE semantics over plain collections. */
  private def model(target: Seq[R], source: Seq[R], shift: Long,
                    clauses: Seq[Clause]): Seq[R] = {
    val srcByKey = source.groupBy(_.id + shift).view.mapValues(_.head).toMap
    val matchedTargetKeys = target.map(_.id).toSet
    def guardTrue(g: Guard, t: Option[R], s: Option[R]): Boolean = g match {
      case GuardTrue => true
      case GuardSrcVEq(x) => s.exists(r => r.v != null && r.v == x)
      case GuardTgtNGt(x) => t.exists(_.n.exists(_ > x)) // NULL n -> false
    }
    val out = scala.collection.mutable.Buffer[R]()
    // matched / not-matched-by-source handling per target row
    target.foreach { t =>
      srcByKey.get(t.id) match {
        case Some(s) => // matched: first applicable matched-clause wins
          clauses.collectFirst {
            case c @ MatchedUpd(g, _) if guardTrue(g, Some(t), Some(s)) => c
            case c @ MatchedDel(g) if guardTrue(g, Some(t), Some(s)) => c
          } match {
            case Some(MatchedUpd(_, setV)) => out += t.copy(v = setV)
            case Some(MatchedDel(_)) => ()
            case _ => out += t
          }
        case None => // not matched by source
          clauses.collectFirst {
            case c @ BySourceDel(g) if guardTrue(g, Some(t), None) => c
          } match {
            case Some(BySourceDel(_)) => ()
            case None => out += t
          }
      }
    }
    // unmatched source rows: insert clause
    val hasInsert = clauses.exists(_.isInstanceOf[InsertAll.type])
    if (hasInsert) source.foreach { s =>
      if (!matchedTargetKeys.contains(s.id + shift))
        out += R(s.id + shift, s.v, s.n)
    }
    out.toSeq
  }

  private sealed trait Guard
  private case object GuardTrue extends Guard
  private case class GuardSrcVEq(x: String) extends Guard
  private case class GuardTgtNGt(x: Long) extends Guard

  private sealed trait Clause
  private case class MatchedUpd(g: Guard, setV: String) extends Clause
  private case class MatchedDel(g: Guard) extends Clause
  private case object InsertAll extends Clause
  private case class BySourceDel(g: Guard) extends Clause

  private def guardCol(g: Guard): org.apache.spark.sql.Column = g match {
    case GuardTrue => lit(true)
    case GuardSrcVEq(x) => col("s.v") === x
    case GuardTgtNGt(x) => col("t.n") > x
  }

  test("random clause stacks match the pure-Scala MERGE model (20 seeds)") {
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed * 6151)
      val target = (0 until 60).map(i =>
        R(i.toLong, if (i % 6 == 0) null else s"t${i % 4}",
          if (i % 9 == 0) None else Some(i % 7L)))
      val shift = rnd.nextInt(30).toLong
      val source = (0 until 40).map { i =>
        val id = rnd.nextInt(80).toLong
        R(id, if (i % 5 == 0) null else s"x${i % 3}", Some(i.toLong))
      }.distinctBy(_.id) // unique keys: multi-match is guarded separately

      def guard(): Guard = rnd.nextInt(3) match {
        case 0 => GuardTrue
        case 1 => GuardSrcVEq(s"x${rnd.nextInt(4)}")
        case 2 => GuardTgtNGt(rnd.nextInt(7).toLong)
      }
      val clauses = scala.collection.mutable.Buffer[Clause]()
      (0 until rnd.nextInt(3)).foreach { _ =>
        clauses += (if (rnd.nextBoolean()) MatchedUpd(guard(), s"u$seed")
                    else MatchedDel(guard()))
      }
      if (rnd.nextBoolean()) clauses += InsertAll
      if (rnd.nextInt(4) == 0) clauses += BySourceDel(guard())
      if (clauses.isEmpty) clauses += InsertAll

      val dir = tempTable(s"mergeprop-$seed").toString
      GraftWriter.write(
        target.map(r => (r.id, r.v, r.n.map(Long.box).orNull))
          .toDF("id", "v", "n").repartition(2),
        dir, SaveMode.ErrorIfExists)
      val sourceDf = source.map(r => (r.id, r.v, r.n.map(Long.box).orNull))
        .toDF("id", "v", "n")

      var b = Merge.into(spark, dir, sourceDf, col("t.id") === col("s.id") + shift)
      clauses.foreach {
        case MatchedUpd(g, setV) => b = b.whenMatchedUpdate(guardCol(g), Map("v" -> lit(setV)))
        case MatchedDel(g) => b = b.whenMatchedDelete(guardCol(g))
        case InsertAll => b = b.whenNotMatchedInsert(Map(
          "id" -> (col("s.id") + shift), "v" -> col("s.v"), "n" -> col("s.n")))
        case BySourceDel(g) => b = b.whenNotMatchedBySourceDelete(guardCol(g))
      }
      b.execute()

      val got = DeltaTable.forPath(spark, dir).toDF
        .as[(Long, Option[String], Option[Long])].collect()
        .map { case (i, v, n) => R(i, v.orNull, n) }.toSet
      val want = model(target, source, shift, clauses.toSeq).toSet
      assert(got == want,
        s"seed $seed (shift $shift, clauses $clauses):\n got-want=${got -- want}\n want-got=${want -- got}")
    }
  }
}
