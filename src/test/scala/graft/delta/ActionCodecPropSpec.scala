package graft.delta

import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based wire-codec tests: EVERY generated action must survive the
  * JSON line round-trip unchanged — the codec is a wire protocol, and
  * generator-driven coverage catches field-shape corners hand-written
  * fixtures miss (empty maps, null partition values, unicode paths, extreme
  * longs). */
class ActionCodecPropSpec extends AnyFunSuite {

  /** scalatest↔scalacheck bridge isn't in the offline cache; sample the
    * generators directly (fixed seed count, retry on discard). */
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { _ =>
      Iterator.continually(gen.sample).flatten.take(1).foreach(f)
    }

  private val pathGen: Gen[String] = for {
    dirs <- Gen.listOfN(2, Gen.alphaNumStr.suchThat(_.nonEmpty))
    name <- Gen.alphaNumStr.suchThat(_.nonEmpty)
    uni <- Gen.oneOf("", "é", "日本", "x=1")
  } yield (dirs :+ s"$name$uni.parquet").mkString("/")

  private val pvGen: Gen[Map[String, String]] = Gen.mapOf(for {
    k <- Gen.identifier.suchThat(_.nonEmpty)
    v <- Gen.oneOf(Gen.alphaNumStr, Gen.const(null: String))
  } yield k -> v)

  private val addGen: Gen[AddAction] = for {
    p <- pathGen; size <- Gen.chooseNum(0L, Long.MaxValue)
    pv <- pvGen; mt <- Gen.chooseNum(0L, Long.MaxValue)
    dc <- Arbitrary.arbBool.arbitrary
    stats <- Gen.option(Gen.const("""{"numRecords":1,"minValues":{},"maxValues":{},"nullCount":{}}"""))
  } yield AddAction(p, size, pv, mt, dc, stats)

  private val removeGen: Gen[RemoveAction] = for {
    p <- pathGen; ts <- Gen.chooseNum(0L, Long.MaxValue)
    dc <- Arbitrary.arbBool.arbitrary
    efm <- Gen.option(Arbitrary.arbBool.arbitrary)
    pv <- Gen.option(pvGen); size <- Gen.option(Gen.chooseNum(0L, Long.MaxValue))
  } yield RemoveAction(p, ts, dc, efm, pv, size)

  private val txnGen: Gen[TxnAction] = for {
    app <- Gen.identifier.suchThat(_.nonEmpty)
    v <- Gen.chooseNum(0L, Long.MaxValue)
    lu <- Gen.option(Gen.chooseNum(0L, Long.MaxValue))
  } yield TxnAction(app, v, lu)

  private val metaGen: Gen[MetaDataAction] = for {
    id <- Gen.uuid.map(_.toString)
    name <- Gen.option(Gen.alphaNumStr)
    desc <- Gen.option(Gen.oneOf("", "desc with spaces", "日本語"))
    pc <- Gen.listOf(Gen.identifier.suchThat(_.nonEmpty))
    ct <- Gen.option(Gen.chooseNum(0L, Long.MaxValue))
    conf <- Gen.mapOf(Gen.zip(Gen.identifier.suchThat(_.nonEmpty), Gen.alphaNumStr))
  } yield MetaDataAction(id, name, desc, Format(),
    """{"type":"struct","fields":[]}""", pc, ct, conf)

  private val actionGen: Gen[Action] =
    Gen.oneOf(addGen, removeGen, txnGen, metaGen,
      Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(1, 7))
        .map { case (r, w) => ProtocolAction(r, w) })

  test("every action round-trips the JSON wire format unchanged") {
    forAll(actionGen) { a =>
      assert(ActionCodec.fromJsonLine(ActionCodec.toJsonLine(a)).contains(a))
    }
  }

  test("log entries round-trip as sequences") {
    forAll(Gen.listOfN(5, actionGen)) { actions =>
      val lines = ActionCodec.logEntry(actions).linesIterator.toSeq
      val back = lines.flatMap(ActionCodec.fromJsonLine)
      assert(back == actions)
    }
  }

  test("snapshot replay is deterministic: same actions → same state") {
    forAll(Gen.listOfN(20, Gen.oneOf(addGen, removeGen))) { actions =>
      val s1 = Snapshot.replay(Snapshot(), actions.iterator, 0)
      val s2 = Snapshot.replay(Snapshot(), actions.iterator, 0)
      assert(s1.files == s2.files && s1.tombstones == s2.tombstones)
      // the fold never produces duplicate active paths
      assert(s1.files.map(_.path).distinct.size == s1.files.size)
    }
  }
}
