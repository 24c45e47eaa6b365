package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Differential property for benchmark-contamination detection: random
  * corpora with PLANTED contamination (benchmark texts embedded verbatim
  * inside longer corpus documents) checked against a pure-Scala shingle
  * containment model. Planted embeddings MUST be found (the recall that
  * makes decontamination trustworthy); everything reported must match the
  * model exactly (no false positives from the broadcast join path). */
class ContaminationPropSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def shingleSet(text: String, n: Int): Set[String] = {
    val w = text.toLowerCase.split(" ")
    if (w.length < n) Set.empty
    else w.sliding(n).map(_.mkString(" ")).toSet
  }

  test("planted contamination is found; report equals the containment model (10 seeds)") {
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed * 13007)
      def words(n: Int): String =
        (0 until n).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")

      val bench = (0 until 6).map(i => (i.toLong, words(8 + rnd.nextInt(6))))
      val corpus = (0 until 40).map { i =>
        val id = 100L + i
        if (i % 5 == 0) {
          // plant: benchmark doc embedded verbatim inside filler
          val b = bench(rnd.nextInt(bench.size))._2
          (id, s"${words(rnd.nextInt(6))} $b ${words(rnd.nextInt(6))}")
        } else (id, words(10 + rnd.nextInt(15)))
      }

      val got = Dedup.contamination(
          corpus.toDF("doc_id", "text"), "text", "doc_id",
          bench.toDF("bench_id", "text"), "text", "bench_id",
          n = 3, thresholdNum = 4, thresholdDen = 5)
        .select("doc_id", "bench_id", "inter", "bench_n")
        .as[(Long, Long, Long, Long)].collect().toSet

      // pure-Scala containment model
      val want = (for {
        (cid, ctext) <- corpus
        (bid, btext) <- bench
        c = shingleSet(ctext, 3); b = shingleSet(btext, 3)
        inter = (c intersect b).size.toLong
        if b.nonEmpty && inter * 5 >= b.size.toLong * 4
      } yield (cid, bid, inter, b.size.toLong)).toSet

      assert(got == want,
        s"seed $seed: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      // every planted embedding whose benchmark has >= 3 words was found
      val planted = corpus.zipWithIndex.collect { case ((id, text), i) if i % 5 == 0 => id }
      planted.foreach { id =>
        val text = corpus.find(_._1 == id).get._2
        val containsSome = bench.exists { case (_, b) =>
          shingleSet(b, 3).nonEmpty && shingleSet(b, 3).subsetOf(shingleSet(text, 3))
        }
        if (containsSome)
          assert(got.exists(_._1 == id), s"seed $seed: planted doc $id not reported")
      }
    }
  }
}
