package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench error honesty (r9 VERDICT): a query that throws must surface in
  * the JSON's `errors` map instead of silently reading as a ~0 s success. */
class BenchErrorSpec extends AnyFunSuite {

  test("timeOne records the error and still returns the elapsed wall") {
    val (okSec, okErr) = Bench.timeOne(() => ())
    assert(okErr.isEmpty && okSec >= 0)
    val (sec, err) = Bench.timeOne(() =>
      throw new IllegalStateException("boom  with\nnewline"))
    assert(sec >= 0)
    assert(err.contains("IllegalStateException: boom with newline"),
      s"got $err")
  }

  test("describe truncates and flattens whitespace; null message tolerated") {
    val long = Bench.describe(new RuntimeException("x" * 500))
    assert(long.length <= "RuntimeException: ".length + 160)
    assert(Bench.describe(new RuntimeException(null: String)) ==
      "RuntimeException: ")
  }

  test("errorsJson round-trips quotes/backslashes/controls through a real parser") {
    val raw = "he said \"a\\b\"\tdone"
    val json = Bench.errorsJson(scala.collection.Map("q1" -> raw))
    val node = graft.delta.ActionCodec.mapper.readTree(json)
    assert(node.get("q1").asText == raw)
    assert(Bench.errorsJson(scala.collection.Map.empty) == "{}")
  }

  test("wallMin takes the min over clean samples and never picks a crash") {
    val s1 = (Map("qa" -> 5.0, "qb" -> 0.01, "qc" -> 1.0),
              Map("qb" -> "boom"))             // qb crashed in sweep 1 (~0 s)
    val s2 = (Map("qa" -> 1.2, "qb" -> 2.0, "qc" -> 0.9),
              Map.empty[String, String])
    val mins = Bench.wallMin(Seq(s1, s2))
    assert(mins("qa") == 1.2)                   // genuine min across sweeps
    assert(mins("qb") == 2.0)                   // crash sample excluded
    assert(mins("qc") == 0.9)
  }

  test("wallMin falls back to the recorded wall when every sample errored") {
    val s1 = (Map("qa" -> 0.02), Map("qa" -> "boom1"))
    val s2 = (Map("qa" -> 0.03), Map("qa" -> "boom2"))
    assert(Bench.wallMin(Seq(s1, s2))("qa") == 0.02)
  }
}
