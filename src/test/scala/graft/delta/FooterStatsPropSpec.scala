package graft.delta

import org.scalatest.funsuite.AnyFunSuite

/** Property: string stat truncation must emit SOUND bounds in UTF-8 byte
  * order — `truncateMin(s) <= s <= truncateMax(s)` for arbitrary unicode
  * content, including supplementary characters straddling the cut (the r12
  * surrogate-split bug class), U+FFFF runs, and max-code-point runs — and
  * the bounds themselves must be well-formed UTF-16 (no lone surrogates,
  * which are not interchange-valid JSON and UTF-8-encode as `?`). */
class FooterStatsPropSpec extends AnyFunSuite {

  private val L = FooterStats.MaxStringStatLength

  /** Code-point alphabet biased toward the hazardous ranges. */
  private def nextCp(rnd: scala.util.Random): Int = rnd.nextInt(8) match {
    case 0 => 'a' + rnd.nextInt(26)                 // mundane ASCII
    case 1 => rnd.nextInt(0xD7FF) + 1               // BMP below surrogates
    case 2 => 0xE000 + rnd.nextInt(0x2000)          // BMP above surrogates
    case 3 => 0xFFFD + rnd.nextInt(3)               // U+FFFD..U+FFFF edge
    case 4 => 0x10000 + rnd.nextInt(0x1000)         // supplementary (pairs)
    case 5 => 0x1F600 + rnd.nextInt(80)             // emoji block
    case 6 => 0x10FFFF - rnd.nextInt(4)             // max code point edge
    case 7 => 0xD7FF                                // bump-skips-surrogates edge
  }

  private def randomString(rnd: scala.util.Random, minLen: Int): String = {
    val sb = new java.lang.StringBuilder
    // build in UTF-16 units so the cut position lands everywhere relative
    // to pair boundaries
    while (sb.length < minLen + rnd.nextInt(24))
      sb.appendCodePoint(nextCp(rnd))
    sb.toString
  }

  private def wellFormed(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1)))
          return false
        i += 2
      } else if (Character.isLowSurrogate(c)) return false
      else i += 1
    }
    true
  }

  test("truncateMin/truncateMax bounds are sound and well-formed (1000 random strings)") {
    val rnd = new scala.util.Random(20260815)
    (0 until 1000).foreach { i =>
      val s = randomString(rnd, L + 1) // always longer than the cut
      assume(s.length > L)
      val mn = FooterStats.truncateMin(s)
      val mx = FooterStats.truncateMax(s)
      assert(mn.isInstanceOf[String], s"case $i: min must stay a string")
      val mnS = mn.asInstanceOf[String]
      assert(mnS.length <= L)
      assert(wellFormed(mnS), s"case $i: min bound has a lone surrogate")
      assert(StatsPredicate.utf8Compare(mnS, s) <= 0,
        s"case $i: min bound must lower-bound the value")
      mx match {
        case mxS: String =>
          assert(wellFormed(mxS), s"case $i: max bound has a lone surrogate")
          assert(StatsPredicate.utf8Compare(mxS, s) >= 0,
            s"case $i: max bound must upper-bound the value (s=${
              s.take(8).map(c => f"\\u$c%04x").mkString}...)")
          // and it bounds EVERY possible extension of the value's prefix:
          // the bound must dominate prefix + any suffix, which holds iff
          // it dominates prefix + U+10FFFF-runs; spot-check the worst case
          val worst = s.substring(0, math.min(s.length, L)) +
            new String(Character.toChars(0x10FFFF)) * 3
          assert(StatsPredicate.utf8Compare(mxS, worst) > 0 ||
            StatsPredicate.utf8Compare(mxS, worst) == 0,
            s"case $i: max bound must dominate every extension of the cut prefix")
        case _ => // BadStat: legal only when every retained code point is U+10FFFF
          val prefix = s.substring(0, math.min(s.length, L))
          assert(prefix.codePoints().toArray.forall(_ == 0x10FFFF),
            s"case $i: BadStat emitted for a bumpable prefix")
      }
    }
  }
}
