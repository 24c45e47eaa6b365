package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared fixtures of the standing-dedup-index suites ([[DedupIndexSpec]],
  * [[DedupIndexFoldSpec]] — ONE suite until r18, split so the two halves
  * can run as parallel forked test groups; every test is preserved). */
trait DedupIndexFixtures extends SparkTestBase {

  protected def root(name: String): String = {
    val d = new java.io.File(
      s"target/dedupindex-$name-${java.util.UUID.randomUUID()}")
    d.mkdirs()
    d.getAbsolutePath
  }

  /** Deterministic word soup: `words(seed, n)` is reproducible and two
    * different seeds share no words (seed is baked into every token). */
  protected def words(seed: Int, from: Int, until: Int): String =
    (from until until).map(i => s"w${seed}x$i").mkString(" ")

  /** The synthetic corpus, split into 4 slices by id range:
    *  - family F: ids 1 (base), 101 (b1), 301 (b3) — near-identical texts;
    *  - bridge: 10 (base) = words 0..19, 110 (b1) = words 10..29 — NOT
    *    similar to each other (J ≈ 0.29); 210 (b2) = words 0..29 — similar
    *    to both, so batch 2 must MERGE the two standing families;
    *  - singletons everywhere else. */
  protected def corpus: DataFrame = {
    val fam = words(7, 0, 24)
    val rows = {
      import spark.implicits._
      (Seq((1L, fam + " tailone"), (101L, fam + " tailtwo"),
        (301L, fam + " tailthree"),
        (10L, words(9, 0, 20)), (110L, words(9, 10, 30)),
        (210L, words(9, 0, 30))) ++
      Seq(5L, 6L, 105L, 106L, 205L, 206L, 305L, 306L).map(i =>
        (i, words(i.toInt, 0, 15)))).toDF("doc_id", "text")
    }
    rows
  }

  protected def slice(df: DataFrame, from: Long, until: Long): DataFrame =
    df.filter(col("doc_id") >= from && col("doc_id") < until)

  protected def dump(df: DataFrame): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    df.select("comp", "id", "len").as[(Long, Long, Long)]
      .collect().toSeq.sorted
  }
}
