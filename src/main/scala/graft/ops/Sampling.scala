package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation sampling for training-data pipelines.
  *
  * Deterministic by construction: ranking keys are cryptographic hashes of
  * row ids, not RNG draws, so a sample is reproducible across runs, engines
  * and partitionings — the property that matters when a 100 TB corpus is
  * re-curated and the training set must not silently shift. No collect, no
  * global sort: every variant is one window (hash-shuffle on the stratum)
  * or one filter.
  */
object Sampling {

  /** Exact k-smallest-hash per stratum without a one-task-per-stratum
    * global window (a handful of language strata over a 100 TB corpus would
    * otherwise serialize into a handful of tasks). Two phases, both exact:
    *
    *  1. per-input-partition top-k per stratum (window keyed by
    *     `(stratum, spark_partition_id)` — fully parallel). Any row in the
    *     global top-k is in its own partition's top-k, so phase 1 keeps a
    *     superset of the answer while cutting candidates to ≤ k·P per
    *     stratum;
    *  2. global top-k per stratum over the bounded candidate set.
    *
    * Ranking key is `md5(id)` with the id as tiebreak — total, and
    * reproducible across runs, engines, and partitionings. */
  private def topKPerStratum(df: DataFrame, strataCols: Seq[String],
                             idCol: String, k: Column): DataFrame = {
    val h = md5(col(idCol).cast("string"))
    val local = Window
      .partitionBy((strataCols.map(col) :+ spark_partition_id()): _*)
      .orderBy(h, col(idCol))
    val global = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(h, col(idCol))
    df.withColumn("__graft_lrank", row_number().over(local))
      .filter(col("__graft_lrank") <= k)
      .withColumn("__graft_rank", row_number().over(global))
      .filter(col("__graft_rank") <= k)
      .drop("__graft_lrank", "__graft_rank")
  }

  /** Exactly `min(k, |stratum|)` rows per stratum — equalizes class balance
    * (e.g. k docs per language) regardless of source skew. */
  def stratified(df: DataFrame, strataCols: Seq[String], idCol: String,
                 k: Int): DataFrame =
    topKPerStratum(df, strataCols, idCol, lit(k))

  /** Bernoulli-style deterministic fraction: keep a row iff the first 4
    * bytes of md5(id) fall under `fraction` of the 32-bit space. Stateless
    * (no window, no shuffle) — the scan-rate path for "take ~1% of the
    * corpus". */
  def byFraction(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    if (fraction == 1.0) return df
    // fixed-width lowercase hex compares lexicographically as numerically,
    // so the same literal works verbatim in any engine with md5()
    val thr = f"${(fraction * (1L << 32)).toLong}%08x"
    df.filter(substring(md5(col(idCol).cast("string")), 1, 8) < lit(thr))
  }

  /** Weighted stratified sampling: per-stratum quotas given as
    * `(stratumValue → k)`; strata absent from the map are dropped. The
    * quota map is tiny (one entry per class) and broadcasts. */
  def byQuota(df: DataFrame, strataCol: String, idCol: String,
              quotas: Map[String, Int]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = quotas.toSeq.toDF(strataCol + "__q_key", "__graft_quota")
    topKPerStratum(
      df.join(broadcast(q), col(strataCol) === col(strataCol + "__q_key")),
      Seq(strataCol), idCol, col("__graft_quota"))
      .drop(strataCol + "__q_key", "__graft_quota")
  }
}
