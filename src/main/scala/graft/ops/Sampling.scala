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

  /** md5-based rank within the stratum; ties (hash collisions) break on the
    * id itself, keeping the order total. */
  private def hashRank(strataCols: Seq[String], idCol: String) =
    Window.partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))

  /** Exactly `min(k, |stratum|)` rows per stratum — equalizes class balance
    * (e.g. k docs per language) regardless of source skew. */
  def stratified(df: DataFrame, strataCols: Seq[String], idCol: String,
                 k: Int): DataFrame =
    df.withColumn("__graft_rank", row_number().over(hashRank(strataCols, idCol)))
      .filter(col("__graft_rank") <= k)
      .drop("__graft_rank")

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
    df.join(broadcast(q), col(strataCol) === col(strataCol + "__q_key"))
      .withColumn("__graft_rank", row_number().over(hashRank(Seq(strataCol), idCol)))
      .filter(col("__graft_rank") <= col("__graft_quota"))
      .drop(strataCol + "__q_key", "__graft_quota", "__graft_rank")
  }
}
