package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences ("bins") so context windows are densely filled — the step
  * between a curated corpus and batched training examples.
  *
  * Bin packing is inherently sequential, so the distributed shape is
  * pack-within-partition: documents hash-partition by id (deterministic),
  * sort size-descending, and each partition runs best-fit-decreasing with a
  * TreeMap of open-bin capacities (O(log bins) per doc — no quadratic
  * first-fit scan). Bin ids are globally unique (`partitionId << 32 |
  * localBin`). Cross-partition waste is bounded: every partition leaves at
  * most one bin per distinct capacity gap unfilled, and at 100 TB the
  * per-partition doc count is large enough that fill factors sit within a
  * point of a global pack — the standard trade that keeps packing one
  * shuffle + one mapPartitions (`mapPartitions` is the right tool here:
  * per-partition stateful imperative logic, inexpressible as row-local
  * Catalyst expressions).
  *
  * Documents at or above the budget get a dedicated bin each (callers
  * truncate downstream); output is one row per document:
  * `(bin_id, doc_id, n_tokens)`.
  */
object Packing {

  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // Fail fast on non-integral ids: a string id under cast("long") throws
    // mid-job with ANSI on, or nulls EVERY id with ANSI off — one partition
    // holding the whole corpus and a bin map keyed entirely by null (the
    // same trap Clustering.survivors closed in r9; r11 review). Derive an
    // integral surrogate upstream (e.g. xxhash64(id)) for string corpora.
    val idType = docs.schema(idCol).dataType
    require(Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.ByteType).contains(idType),
      s"packSequences needs an integral id column, got $idCol: $idType")
    val spark = docs.sparkSession
    import spark.implicits._
    // the packing partition is an EXPLICIT deterministic column, never the
    // physical partition index: TaskContext.getPartitionId tracks the
    // POST-AQE physical plan (coalesced/replanned shuffles renumber it),
    // which made bin ids depend on runtime planning — two packs of the
    // same rows could disagree, and the incremental repack's ≡-full-repack
    // contract with them (r17 — caught by PipelineProbeMain's stage-4
    // control). pmod(hash(doc_id)) is a pure row function; bfdPack keys on
    // the VALUE, so any physical partitioning that keeps a pid's rows
    // together (hash repartition on pid does) yields identical bins.
    val nParts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(tokenCol).cast("long").as("n_tokens"))
    base
      .withColumn("pid", pmod(hash(col("doc_id")), lit(nParts)).cast("long"))
      .select("pid", "doc_id", "n_tokens")
      .repartition(nParts, col("pid"))
      .sortWithinPartitions(col("pid"), col("n_tokens").desc, col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions(it => bfdPack(it, budget))
      .toDF("bin_id", "doc_id", "n_tokens")
  }

  /** The best-fit-decreasing kernel over (pid, doc_id, n_tokens) triples
    * sorted by (pid, n_tokens desc, doc_id): packs each pid segment
    * independently (state resets on pid change), emitting the same
    * globally-unique `pid << 32 | localBin` ids as [[packSequences]] —
    * ONE definition, so the incremental repack provably replays the full
    * pack's per-partition decisions. */
  private def bfdPack(it: Iterator[(Long, Long, Long)],
                      budget: Long): Iterator[(Long, Long, Long)] = {
    var curPid = Long.MinValue
    // remaining capacity → open bin ids with exactly that capacity
    var open: java.util.TreeMap[Long, mutable.ArrayDeque[Long]] = null
    var nextBin = 0L
    def newBin(): Long = { val b = nextBin; nextBin += 1; b }
    it.map { case (pid, id, rawN) =>
      if (pid != curPid || open == null) {
        curPid = pid
        open = new java.util.TreeMap[Long, mutable.ArrayDeque[Long]]()
        nextBin = 0L
      }
      val n = math.max(rawN, 0L)
      val bin =
        if (n >= budget) newBin() // dedicated, never reopened
        else {
          // best fit: smallest capacity that still takes n
          val e = open.ceilingEntry(n)
          if (e == null) {
            val fresh = newBin()
            put(open, budget - n, fresh)
            fresh
          } else {
            val q = e.getValue
            val b = q.removeHead()
            if (q.isEmpty) open.remove(e.getKey)
            put(open, e.getKey - n, b)
            b
          }
        }
      (pid << 32 | bin, id, rawN)
    }
  }

  /** Incremental repack after a takedown wave (r16 verdict #7): deleting
    * a doc invalidates ONLY its hash partition's bins — [[packSequences]]
    * partitions by doc_id and packs each partition independently, so
    * every partition holding no deleted doc keeps byte-identical bins
    * under a full repack of the remaining corpus. This recomputes
    * best-fit-decreasing for JUST the affected partitions' surviving docs
    * (each routed by the pid already encoded in bits 32+ of its bin_id —
    * no re-hash, no assumption about the original partition count), so
    *
    *   repackDeletes(packed, deleted)._1  ≡  packSequences(docs ∖ deleted)
    *
    * at the same partition count, for O(affected partitions) work — a
    * 100-doc takedown against a 100 TB packed corpus touches ~100
    * partitions, not the corpus.
    *
    * Returns (packed', binCdf): `binCdf` is the bin-level change feed
    * (bin_id, change) with change ∈ `removed` (bin vanished) |
    * `rewritten` (membership changed) | `added` (new bin) — exactly the
    * downstream training-shard invalidation set; bins the repack
    * reproduced identically emit NO row, so the feed stays O(changed). */
  def repackDeletes(packed: DataFrame, deletedIds: DataFrame,
                    budget: Long): (DataFrame, DataFrame) = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = packed.sparkSession
    import spark.implicits._
    val del = deletedIds
      .select(col(deletedIds.columns.head).cast("long").as("doc_id"))
      .distinct()
    val withPid = packed.select(col("bin_id"), col("doc_id"),
      col("n_tokens"), shiftright(col("bin_id"), 32).as("pid"))
    // affected partitions: O(delete wave) ids → O(wave) pids, broadcast
    val affectedPids = withPid.join(del, Seq("doc_id"))
      .select("pid").distinct()
    val keep = withPid.join(broadcast(affectedPids), Seq("pid"), "left_anti")
      .select("bin_id", "doc_id", "n_tokens")
    val oldAffected = withPid.join(broadcast(affectedPids), Seq("pid"))
      .localCheckpoint(true) // repack input + the bin diff both read it
    val repacked = oldAffected
      .join(del, Seq("doc_id"), "left_anti")
      .select(col("pid"), col("doc_id"), col("n_tokens"))
      .repartition(col("pid"))
      .sortWithinPartitions(col("pid"), col("n_tokens").desc, col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions(it => bfdPack(it, budget))
      .toDF("bin_id", "doc_id", "n_tokens")
      .localCheckpoint(true) // output union + the bin diff both read it
    val binCdf = oldAffected.select(col("bin_id"), col("doc_id"))
      .withColumn("o", lit(1))
      .join(repacked.select(col("bin_id"), col("doc_id"))
        .withColumn("n", lit(1)), Seq("bin_id", "doc_id"), "full_outer")
      .groupBy("bin_id")
      .agg(coalesce(sum("n"), lit(0)).as("n_new"),
        coalesce(sum("o"), lit(0)).as("n_old"),
        coalesce(sum(when(col("o").isNull || col("n").isNull, 1)
          .otherwise(0)), lit(0)).as("n_diff"))
      .withColumn("change",
        when(col("n_new") === 0, "removed")
          .when(col("n_old") === 0, "added")
          .when(col("n_diff") > 0, "rewritten"))
      .filter(col("change").isNotNull)
      .select("bin_id", "change")
    (keep.unionByName(repacked), binCdf)
  }

  private def put(m: java.util.TreeMap[Long, mutable.ArrayDeque[Long]],
                  cap: Long, bin: Long): Unit =
    if (cap > 0) {
      val q = m.get(cap)
      if (q == null) { val nq = new mutable.ArrayDeque[Long](); nq.append(bin); m.put(cap, nq) }
      else q.append(bin)
    }
}
