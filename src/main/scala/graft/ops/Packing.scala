package graft.ops

import scala.collection.mutable

import org.apache.spark.TaskContext
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
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(tokenCol).cast("long").as("n_tokens"))
    val parted =
      (if (numPartitions > 0) base.repartition(numPartitions, col("doc_id"))
       else base.repartition(col("doc_id")))
        .sortWithinPartitions(col("n_tokens").desc, col("doc_id"))

    parted.as[(Long, Long)].mapPartitions { it =>
      val pid = TaskContext.getPartitionId().toLong
      // remaining capacity → open bin ids with exactly that capacity
      val open = new java.util.TreeMap[Long, mutable.ArrayDeque[Long]]()
      var nextBin = 0L
      def newBin(): Long = { val b = nextBin; nextBin += 1; b }
      it.map { case (id, rawN) =>
        val n = math.max(rawN, 0L)
        val bin =
          if (n >= budget) newBin() // dedicated, never reopened
          else {
            // best fit: smallest capacity that still takes n
            val e = open.ceilingEntry(n)
            val b = if (e == null) {
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
            b
          }
        (pid << 32 | bin, id, rawN)
      }
    }.toDF("bin_id", "doc_id", "n_tokens")
  }

  private def put(m: java.util.TreeMap[Long, mutable.ArrayDeque[Long]],
                  cap: Long, bin: Long): Unit =
    if (cap > 0) {
      val q = m.get(cap)
      if (q == null) { val nq = new mutable.ArrayDeque[Long](); nq.append(bin); m.put(cap, nq) }
      else q.append(bin)
    }
}
