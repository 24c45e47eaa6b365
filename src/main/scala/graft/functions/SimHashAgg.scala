package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash as ONE typed imperative aggregate.
  *
  * Input: a LONG feature hash per row (e.g. `xxhash64(shingle)`). The buffer
  * is a single `Array[Int](64)` of signed bit counters updated in one pass —
  * versus the declarative formulation's 64 separate conditional-sum
  * aggregate buffers per group, this is one buffer, one branch-free update
  * loop, and a 256-byte shuffle payload per group. This is the
  * `TypedImperativeAggregate` case from SURVEY §7 ("where custom aggregates
  * earn their keep").
  *
  * eval: bit i of the result is set when counter i is positive — identical
  * math to the declarative version, so results are bit-for-bit the same.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  // fail at ANALYSIS, not as a per-row ClassCastException inside executor
  // tasks on a 100 TB aggregation
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash_agg needs a BIGINT feature-hash column (use xxhash64), got " +
        child.dataType.simpleString)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        // +1 when bit set, -1 when clear, branch-free
        buf(i) += (((h >>> i) & 1L).toInt << 1) - 1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var h = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) h |= (1L << i)
      i += 1
    }
    h
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "simhash_agg"
}

object SimHashAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate a LONG feature-hash column into a 64-bit SimHash. */
  def simhash_agg(featureHash: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(featureHash)).toAggregateExpression())
}
