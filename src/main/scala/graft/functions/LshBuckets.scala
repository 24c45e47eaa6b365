package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All multi-table hyperplane-LSH bucket ids for one vector, in ONE fused
  * pass: returns `array<long>` of length `nTables`, where bucket `t` packs
  * the sign bits of planes `[t*nPlanes, (t+1)*nPlanes)`.
  *
  * Hyperplane component (p, d) is ±1 by the parity of Spark's
  * `xxhash64(p, d, seed)` — the same hash-derived family as the SQL
  * `aggregate(zip_with(...))` formulation it replaced, kept bit-identical
  * via [[XXH64.hashInt]] chaining, so buckets are seed-deterministic with
  * no stored model.
  *
  * Why a custom Expression (tier (b) of the build rules): the SQL version
  * evaluates `nTables·nPlanes` separate `aggregate(zip_with(...))` lambdas,
  * recomputing `xxhash64` per ROW per component even though the sign matrix
  * is row-independent — and at 96 tables the expression tree is megabytes of
  * task binary that falls out of whole-stage codegen. Here the ±1 matrix is
  * computed once per executor (lazily, keyed by dim) and each row is a
  * single `planes×dim` multiply-add loop: ~25k fused ops/row at 96×4×64
  * versus ~25k hash invocations/row interpreted.
  *
  * Null semantics: null array → null; null element → element skipped
  * (treated as 0 contribution — consistent for candidate generation; exact
  * verification downstream decides membership).
  */
case class LshBucketsMultiExpr(child: Expression, nTables: Int, nPlanes: Int,
                               seed: Int) extends UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 63, "nPlanes must be in [1, 63]")
  // the upper bound keeps nTables*nPlanes*dim safely inside Int and the
  // sign matrix inside the companion cache's size cap (r12 review: an
  // unbounded nTables overflowed the matrix size computation)
  require(nTables >= 1 && nTables <= 4096, "nTables must be in [1, 4096]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemType.isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lsh_buckets needs an array<float|double> column, got ${child.dataType.simpleString}")

  /** ±1 sign matrix, laid out [plane][dim] — EXECUTOR-wide cache in the
    * companion (an instance cache ALONE rebuilds per TASK: every task
    * deserializes its own copy of the plan and of the codegen reference
    * object, so a 10⁴-task stage would recompute ~400k hash chains per
    * task). Plane p, component d: +1 iff xxhash64(p, d, seed) is even —
    * the exact chain Spark's `xxhash64(p, d, seed)` literal produces. */
  def signMatrix(dim: Int): Array[Byte] =
    LshBucketsMultiExpr.signMatrix(nTables, nPlanes, seed, dim)

  // per-instance memo over the companion cache: the row kernel runs per
  // ROW, and a boxed-Tuple4 ConcurrentHashMap probe per row is garbage +
  // contention in the hot loop (r12 review). Dim is constant in practice,
  // so this is one branch per row. The (dim, matrix) pair lives in ONE
  // immutable holder written through ONE field — if the instance is ever
  // evaluated from two threads (driver-side interpreted eval of a reused
  // Column), a reader can't observe a torn new-dim/stale-matrix pairing
  // (r12 ADVICE). @transient: never ship matrices with the plan.
  // (no initializer semantics to rely on: @transient fields deserialize to
  // null on executors, so the null check below is the real init path)
  @transient private var memo: (Int, Array[Byte]) = _
  @transient private lazy val isFloatElem: Boolean = elemType.get == FloatType

  /** Row kernel, shared by interpreted eval and codegen (called through an
    * object reference — the loop itself JITs as ordinary JVM code). */
  def buckets(a: ArrayData): ArrayData = {
    val isFloat = isFloatElem
    val dim = a.numElements()
    var m = memo
    if (m == null || m._1 != dim) {
      m = (dim, signMatrix(dim))
      memo = m
    }
    val signs = m._2
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var j = 0
      while (j < nPlanes) {
        val p = t * nPlanes + j
        var acc = 0.0
        var d = 0
        while (d < dim) {
          if (!a.isNullAt(d)) {
            val v = if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)
            acc += signs(p * dim + d) * v
          }
          d += 1
        }
        if (acc > 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = buckets(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshExpr", this, classOf[LshBucketsMultiExpr].getName)
    defineCodeGen(ctx, ev, a => s"$ref.buckets($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketsMultiExpr =
    copy(child = newChild)

  override def prettyName: String = "lsh_buckets_multi"
}

object LshBucketsMultiExpr {
  /** Largest sign matrix the cache will hold (bytes): 96×4 planes × a
    * 4096-dim embedding is ~1.6 MB; anything past this cap is a malformed
    * (ragged) row or a misuse, and allocating-and-caching it forever
    * would be an executor memory leak (r12 review). */
  private val MaxMatrixBytes = 1L << 26 // 64 MB

  /** JVM-wide sign matrices keyed by the full parameterization — shared
    * by every task (and every query) on the executor. Bounded two ways:
    * a per-matrix size cap (above) and a whole-cache entry cap — a seed
    * sweep or ragged-dim stream must not accrete matrices forever; on
    * overflow the cache resets (recompute is a few hundred µs). */
  private val MaxCacheEntries = 64
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Int), Array[Byte]]()

  private[functions] def signMatrix(nTables: Int, nPlanes: Int, seed: Int,
                                    dim: Int): Array[Byte] = {
    // evict BEFORE computeIfAbsent: the CHM contract forbids the mapping
    // function from mutating the map — clear() inside it locks every bin
    // while holding one, a cross-thread deadlock two concurrent new keys
    // can hit (r12 aggregate review). A racing double-clear is harmless.
    if (cache.size >= MaxCacheEntries) cache.clear()
    cache.computeIfAbsent((nTables, nPlanes, seed, dim), { _ =>
      val nP = nTables * nPlanes
      require(nP.toLong * dim <= MaxMatrixBytes,
        s"lsh_buckets_multi: sign matrix $nTables×$nPlanes×dim=$dim exceeds " +
        s"$MaxMatrixBytes bytes — a ragged/malformed embedding row, or a " +
        "parameterization far past any useful LSH configuration")
      val m = new Array[Byte](nP * dim)
      var p = 0
      while (p < nP) {
        var d = 0
        while (d < dim) {
          var h = XXH64.hashInt(p, 42L)
          h = XXH64.hashInt(d, h)
          h = XXH64.hashInt(seed, h)
          m(p * dim + d) = if ((h & 1L) == 0L) 1 else -1
          d += 1
        }
        p += 1
      }
      m
    })
  }
}
