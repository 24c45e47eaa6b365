package graft.functions

import org.apache.spark.sql.Column

/** Column-API entry points for the custom codegen'd expressions — one
  * namespace for all four kernels (they used to be scattered across the
  * expression files; r12 review). */
object functions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Exact quantized dot product (see [[QuantizedDotProduct]]). */
  def dot_q(a: Column, b: Column, scale: Int = 1000): Column =
    ColumnBridge.column(QuantizedDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b), scale))

  /** All multi-table LSH bucket ids in one fused pass (see
    * [[LshBucketsMultiExpr]]). */
  def lsh_buckets_multi(vec: Column, nTables: Int, nPlanes: Int, seed: Int): Column =
    ColumnBridge.column(LshBucketsMultiExpr(
      ColumnBridge.expression(vec), nTables, nPlanes, seed))
}
