package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (binary) column plumbing.
  *
  * Image/audio/video payloads are opaque `binary` columns with typed
  * metadata. The decode step is STUBBED (no codec libraries in this
  * container) behind [[StubDecoder]] — a deterministic fake that parses a
  * fixed header layout — but the Spark-side plumbing is real and is what
  * matters at 100 TB: binary stays columnar until the partition iterator,
  * decode runs batched per partition (`mapPartitions`, the Scala analog of
  * `mapInPandas`), and the output schema is explicit so Catalyst can prune
  * around it.
  */
object MultiModal {

  /** Deterministic fake decoder: reads a 4-byte pseudo-header. A real
    * deployment swaps this object for a codec-backed implementation with
    * the same signature — nothing else changes. The checksum folds modulo
    * 1e9+7 (instead of silent 64-bit wraparound) so the whole stub is
    * restatable in checked-arithmetic SQL — which is what upgraded the q32
    * gate from rows-only to a DuckDB hash-match. */
  object StubDecoder {
    final case class Meta(width: Int, height: Int, nBytes: Long, checksum: Long)
    def decode(payload: Array[Byte]): Meta = {
      val w = if (payload.length > 0) (payload(0) & 0xff) + 1 else 0
      val h = if (payload.length > 1) (payload(1) & 0xff) + 1 else 0
      var ck = 0L
      var i = 0
      while (i < payload.length) {
        ck = (ck * 131 + (payload(i) & 0xff)) % 1000000007L
        i += 1
      }
      Meta(w, h, payload.length.toLong, ck)
    }
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("n_bytes", LongType), StructField("checksum", LongType)))

  /** Attach decoded metadata columns to a DataFrame with a binary column.
    * Batched per partition; the binary payload is dropped from the output
    * unless `keepPayload`. */
  def extractMetadata(df: DataFrame, binaryCol: String,
                      keepPayload: Boolean = false): DataFrame = {
    val inSchema = df.schema
    val binIdx = inSchema.fieldIndex(binaryCol)
    val passThrough = inSchema.fields.zipWithIndex
      .filter { case (f, i) => keepPayload || i != binIdx }
    val outSchema = StructType(passThrough.map(_._1) ++ metaSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](binIdx)
        val m = StubDecoder.decode(if (payload == null) Array.emptyByteArray else payload)
        // Seq[Any] — a mixed-numeric Seq would widen the Ints to Long
        Row.fromSeq(passThrough.map { case (_, i) => r.get(i) }.toSeq ++
          Seq[Any](m.width, m.height, m.nBytes, m.checksum))
      }
    }(enc)
  }

  /** Frame-sampling shape: explode a binary payload into `n` fixed-offset
    * slices (stand-in for video frame extraction) — demonstrates the
    * one-to-many binary op with bounded output rows per input. */
  def sampleSlices(df: DataFrame, binaryCol: String, idCol: String, n: Int = 4): DataFrame =
    df.select(col(idCol), posexplode(expr(
      s"""transform(sequence(0, ${n - 1}),
         |  i -> substring($binaryCol, 1 + i * int(length($binaryCol) / $n),
         |                 int(length($binaryCol) / $n)))""".stripMargin))
      .as(Seq("slice_idx", "payload")))
}
