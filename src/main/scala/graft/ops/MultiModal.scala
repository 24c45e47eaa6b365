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

  /** Real container sniffing (r11 verdict #6): identify PNG / JPEG / WAV
    * payloads by magic number and extract their native metadata — PNG IHDR
    * width/height (big-endian, RFC 2083 §4.1.1 layout), JPEG SOFn
    * frame dimensions (marker scan, ITU T.81 §B.2.2), WAV `fmt ` chunk
    * sample-rate/channels/bits (RIFF little-endian chunks). Only the first
    * KB is examined; corrupt or truncated payloads degrade to
    * `valid = false` with NULL fields instead of throwing — a 100 TB crawl
    * ALWAYS contains garbage bytes and one bad row must not kill a stage.
    * Cites reference python/docs feature matrix (binary columns are opaque
    * there; the sniffer is the Spark-side value-add). */
  object MediaSniffer {
    /** None fields = not applicable for the format OR unreadable. */
    final case class Meta(format: String, width: Option[Int], height: Option[Int],
                          sampleRate: Option[Int], channels: Option[Int],
                          bitsPerSample: Option[Int], nBytes: Long, valid: Boolean)

    private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    /** Bytes examined. PNG (IHDR-first) and WAV (fmt-first in practice)
      * resolve within tens of bytes, but a real-world JPEG routinely
      * carries a 10–64 KB EXIF APP1 segment BEFORE its SOF frame header —
      * the old 1 KB window declared every such photo `valid=false` (r12
      * review). 64 KiB covers any single APPn segment (their length field
      * is 16-bit); a SOF beyond several such segments still degrades to
      * valid=false rather than throwing. The window is a PARSE BOUND, not
      * a copy — sniffing reads the payload in place. */
    val SniffWindow = 64 * 1024

    private def u8(p: Array[Byte], i: Int): Int = p(i) & 0xff
    private def be16(p: Array[Byte], i: Int): Int = (u8(p, i) << 8) | u8(p, i + 1)
    private def be32(p: Array[Byte], i: Int): Long =
      (u8(p, i).toLong << 24) | (u8(p, i + 1) << 16) | (u8(p, i + 2) << 8) | u8(p, i + 3)
    private def le16(p: Array[Byte], i: Int): Int = u8(p, i) | (u8(p, i + 1) << 8)
    private def le32(p: Array[Byte], i: Int): Long =
      u8(p, i).toLong | (u8(p, i + 1).toLong << 8) | (u8(p, i + 2).toLong << 16) | (u8(p, i + 3).toLong << 24)
    private def tag(p: Array[Byte], i: Int, s: String): Boolean =
      p.length >= i + s.length && s.indices.forall(j => u8(p, i + j) == s.charAt(j))

    def sniff(payload: Array[Byte]): Meta = {
      val p0 = if (payload == null) Array.emptyByteArray else payload
      val n = p0.length.toLong
      // parse bound: the old code COPIED the first KB per row; a bound on
      // the scan index does the same job allocation-free
      val p = p0
      val lim = math.min(p0.length, SniffWindow)
      def invalid(fmt: String) = Meta(fmt, None, None, None, None, None, n, valid = false)
      if (p.length >= 8 && p.take(8).sameElements(PngSig)) {
        // PNG: sig, then the IHDR chunk MUST be first — [len=13]["IHDR"]
        // [width BE32][height BE32][bitdepth][colortype]... CRC unchecked
        // (a sniffer reads headers, it does not verify payloads).
        if (p.length >= 24 && be32(p, 8) == 13L && tag(p, 12, "IHDR")) {
          val w = be32(p, 16); val h = be32(p, 20)
          // PNG dims are 31-bit positive; 0 or oversized ⇒ corrupt header
          if (w > 0 && w <= Int.MaxValue && h > 0 && h <= Int.MaxValue)
            Meta("png", Some(w.toInt), Some(h.toInt), None, None, None, n, valid = true)
          else invalid("png")
        } else invalid("png")
      } else if (p.length >= 2 && u8(p, 0) == 0xff && u8(p, 1) == 0xd8) {
        // JPEG: scan FF-marker segments for a frame header (SOF0–15 minus
        // DHT C4 / JPG C8 / DAC CC): [len BE16][precision][height][width]
        var i = 2
        var out: Option[Meta] = None
        var broken = false
        while (out.isEmpty && !broken && i + 3 < lim) {
          if (u8(p, i) != 0xff) broken = true
          else {
            val m = u8(p, i + 1)
            if (m == 0xff) i += 1                      // fill byte
            else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
            else if (m == 0xd9 || m == 0xda) broken = true // EOI / scan start: no SOF seen
            else {
              val segLen = be16(p, i + 2)
              if (segLen < 2) broken = true
              else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
                if (i + 8 < lim) {
                  val h = be16(p, i + 5); val w = be16(p, i + 7)
                  out = Some(
                    if (w > 0 && h > 0)
                      Meta("jpeg", Some(w), Some(h), None, None, None, n, valid = true)
                    else invalid("jpeg"))
                } else broken = true
              } else i += 2 + segLen
            }
          }
        }
        out.getOrElse(invalid("jpeg"))
      } else if (tag(p, 0, "RIFF") && tag(p, 8, "WAVE")) {
        // WAV: walk RIFF chunks for `fmt ` — [id][size LE32] then
        // [audioFormat LE16][channels LE16][sampleRate LE32][byteRate]
        // [blockAlign][bitsPerSample LE16]
        var i = 12
        var out: Option[Meta] = None
        while (out.isEmpty && i + 8 <= lim) {
          val size = le32(p, i + 4)
          if (tag(p, i, "fmt ") && size >= 16 && i + 8 + 16 <= lim) {
            val ch = le16(p, i + 10); val rate = le32(p, i + 12)
            val bits = le16(p, i + 22)
            out = Some(
              if (ch > 0 && rate > 0 && rate <= Int.MaxValue)
                Meta("wav", None, None, Some(rate.toInt), Some(ch), Some(bits), n, valid = true)
              else invalid("wav"))
          } else if (size < 0 || size > Int.MaxValue - 9) i = lim // corrupt size
          else i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
        }
        out.getOrElse(invalid("wav"))
      } else invalid("unknown")
    }
  }

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType), StructField("width", IntegerType),
    StructField("height", IntegerType), StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType), StructField("bits_per_sample", IntegerType),
    StructField("n_bytes", LongType), StructField("valid", IntegerType)))

  /** Attach sniffed container metadata ([[MediaSniffer]]) to a DataFrame
    * with a binary column. Same executor-batched shape as
    * [[extractMetadata]]; `valid` is emitted as 0/1 INT (oracle-hashable). */
  def sniffMetadata(df: DataFrame, binaryCol: String,
                    keepPayload: Boolean = false): DataFrame = {
    val inSchema = df.schema
    val binIdx = inSchema.fieldIndex(binaryCol)
    val passThrough = inSchema.fields.zipWithIndex
      .filter { case (_, i) => keepPayload || i != binIdx }
    val outSchema = StructType(passThrough.map(_._1) ++ mediaMetaSchema.fields)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = MediaSniffer.sniff(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(passThrough.map { case (_, i) => r.get(i) }.toSeq ++
          Seq[Any](m.format, m.width.orNull, m.height.orNull,
            m.sampleRate.orNull, m.channels.orNull, m.bitsPerSample.orNull,
            m.nBytes, if (m.valid) 1 else 0))
      }
    }(enc)
  }

  /** Deterministic real-layout media fixtures keyed by an id — the q74
    * gate's payload source AND the spec's: the byte layouts are true PNG /
    * JPEG / WAV container heads, so sniffing them exercises the production
    * offsets while the expected metadata stays closed-form in the id (the
    * DuckDB oracle predicts it without parsing binary). */
  object MediaSynth {
    /** Fixed whole-file sizes (header-only containers, zero-length data). */
    val PngBytes = 33; val JpegBytes = 41; val WavBytes = 44

    private def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    private def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    private def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

    def png(w: Int, h: Int): Array[Byte] =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
        Array[Byte](8, 6, 0, 0, 0) ++ be32(0) // bitdepth/color/comp/filter/interlace + unchecked CRC

    def jpeg(w: Int, h: Int): Array[Byte] =
      Array[Byte](0xff.toByte, 0xd8.toByte) ++                       // SOI
        Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++         // APP0 JFIF
        "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0) ++
        Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++         // SOF0
        Array[Byte](8) ++ be16(h) ++ be16(w) ++
        Array[Byte](3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0) ++
        Array[Byte](0xff.toByte, 0xd9.toByte)                        // EOI

    def wav(rate: Int, channels: Int, bits: Int): Array[Byte] = {
      val blockAlign = channels * bits / 8
      "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
        le32(rate) ++ le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(bits) ++
        "data".getBytes ++ le32(0)
    }

    /** id → payload, cycling the three formats plus a truncated-PNG corrupt
      * case. Formulas mirrored verbatim in the q74 oracle SQL. */
    def forId(id: Long): Array[Byte] = (id % 4) match {
      case 0 => png((id % 500).toInt + 1, (id / 7 % 500).toInt + 1)
      case 1 => jpeg((id % 300).toInt + 1, (id / 3 % 300).toInt + 1)
      case 2 => wav(8000 + (id % 8).toInt * 4000, (id % 2).toInt + 1, 16)
      case _ => java.util.Arrays.copyOf(png(100, 100), (id % 20).toInt) // truncated
    }

    /** df + a `payload` binary column derived from `idCol`. */
    def attach(df: DataFrame, idCol: String): DataFrame = {
      val inSchema = df.schema
      val idIdx = inSchema.fieldIndex(idCol)
      val outSchema = StructType(inSchema.fields :+ StructField("payload", BinaryType))
      val enc = org.apache.spark.sql.Encoders.row(outSchema)
      df.mapPartitions { rows =>
        rows.map(r => Row.fromSeq(r.toSeq :+ forId(r.getLong(idIdx))))
      }(enc)
    }
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
