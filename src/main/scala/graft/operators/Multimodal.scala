package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

import graft.functions.BinaryFunctions

/** Decode-stage plumbing for multimodal columns (north-star scope): the
  * part of media processing Catalyst cannot express — running a codec
  * over raw bytes — as a typed `mapPartitions` stage (the documented
  * last-resort tier for genuine per-partition imperative logic).
  *
  * The codec is pluggable and SHIPPED AS A STUB: real image/audio
  * libraries are not available in this environment, so [[HeaderCodec]]
  * deterministically parses dimensions that the test fixture embeds in
  * the payload header. The Spark-side contract — schema, partition-local
  * batch loop, zero shuffle, typed output — is the real, tested part; a
  * production deployment swaps in a JNI/ImageIO-backed [[MediaCodec]]
  * without touching the plan.
  */
object Multimodal {

  /** Typed decode output: media metadata per document. */
  final case class MediaMeta(doc_id: Long, format: String, byte_size: Int,
      width: Int, height: Int, aspect: Double)

  /** A codec turns raw payload bytes into (width, height). Implementations
    * must be Serializable (shipped to executors once, reused per
    * partition). */
  trait MediaCodec extends Serializable {
    def decode(bytes: Array[Byte]): (Int, Int)
  }

  /** STUB CODEC — stands in for an image library: reads the 4-ASCII-digit
    * width/height the fixture writes at payload bytes 4–11 (after the
    * 4-byte magic block). Deterministic, so the decode stage is fully
    * oracle-checkable end to end. */
  object HeaderCodec extends MediaCodec {
    def decode(bytes: Array[Byte]): (Int, Int) = {
      def ascii4(off: Int): Int =
        if (bytes.length < off + 4) 0
        else new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII).toInt
      (ascii4(4), ascii4(8))
    }
  }

  /** The decode stage: one pass, partition-local, no shuffle. Format is
    * sniffed from magic bytes on the JVM side (same table as
    * [[graft.functions.BinaryFunctions.sniffFormat]]); dimensions come
    * from the codec. */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String,
      codec: MediaCodec = HeaderCodec): Dataset[MediaMeta] = {
    val input = df.select(df(idCol).cast("long"), df(binCol))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    input.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val hexHead = bytes.take(4).map("%02X".format(_)).mkString
        val format = BinaryFunctions.magicPrefixes
          .collectFirst { case (f, p) if hexHead.startsWith(p) => f }
          .getOrElse("unknown")
        val (w, h) = codec.decode(bytes)
        // floor-at-6-decimals, not round: floor is exact in IEEE double,
        // so any SQL oracle reproduces it bit-for-bit.
        MediaMeta(id, format, bytes.length, w, h,
          if (h == 0) 0.0 else math.floor(w.toDouble * 1e6 / h) / 1e6)
      }
    }(Encoders.product[MediaMeta])
  }
}
