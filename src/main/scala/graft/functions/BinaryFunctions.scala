package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multimodal-column primitives (north-star scope): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata derived
  * alongside. Everything here is a per-row Catalyst expression — content
  * inspection (size, container sniff, fingerprint, chunking) without
  * decoding, so a 100 TB media table is scanned once with no shuffle and
  * full parquet pushdown on the metadata columns. Actual codec work lives
  * behind [[graft.operators.Multimodal]]'s pluggable decoder.
  */
object BinaryFunctions {

  /** Payload size in bytes (`length` counts bytes on BinaryType). */
  def byteSize(bin: Column): Column = length(bin)

  /** Container magic numbers (format → hex prefix). Public, stable
    * signatures: JPEG SOI, PNG, GIF8, %PDF, RIFF (wav/avi), ZIP local
    * header, MP3 ID3. */
  val magicPrefixes: Seq[(String, String)] = Seq(
    "jpeg" -> "FFD8FF",
    "png"  -> "89504E47",
    "gif"  -> "47494638",
    "pdf"  -> "25504446",
    "riff" -> "52494646",
    "zip"  -> "504B0304",
    "mp3"  -> "494433")

  /** Container sniff by magic prefix; "unknown" when nothing matches.
    * Longest prefix is 4 bytes — one 4-byte slice feeds every branch. */
  def sniffFormat(bin: Column): Column = {
    val head = hex(substring(bin, 1, 4))
    magicPrefixes.foldRight(lit("unknown")) { case ((fmt, prefix), acc) =>
      when(substring(head, 1, prefix.length) === prefix, lit(fmt)).otherwise(acc)
    }
  }

  /** Content fingerprint over the hex rendering (md5-of-hex rather than
    * md5-of-bytes so any ANSI-SQL oracle can reproduce it — same rationale
    * as the minhash family's md5 basis). */
  def fingerprint(bin: Column): Column = md5(hex(bin))

  /** Number of `chunkBytes`-sized transport chunks. */
  def chunkCount(bin: Column, chunkBytes: Int): Column =
    ceil(byteSize(bin).cast("double") / chunkBytes).cast("int")

  /** Fixed-size binary chunks (last one ragged) — the batch shape a
    * feature-extraction or upload stage consumes. Array stays per-row;
    * `posexplode` it to fan out to per-chunk rows. */
  def chunk(bin: Column, chunkBytes: Int): Column =
    transform(
      sequence(lit(0), chunkCount(bin, chunkBytes) - 1),
      i => bin.substr(i * chunkBytes + 1, lit(chunkBytes)))
}
