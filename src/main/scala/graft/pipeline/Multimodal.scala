package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata, and per-blob work (decode, feature extract,
  * resize, frame-sample) runs batch-wise inside `mapPartitions` — the Scala
  * analogue of a Pandas-UDF-over-mapInPandas pipeline.
  *
  * The decode step is a STUB: no image/audio codecs exist in this
  * environment, so `decodeStub` derives deterministic fake media properties
  * from the bytes. The Spark-side plumbing — schema, encoders, partition
  * batching, column wiring — is real and tested; swapping `fakeProps` for a
  * javax.imageio / ffmpeg call changes nothing structurally.
  */
object Multimodal {

  final case class Blob(doc_id: Long, blob: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      content_md5: String,
      width: Int,      // stub: derived from byte length
      height: Int,     // stub: derived from byte length
      n_frames: Int)   // stub: derived from byte length

  /** Deterministic fake of a media header parse. REPLACE with a real
    * decoder when codecs are available; everything downstream is agnostic.
    */
  private def fakeProps(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    (1 + n % 64, 1 + (n / 64) % 64, n % 7)
  }

  /** Batch feature extraction over the binary column. Runs once per
    * partition; the MessageDigest is allocated per partition, not per row —
    * the same amortisation a Pandas UDF gets from batching.
    */
  def extractFeatures(blobs: Dataset[Blob]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    blobs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { b =>
        md.reset()
        val hex = md.digest(b.blob).map("%02x".format(_)).mkString
        val (w, h, f) = fakeProps(b.blob)
        MediaFeatures(b.doc_id, b.blob.length.toLong, hex, w, h, f)
      }
    }
  }

  /** Column-level wiring: attach a binary payload column + extracted
    * features to any DataFrame carrying (id, binary).
    */
  def features(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val ds = df.select(col(idCol).cast("long").as("doc_id"),
      col(blobCol).as("blob")).as[Blob](Encoders.product[Blob])
    extractFeatures(ds).toDF()
  }

  /** Stub resize: real implementation would decode, scale, re-encode inside
    * mapPartitions; the stub proves the schema contract (binary in →
    * binary out + updated metadata).
    */
  def resizeStub(blobs: Dataset[Blob], maxDim: Int): Dataset[Blob] = {
    implicit val enc = Encoders.product[Blob]
    blobs.mapPartitions(_.map(b => b.copy(blob = b.blob.take(maxDim * maxDim))))
  }

  /** One sampled frame of a video blob: typed metadata + the frame payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, ts_ms: Long,
      frame: Array[Byte])

  /** Frame sampling — the row-EXPANDING multimodal shape (one video blob →
    * `everyNth`-strided frames). The decode is stubbed (fixed-size byte
    * slices stand in for decoded frames; `fakeProps` supplies the frame
    * count), but the batch contract is the real one: flatMap inside ONE
    * mapPartitions pass, codec state amortised per partition, output rows
    * carry (id, frame_idx, timestamp, payload) so downstream operators
    * (dedup, embedding, filtering) treat frames as first-class rows.
    */
  def frameSampleStub(blobs: Dataset[Blob], everyNth: Int,
      frameMs: Long = 40L): Dataset[Frame] = {
    require(everyNth > 0, "everyNth must be positive")
    implicit val enc = Encoders.product[Frame]
    blobs.mapPartitions { it =>
      // real impl: open the codec once per partition, seek per frame
      it.flatMap { b =>
        val (_, _, nFrames) = fakeProps(b.blob)
        val sliceLen = math.max(1, b.blob.length / math.max(nFrames, 1))
        (0 until nFrames by everyNth).iterator.map { i =>
          Frame(b.doc_id, i, i * frameMs,
            b.blob.slice(i * sliceLen, (i + 1) * sliceLen))
        }
      }
    }
  }
}
