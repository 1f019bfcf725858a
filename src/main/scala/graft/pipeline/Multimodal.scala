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
}
