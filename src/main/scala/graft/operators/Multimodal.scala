package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads with typed metadata,
  * batch decode / feature-extraction over mapPartitions.
  *
  * The reference's image pipeline (mr/EmdGenerate.java:109-172, HIPI/Lire)
  * reduces to: binary in, per-item features out. Real image/audio codecs
  * are not available in this container, so the DECODE STEP IS A STUB — a
  * deterministic fake (byte histogram + entropy standing in for pixel
  * statistics). Everything around it is real and tested: the binary
  * column schema, partition-batched execution (the shape a JNI/codec
  * call-out needs), feature schema, and downstream joins. Swapping the
  * stub for a real codec changes only `decodeFeatures`.
  */
object Multimodal {

  /** Attach a binary payload column + metadata struct to the documents
    * table (payload = utf-8 bytes of text; stands in for an image/audio
    * blob column read via spark.read.format("binaryFile")). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
      encode(col("text"), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"),
        lit("text/plain").as("mime")))

  /** === STUB DECODER ===
    * Deterministic fake feature extraction: 8-bucket byte histogram +
    * Shannon entropy. A real implementation would decode the image/audio
    * here (per-partition batching keeps codec init out of the per-row
    * path). */
  private def decodeFeatures(payload: Array[Byte]): (Array[Double], Double) = {
    val hist = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) >> 5) += 1.0
      i += 1
    }
    val n = payload.length.toDouble
    var entropy = 0.0
    var b = 0
    while (b < 8) {
      if (hist(b) > 0) {
        val p = hist(b) / n
        entropy -= p * math.log(p) / math.log(2)
      }
      hist(b) = hist(b) / n
      b += 1
    }
    (hist, entropy)
  }

  /** Batch feature extraction: one decoder "session" per partition, rows
    * processed in sequence (the batch shape a real codec needs). Output:
    * (doc_id, n_bytes, features ARRAY<DOUBLE>[8], entropy). */
  def extractFeatures(spark: SparkSession, withPayloadDf: DataFrame): DataFrame = {
    import spark.implicits._
    withPayloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder init would happen here, once per partition
        it.map { case (id, payload) =>
          val (hist, entropy) = decodeFeatures(payload)
          (id, payload.length.toLong, hist, entropy)
        }
      }
      .toDF("doc_id", "n_bytes", "features", "entropy")
  }

  /** "Frame sampling" stub for video-like payloads: split the payload into
    * fixed-size blocks, keep every `stride`-th block's fingerprint.
    * Output: (doc_id, frame_idx, frame_hash). */
  def frameSample(spark: SparkSession, withPayloadDf: DataFrame,
                  blockSize: Int = 64, stride: Int = 4): DataFrame = {
    import spark.implicits._
    withPayloadDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val nBlocks = math.max(1, payload.length / blockSize)
        (0 until nBlocks by stride).map { f =>
          val from = f * blockSize
          val until = math.min(from + blockSize, payload.length)
          var h = 1125899906842597L
          var i = from
          while (i < until) { h = 31 * h + payload(i); i += 1 }
          (id, f, h)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_hash")
  }
}
