package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Image-bundle container format — the reference's remaining on-disk
  * acquisition path: HIPI-style bundles that pack many small images
  * into few large files so a distributed scan reads sequential blocks
  * instead of millions of tiny files (reference:
  * mr/EmdGenerate.java:117 `ImageBundleInputFormat`; HIPI itself is a
  * dead project, so this is a re-expression of the capability, not the
  * byte format). At 100 TB the bundle IS the point: small-file
  * listing/open overhead dominates naive image lakes, while bundles
  * stream at full scan bandwidth and split by member boundaries.
  *
  * Layout (per bundle):
  *   header  : magic "GHB1" (4 bytes) + member count (int32 BE)
  *   record  : doc_id (int64 BE) + payload length (int32 BE) + payload
  *
  * The parser walks by DECLARED length only (the container-format rule
  * from [[graft.operators.Warc]]: never resync by magic scan — payloads
  * legally contain anything, including "GHB1"). Any inconsistency — bad
  * magic, negative/lying length, truncated record, member-count
  * mismatch — emits one `_corrupt` row and STOPS that bundle: past a
  * length lie there is no trustworthy resync point, and guessing
  * silently poisons the corpus.
  */
object Hib {

  val Magic: Array[Byte] = "GHB1".getBytes("US-ASCII")

  /** Pack `(doc_id, payload)` rows into bundles of `perBundle` members
    * keyed by `doc_id / perBundle`, members ordered by doc_id. One
    * shuffle (groupByKey on the bundle id); bundle sizes are bounded by
    * perBundle * max payload, so executor memory is safe at any corpus
    * scale. Returns `(bundle_id, data BINARY, n_members)`. */
  def bundleWrap(payloads: DataFrame, perBundle: Int = 8): DataFrame = {
    require(perBundle >= 1, s"perBundle=$perBundle")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .groupByKey(_._1 / perBundle)
      .mapGroups { (bundleId, it) =>
        val members = it.toArray.sortBy(_._1)
        val bos = new java.io.ByteArrayOutputStream()
        val out = new java.io.DataOutputStream(bos)
        out.write(Magic)
        out.writeInt(members.length)
        members.foreach { case (id, p) =>
          out.writeLong(id)
          out.writeInt(p.length)
          out.write(p)
        }
        out.flush()
        (bundleId, bos.toByteArray, members.length.toLong)
      }
      .toDF("bundle_id", "data", "n_members")
  }

  /** Parse bundles back to members: `(bundle_id, rec_no, doc_id,
    * payload, corrupt)`. A malformed bundle yields its valid prefix
    * plus ONE corrupt marker row (doc_id/payload NULL) and stops. */
  def parseBundles(spark: SparkSession, bundles: DataFrame): DataFrame = {
    import spark.implicits._
    bundles.select(col("bundle_id").cast("long"), col("data"))
      .as[(Long, Array[Byte])]
      .flatMap { case (bid, data) =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Option[Long], Option[Array[Byte]], Boolean)]
        var rec = 0L
        def corrupt(): Unit = { out += ((bid, rec, None, None, true)) }
        if (data.length < Magic.length + 4 ||
            !Magic.indices.forall(i => data(i) == Magic(i))) corrupt()
        else {
          val in = new java.io.DataInputStream(
            new java.io.ByteArrayInputStream(data, 4, data.length - 4))
          val declared = in.readInt()
          var off = 8
          // a negative member count is a header lie, not an empty
          // bundle — without this lane `n < declared` would skip the
          // walk and an 8-byte bundle declaring -5 members would parse
          // as VALID (round-16 review finding)
          var stopped = declared < 0
          if (stopped) corrupt()
          var n = 0
          while (!stopped && n < declared) {
            // walk by declared length: a record needs 12 header bytes
            // plus its payload INSIDE the bundle, exactly
            if (off + 12 > data.length) { corrupt(); stopped = true }
            else {
              val id = in.readLong()
              val len = in.readInt()
              if (len < 0 || off + 12 + len > data.length) {
                corrupt(); stopped = true
              } else {
                val p = new Array[Byte](len)
                in.readFully(p)
                out += ((bid, rec, Some(id), Some(p), false))
                off += 12 + len
                rec += 1L
                n += 1
              }
            }
          }
          // trailing garbage after the declared member count is a lie
          // about the container, not a parseable record — flag it
          if (!stopped && off != data.length) corrupt()
        }
        out
      }
      .toDF("bundle_id", "rec_no", "doc_id", "payload", "corrupt")
  }
}
