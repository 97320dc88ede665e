package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed bag-of-ngrams linear classifier inference — the fastText
  * architecture (public knowledge: Joulin et al. 2016) that production
  * pipelines run as the cheap document-quality model: features are
  * unigrams + adjacent bigrams, hashed into a fixed bucket space, and
  * the document score is the sum of per-bucket weights. Inference is
  * ONE broadcast (the weight vector) + one map pass — no shuffle, the
  * same shape at 500 docs and at 100 TB.
  *
  * Weights here are md5-derived INTEGERS in [-1000, 1000] (a stand-in
  * model both engines can rebuild from the bucket id alone — the
  * fixture-derivation contract), and the score is a plain long sum, so
  * classification is engine-exact with no float anywhere; a real
  * trained model drops in by replacing [[hashWeights]] with a loaded
  * array, leaving the execution plan untouched.
  */
object Classifier {

  /** First 32 bits of md5, as an unsigned long — the JVM twin of the
    * oracle's `('0x' || substr(md5(s), 1, 8))::BIGINT` (the first 8 hex
    * chars of the digest are its first 4 bytes, big-endian). */
  private[operators] def md5Bits32Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Integer.toUnsignedLong(java.nio.ByteBuffer.wrap(d).getInt)
  }

  /** The md5-derived weight table: bucket b -> integer in [-1000, 1000]. */
  def hashWeights(buckets: Int): Array[Long] =
    Array.tabulate(buckets)(b => md5Bits32Local("ftw:" + b) % 2001L - 1000L)

  /** `(doc_id, score, n_features, keep)` — score the long weight sum
    * over hashed unigram+bigram features (duplicate features count each
    * occurrence, the bag semantics), keep = score >= 0. */
  def scoreDocs(spark: SparkSession, docs: DataFrame, buckets: Int = 4096,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import spark.implicits._
    require(buckets > 0, s"scoreDocs: buckets must be positive, got $buckets")
    val bw = spark.sparkContext.broadcast(hashWeights(buckets))
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions { rows =>
        val wt = bw.value
        // vocab is tiny relative to token instances — memoize the hash
        val cache = new java.util.HashMap[String, Int]()
        def bucket(f: String): Int = {
          var b = cache.getOrDefault(f, -1)
          if (b < 0) {
            b = (md5Bits32Local("ft:" + f) % buckets).toInt
            cache.put(f, b)
          }
          b
        }
        rows.map { case (id, text) =>
          // -1 limit: trailing empty tokens survive, matching both
          // Catalyst split and DuckDB string_split
          val t = text.split(" ", -1)
          var s = 0L
          var i = 0
          while (i < t.length) { s += wt(bucket(t(i))); i += 1 }
          i = 0
          while (i < t.length - 1) { s += wt(bucket(t(i) + " " + t(i + 1))); i += 1 }
          (id, s, (2 * t.length - 1).toLong, s >= 0L)
        }
      }
      .toDF("doc_id", "score", "n_features", "keep")
  }
}
