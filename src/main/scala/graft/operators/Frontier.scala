package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Crawl-frontier politeness scheduling — the step between URL policy
  * (UrlOps canonicalization + blocklist, Robots admission) and fetch
  * (Crawl): admit at most `perHostCap` URLs per host, highest priority
  * first, and assign each admitted URL a slot on its host's politeness
  * clock (`fetch_at_ms = slot * delayMs` — one request per delay per
  * host, the standard crawler courtesy contract).
  *
  * Scale shape: real frontiers are Zipf-skewed (the head host can carry
  * a visible fraction of a 100 TB URL set), so per-host selection must
  * NOT be a window (single-task funnel on the mega-host) or a plain
  * collect_list aggregation (unbounded combiner state). It is a typed
  * Aggregator whose buffer is a BOUNDED list of the best `cap`
  * (priority, id) pairs seen so far — partial aggregation applies, so a
  * mega-host costs O(cap) state per map task and O(cap x tasks) merge
  * work. Reference has no frontier (its CrawlReducer consumes a fixed
  * URL list); this is the capability a Common-Crawl-scale acquisition
  * actually needs. */
object Frontier {

  /** Bounded per-key top-cap aggregator over (priority, id), ordered
    * priority DESC then id ASC. The buffer never exceeds 2*cap entries
    * (amortized trim), so map-side partial aggregation state is O(cap)
    * regardless of key skew. */
  private final class TopCap(cap: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    private def better(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
      s.sortWith(better).take(cap)
    def zero: Seq[(Long, Long)] = Seq.empty
    def reduce(b: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] = {
      val nb = b :+ x
      if (nb.length > 2 * cap) trim(nb) else nb
    }
    def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
      trim(a ++ b)
    def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = trim(b)
    def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
    def outputEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Schedule the frontier. Input: one row per candidate URL with a
    * host key, an integer priority, and a unique id. Output, admitted
    * rows only: (url_id, host, priority, slot, fetch_at_ms) where slot
    * is the 0-based politeness position within the host (priority DESC,
    * id ASC) and fetch_at_ms = slot * delayMs. All-integer output. */
  def schedule(urls: DataFrame, perHostCap: Int, delayMs: Long,
               hostCol: String = "host", priCol: String = "priority",
               idCol: String = "url_id"): DataFrame = {
    require(perHostCap > 0 && delayMs >= 0,
      s"frontier: perHostCap $perHostCap must be positive, delayMs $delayMs non-negative")
    val spark = urls.sparkSession
    import spark.implicits._
    urls.select(col(hostCol).cast("string"), col(priCol).cast("long"),
        col(idCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopCap(perHostCap).toColumn.name("top"))
      .toDF("host", "top")
      .select(col("host"), posexplode(col("top")).as(Seq("slot", "c")))
      .select(col("c._2").as("url_id"), col("host"),
        col("c._1").as("priority"), col("slot").cast("long").as("slot"),
        (col("slot") * delayMs).cast("long").as("fetch_at_ms"))
  }
}
