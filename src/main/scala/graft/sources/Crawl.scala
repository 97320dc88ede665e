package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP image acquisition — the network half of the reference's
  * generate pipeline, re-expressed as an executor-side fetch stage over
  * a URL table.
  *
  * Reference behavior (`/root/reference/src/com/iojin/melody/mr/generate/CrawlReducer.java:96-201`):
  * each reducer fetches its URL list SEQUENTIALLY with a 5 s connect
  * timeout, 5 s socket timeout, a 10 s per-request total cap
  * (`future.get(TIMEOUT_TASK_SEC)`), a fixed `Thread.sleep(freq)`
  * throttle between requests (default 1000 ms — politeness toward the
  * crawled hosts), and skip-on-failure for every failure class (bad
  * URL, timeout, reset, unknown host, damaged image, ...) — a fetch
  * error never fails the job.
  *
  * Spark-first re-expression: the URL table partitions across
  * executors; each PARTITION is the reference's reducer — a sequential
  * throttled fetch loop in one `mapPartitions` pass emitting
  * (id, url, status, content_type, n_bytes, payload, err) rows.
  * Failures come back as rows with `err` set and NULL payload (the
  * skip-on-failure contract made filterable instead of logged), so the
  * downstream decode path ([[graft.operators.Multimodal]], the same
  * payload contract as [[BinaryScan]]) composes unchanged:
  * `fetch(urls) |> filter(err IS NULL) |> imageRedHist`.
  *
  * 100 TB shape: acquisition work is proportional to the URL table and
  * embarrassingly partition-parallel; the throttle bounds per-host
  * politeness per task exactly as the reference's per-reducer sleep
  * did (partition the URL table by host to make the bound per-host).
  * Nothing collects; payloads stay in executor rows.
  *
  * Divergence from the reference, by design: a `maxBytes` response cap
  * (the reference reads unboundedly into memory; a row-sized cap is
  * the same reject/degrade-per-row contract the decoders follow) and
  * failures as typed rows rather than stdout logs.
  */
object Crawl {

  /** Fetch every (id, url) row. Sequential within a partition with
    * `throttleMs` sleep BETWEEN requests; per-request total time is
    * capped by `taskTimeoutMs` via a single worker thread per
    * partition (the reference's `future.get(10 s)`), on top of the
    * connect/read socket timeouts. Output columns:
    * (doc_id, url, status, content_type, n_bytes, payload, err) —
    * `err` NULL on success, payload NULL on failure, status -1 when no
    * HTTP status was reached. */
  def fetch(urls: DataFrame,
            connectTimeoutMs: Int = 5000,
            readTimeoutMs: Int = 5000,
            taskTimeoutMs: Int = 10000,
            throttleMs: Long = 1000L,
            maxBytes: Int = 16 << 20,
            idCol: String = "doc_id",
            urlCol: String = "url"): DataFrame = {
    require(connectTimeoutMs > 0 && readTimeoutMs > 0 && taskTimeoutMs > 0,
      "timeouts must be positive")
    require(throttleMs >= 0, s"throttleMs must be >= 0, got $throttleMs")
    val spark = urls.sparkSession
    import spark.implicits._
    urls.select(col(idCol).cast("long"), col(urlCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // one worker thread per partition = the reference's
        // newFixedThreadPool(1); daemon so a failed task never pins the
        // executor JVM
        lazy val worker = java.util.concurrent.Executors.newSingleThreadExecutor(
          (r: Runnable) => {
            val t = new Thread(r, "graft-crawl-fetch")
            t.setDaemon(true)
            t
          })
        var started = false
        val out = it.map { case (id, url) =>
          if (started && throttleMs > 0) Thread.sleep(throttleMs)
          started = true
          fetchOne(worker, id, url, connectTimeoutMs, readTimeoutMs,
            taskTimeoutMs, maxBytes)
        }
        new Iterator[(Long, String, Int, String, Long, Array[Byte], String)] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && started) worker.shutdownNow()
            h
          }
          def next() = out.next()
        }
      }
      .toDF("doc_id", "url", "status", "content_type", "n_bytes",
        "payload", "err")
  }

  private def fetchOne(worker: java.util.concurrent.ExecutorService,
                       id: Long, url: String,
                       connectTimeoutMs: Int, readTimeoutMs: Int,
                       taskTimeoutMs: Int, maxBytes: Int):
      (Long, String, Int, String, Long, Array[Byte], String) = {
    def fail(status: Int, msg: String) =
      (id, url, status, null: String, 0L, null: Array[Byte], msg)
    val task = new java.util.concurrent.Callable[
        (Long, String, Int, String, Long, Array[Byte], String)] {
      def call() = {
        var conn: java.net.HttpURLConnection = null
        try {
          val u = java.net.URI.create(url).toURL
          conn = u.openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setConnectTimeout(connectTimeoutMs)
          conn.setReadTimeout(readTimeoutMs)
          conn.setRequestMethod("GET")
          val status = conn.getResponseCode
          if (status != 200) fail(status, s"http status $status")
          else {
            val ct = Option(conn.getContentType).getOrElse("")
            val in = conn.getInputStream
            try {
              val buf = new java.io.ByteArrayOutputStream()
              val chunk = new Array[Byte](8192)
              var n = in.read(chunk)
              var over = false
              while (n >= 0 && !over) {
                buf.write(chunk, 0, n)
                if (buf.size > maxBytes) over = true else n = in.read(chunk)
              }
              if (over) fail(status, s"response exceeds $maxBytes bytes")
              else {
                val bytes = buf.toByteArray
                (id, url, status, ct, bytes.length.toLong, bytes,
                  null: String)
              }
            } finally in.close()
          }
        } catch {
          // the reference's exception ladder collapses to one skip row:
          // every failure class (illegal url, timeout, reset, unknown
          // host, no response, IO) lands here with its message
          case e: Exception =>
            fail(-1, s"${e.getClass.getSimpleName}: ${e.getMessage}")
        } finally {
          if (conn != null) conn.disconnect()
        }
      }
    }
    val future = worker.submit(task)
    try future.get(taskTimeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        future.cancel(true)
        fail(-1, s"request exceeded task timeout ${taskTimeoutMs} ms")
      case e: java.util.concurrent.ExecutionException =>
        fail(-1, s"${e.getCause.getClass.getSimpleName}: ${e.getCause.getMessage}")
    }
  }
}
