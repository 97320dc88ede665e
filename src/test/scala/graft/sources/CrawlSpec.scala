package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closes the reference's network-acquisition surface sandbox-honestly:
  * a loopback `com.sun.net.httpserver` serves the PPM fixture corpus
  * and Crawl.fetch must deliver payloads byte-identical to the local
  * path, so fetch -> decode -> histogram equals the q_binary_scan
  * pipeline exactly. Timeout, throttle, and skip-on-failure semantics
  * (CrawlReducer.java:96-201) are pinned directly. */
class CrawlSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Loopback server for the duration of one test body. Handlers:
    * (path prefix -> (status, contentType, body | sleepMs)). */
  private def withServer[T](payloads: Map[Long, Array[Byte]])(
      body: (Int => Unit, Int) => T): T = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/img/", { ex =>
      hits.incrementAndGet()
      val name = ex.getRequestURI.getPath.stripPrefix("/img/")
      val id = name.stripSuffix(".ppm").toLong
      payloads.get(id) match {
        case Some(bytes) =>
          ex.getResponseHeaders.set("Content-Type", "image/x-portable-pixmap")
          ex.sendResponseHeaders(200, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        case None =>
          ex.sendResponseHeaders(404, -1L)
      }
      ex.close()
    })
    server.createContext("/slow", { ex =>
      hits.incrementAndGet()
      Thread.sleep(3000L)
      ex.sendResponseHeaders(200, -1L)
      ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    try body(_ => (), server.getAddress.getPort)
    finally server.stop(0)
  }

  private def fixturePayloads(n: Int): Map[Long, Array[Byte]] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Fixtures
      .documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < n)
    graft.operators.Multimodal.withImagePayload(docs)
      .select(col("doc_id"), col("payload")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
  }

  test("loopback crawl == local binary-scan path: byte-identical payloads, identical histograms") {
    import spark.implicits._
    val payloads = fixturePayloads(24)
    withServer(payloads) { (_, port) =>
      val urls = payloads.keys.toSeq.sorted
        .map(id => (id, s"http://127.0.0.1:$port/img/$id.ppm"))
        .toDF("doc_id", "url")
      val fetched = Crawl.fetch(urls, connectTimeoutMs = 2000,
        readTimeoutMs = 2000, taskTimeoutMs = 5000, throttleMs = 0L)
        .persist()
      val rows = fetched.collect()
      assert(rows.length == payloads.size)
      assert(rows.forall(_.isNullAt(6)), "no fetch may fail")
      assert(rows.forall(_.getString(3) == "image/x-portable-pixmap"))
      // byte-identical to the local payloads
      rows.foreach { r =>
        assert(java.util.Arrays.equals(
          r.getAs[Array[Byte]](5), payloads(r.getLong(0))),
          s"payload bytes differ for doc ${r.getLong(0)}")
      }
      // decode path composes unchanged: crawl histograms == local ones
      def hset(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Multimodal.imageRedHist(spark, df)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1),
            math.round(r.getDouble(2) * 1e6))).toSet
      val viaCrawl = hset(fetched.filter(col("err").isNull)
        .select(col("doc_id"), col("payload")))
      val viaLocal = hset(payloads.toSeq.toDF("doc_id", "payload"))
      assert(viaCrawl == viaLocal)
      fetched.unpersist()
    }
  }

  test("skip-on-failure: 404, unreachable port, bad URL, and slow reads become err rows") {
    import spark.implicits._
    val payloads = fixturePayloads(2)
    withServer(payloads) { (_, port) =>
      val urls = Seq(
        (0L, s"http://127.0.0.1:$port/img/0.ppm"),      // ok
        (90L, s"http://127.0.0.1:$port/img/90.ppm"),    // 404
        (91L, s"http://127.0.0.1:1/img/0.ppm"),         // connection refused
        (92L, "http://no-such-host.invalid/x.ppm"),     // unknown host
        (93L, "not a url at all"),                      // illegal url
        (94L, s"http://127.0.0.1:$port/slow")           // read timeout
      ).toDF("doc_id", "url")
      val got = Crawl.fetch(urls, connectTimeoutMs = 500,
        readTimeoutMs = 500, taskTimeoutMs = 2000, throttleMs = 0L)
        .collect().map(r => r.getLong(0) ->
          (r.getInt(2), Option(r.getString(6)))).toMap
      assert(got(0L)._1 == 200 && got(0L)._2.isEmpty)
      assert(got(90L)._1 == 404 && got(90L)._2.nonEmpty)
      Seq(91L, 92L, 93L, 94L).foreach { id =>
        assert(got(id)._2.nonEmpty, s"url $id must carry an err")
      }
      // the job completed: failure is per-row, never job-fatal
      assert(got.size == 6)
    }
  }

  test("per-request task-timeout cap fires even when socket timeouts would not") {
    import spark.implicits._
    withServer(Map.empty) { (_, port) =>
      // read timeout 5 s would tolerate the 3 s handler sleep; the 1 s
      // task cap (the reference's future.get(10 s)) must fire first
      val urls = Seq((1L, s"http://127.0.0.1:$port/slow")).toDF("doc_id", "url")
      val t0 = System.nanoTime()
      val r = Crawl.fetch(urls, connectTimeoutMs = 5000,
        readTimeoutMs = 5000, taskTimeoutMs = 1000, throttleMs = 0L)
        .collect().head
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(r.getString(6) != null && r.getString(6).contains("task timeout"))
      assert(elapsedMs < 3000L, s"cap did not fire, took $elapsedMs ms")
    }
  }

  test("throttle sleeps between sequential requests within a partition") {
    import spark.implicits._
    val payloads = fixturePayloads(3)
    withServer(payloads) { (_, port) =>
      val urls = payloads.keys.toSeq.sorted
        .map(id => (id, s"http://127.0.0.1:$port/img/$id.ppm"))
        .toDF("doc_id", "url").coalesce(1)
      val t0 = System.nanoTime()
      val n = Crawl.fetch(urls, throttleMs = 200L).count()
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(n == 3)
      // 3 requests in one partition = 2 inter-request sleeps >= 400 ms
      assert(elapsedMs >= 400L,
        s"expected >= 400 ms of throttle, took $elapsedMs ms")
    }
  }
}
