package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for exactSubstrSpans (round 14). */
object SubstrProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val k = 6
    val docs = graft.sources.Fixtures.documents(spark, "/root/testdata/sf0.1")
    docs.count() // warm scan
    for (pass <- 1 to 2) {
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        println(f"PROF$pass $tag%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        t0 = System.nanoTime()
      }
      val toks = docs.select(col("doc_id").cast("long").as("id"),
        coalesce(col("text").cast("string"), lit("")).as("t")).repartition(32)
      val kg = toks.as[(Long, String)].mapPartitions(_.flatMap { case (id, t) =>
        val ts = t.split(" ", -1)
        if (ts.length < k) Iterator.empty
        else (0 to ts.length - k).iterator.map { p =>
          (ts.slice(p, p + k).mkString(" "), id, p) }
      }).toDF("g", "id", "pos").persist()
      kg.count(); lap("kgrams")
      val dup = kg.groupBy(col("g")).agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
        .filter(col("mn") =!= col("mx")).select(col("g"))
      dup.count(); lap("dup-agg")
      val dpos = kg.join(dup, "g").select(col("id"), col("pos")).persist()
      dpos.count(); lap("semijoin")
      val w = Window.partitionBy(col("id")).orderBy(col("pos"))
      val spans = dpos.withColumn("brk", when(col("pos") - lag(col("pos"), 1).over(w) <= k, 0L).otherwise(1L))
        .withColumn("sid", sum(col("brk")).over(w))
        .groupBy(col("id"), col("sid"))
        .agg(min(col("pos")).cast("long").as("span_start"),
          (max(col("pos")) + k).cast("long").as("span_end"),
          count(lit(1)).as("n_windows"))
      spans.count(); lap("windows")
      val out = spans.join(toks, "id")
        .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start")).as("n_tokens"), col("n_windows"),
          array_join(slice(split(col("t"), " ", -1), (col("span_start") + 1).cast("int"),
            (col("span_end") - col("span_start")).cast("int")), " ").as("span_text"))
      out.count(); lap("finaljoin")
      kg.unpersist(); dpos.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
