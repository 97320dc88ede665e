package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.util.Random

/** End-to-end test of the graft.Join CLI: a reference-format
  * melody-conf.properties (paths INSIDE the file, exactly the
  * reference's contract — Join.java:14-136) drives every declared
  * engine over reference-format text inputs, and the written
  * "rid sid dist" outputs agree across engines on
  * (rid, sid, round(dist, 6)). */
class JoinCliSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def readPairs(outDir: String): Set[(Long, Long, Double)] = {
    val files = Files.list(java.nio.file.Paths.get(outDir)).toArray
      .map(_.toString).filter(_.endsWith(".txt"))
    files.flatMap { p =>
      val src = scala.io.Source.fromFile(p)
      try src.getLines().toArray finally src.close()
    }.map { line =>
      val Array(r, s, d) = line.split(" ")
      (r.toLong, s.toLong,
        BigDecimal(d.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_EVEN)
          .toDouble)
    }.toSet
  }

  test("properties-file CLI runs every engine end-to-end and outputs agree") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("joincli")
    val rnd = new Random(7)
    val numBins = 8; val dimension = 3; val n = 70
    val histLines = (0 until n).map { i =>
      (i.toString +: Array.fill(numBins)(f"${rnd.nextDouble() * 10}%.6f"))
        .mkString(" ")
    }
    val bins = Array.fill(numBins * dimension)(f"${rnd.nextDouble() * 5}%.6f")
    val histPath = dir.resolve("hist.txt")
    Files.write(histPath, histLines.mkString("\n").getBytes)
    val binsPath = dir.resolve("bins.txt")
    Files.write(binsPath, bins.mkString(" ").getBytes)
    val vecPath = dir.resolve("vectors.txt")
    Files.write(vecPath, "1 0 0 0 1 0 0 0 1".getBytes)

    def writeConf(method: String, joinType: String, out: String): String = {
      val conf = dir.resolve(s"conf-$method-$joinType.properties")
      val body =
        s"""data.dimension=$dimension
           |data.bin.number=$numBins
           |data.input.hdfs.path=$histPath
           |data.bin.hdfs.path=$binsPath
           |melody.project.vector.hdfs.path=$vecPath
           |data.output.hdfs.path=$out
           |melody.project.vector.number=3
           |melody.normal.error.interval=5
           |melody.grid.cell.granularity=4
           |melody.sample.ratio=0.001
           |melody.join.type=$joinType
           |melody.join.distance.threshold=0.5
           |melody.join.k=10
           |mr.method.name=$method
           |mrsim.pivot.number=5
           |parallel.task.number=4
           |""".stripMargin
      Files.write(conf, body.getBytes)
      conf.toString
    }

    def runCli(method: String, joinType: String): Set[(Long, Long, Double)] = {
      val out = dir.resolve(s"out-$method-$joinType").toString
      val returned = Join.execute(spark, writeConf(method, joinType, out))
      assert(returned == out)
      readPairs(out)
    }

    // distance join: all four reference method values, one answer
    val base = runCli("bspb", "distance")
    assert(base.nonEmpty, "distance join returned no pairs")
    assert(runCli("melody", "distance") == base)
    assert(runCli("mrsim", "distance") == base)
    assert(runCli("bspmelody", "distance") == base)

    // topk join: same dispatch, k rows, same answer set — all FOUR
    // framework values, like the distance leg (Join.java:42-131)
    val topkBase = runCli("bspb", "topk")
    assert(topkBase.size == 10)
    assert(runCli("melody", "topk") == topkBase)
    assert(runCli("mrsim", "topk") == topkBase)
    assert(runCli("bspmelody", "topk") == topkBase)

    // output line format is the reference's "rid sid dist"
    val sample = Files.list(
        java.nio.file.Paths.get(dir.resolve("out-melody-topk").toString))
      .toArray.map(_.toString).filter(_.endsWith(".txt"))
    assert(sample.nonEmpty)
  }

  test("CLI parity on the declared 3-D corpus matches q_emd3d_pairs") {
    spark.sparkContext.setLogLevel("WARN")
    // the reference's literal end-to-end contract driven over the SAME
    // corpus the declared query answers: tripleHists (sf0.001) written
    // in the reference text format, the cube bins and 3-D projection
    // vectors in the conf, distance join at Theta3d — the written
    // "rid sid dist" lines must equal the q_emd3d_pairs answer set
    // (canonical orientation; dist to 1e-6, the CLI prints the engine
    // distance while the declared query prints the canonical KR form)
    val dir = Files.createTempDirectory("joincli-corpus")
    val sfDir = "/root/testdata/sf0.001"
    val hists = graft.sources.Fixtures.tripleHists(spark, sfDir)
      .collect().map { r =>
        (r.getLong(0) +: r.getSeq[Double](1).map(_.toString)).mkString(" ")
      }
    val histPath = dir.resolve("hist.txt")
    Files.write(histPath, hists.mkString("\n").getBytes)
    val binsPath = dir.resolve("bins.txt")
    Files.write(binsPath,
      graft.sources.Fixtures.Bins3d.map(_.toString).mkString(" ").getBytes)
    val vecPath = dir.resolve("vectors.txt")
    val cfg = SparkEntry.melodyCfg3d
    Files.write(vecPath,
      cfg.vectors.map(_.map(_.toString).mkString(" ")).mkString(" ").getBytes)
    val out = dir.resolve("out").toString
    val conf = dir.resolve("conf.properties")
    Files.write(conf,
      s"""data.dimension=3
         |data.bin.number=8
         |data.input.hdfs.path=$histPath
         |data.bin.hdfs.path=$binsPath
         |melody.project.vector.hdfs.path=$vecPath
         |data.output.hdfs.path=$out
         |melody.project.vector.number=${cfg.vectors.length}
         |melody.normal.error.interval=5
         |melody.grid.cell.granularity=${cfg.sideNum}
         |melody.sample.ratio=0.001
         |melody.join.type=distance
         |melody.join.distance.threshold=0.0803
         |melody.join.k=20
         |mr.method.name=melody
         |mrsim.pivot.number=5
         |parallel.task.number=4
         |""".stripMargin.getBytes)
    Join.execute(spark, conf.toString)
    val cli = readPairs(out)
      .map { case (r, s, d) => ((math.min(r, s), math.max(r, s)), d) }.toMap
    val declared = SparkEntry.queries("q_emd3d_pairs")(spark, sfDir)
      .collect().map(r => ((math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1))), r.getDouble(2))).toMap
    assert(declared.nonEmpty)
    assert(cli.keySet == declared.keySet,
      s"pair sets differ: onlyCli=${cli.keySet -- declared.keySet} " +
        s"onlyDeclared=${declared.keySet -- cli.keySet}")
    for ((k, d) <- declared)
      assert(math.abs(cli(k) - d) <= 1.1e-6, s"dist differs at $k: ${cli(k)} vs $d")
  }

  test("CLI core refuses a conf with an empty required path") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("joincli-bad")
    val conf = dir.resolve("bad.properties")
    Files.write(conf, "data.input.hdfs.path=\n".getBytes)
    val e = intercept[IllegalArgumentException] {
      Join.execute(spark, conf.toString)
    }
    assert(e.getMessage.contains("data.input.hdfs.path"))
  }

  test("main mirrors the reference's arg contract without starting a session") {
    // Join.java:15-22 — both paths print and return (no throw, no exit)
    Join.main(Array.empty[String])
    Join.main(Array("/nonexistent/melody-conf.properties"))
  }
}
