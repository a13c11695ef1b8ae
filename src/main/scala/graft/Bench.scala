package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, executing each plan fully via the noop sink
  * (`count()` would let Spark skip projection work), and prints the one-line
  * JSON contract for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup on the smallest table so per-query numbers measure
    // the queries, not first-use initialization.
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err: Option[String] =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name: $e"); Some(e.toString)
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // free localCheckpoint blocks so earlier queries' cached RDDs don't
      // build GC pressure for later ones; blocking so the release can't
      // race the next query's eager localCheckpoint
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      (name, dt, err)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failed query must be visible in the JSON contract, not just stderr;
    // blank every char that would need JSON escaping (quotes, backslash,
    // ALL control chars) so the one-line metric contract stays RFC 8259
    val errs = results.collect { case (k, _, Some(e)) =>
      "\"" + k + "\":\"" + e.replaceAll("[\\x00-\\x1f\"\\\\]", " ") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // belt-and-braces: the driver parses stdout, but sbt may prefix it with
    // its logger; a file copy survives any wrapping.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LOCAL.json"), line)
    spark.stop()
  }
}
