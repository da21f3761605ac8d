package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Ad-hoc profiler: `runMain graft.Profile <key> [<key>...]` times each named
  * SparkEntry query (1 warmup + 2 measured, min) on SPARK_GRAFT_SF_DIR and
  * prints a per-Spark-job breakdown of the last measured run — the tool used
  * to find which stage of a multi-job operator (checkpoints, loops) owns the
  * wall time. Not part of the driver contract; Bench stays the graded artifact.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = scala.collection.mutable.LinkedHashMap[Int, (Long, String)]()
    val ends = scala.collection.mutable.LinkedHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(j.jobId) = (j.time, Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("").take(80))
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        ends.synchronized { ends(j.jobId) = j.time }
    })

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    args.foreach { name =>
      once(name) // warmup
      val t1 = once(name)
      jobs.synchronized(jobs.clear()); ends.synchronized(ends.clear())
      val t2 = once(name)
      println(f"[profile] $name%-28s min=${math.min(t1, t2)}%6.2fs  (p1=$t1%5.2f p2=$t2%5.2f)")
      jobs.foreach { case (id, (start, desc)) =>
        val dur = ends.get(id).map(e => (e - start) / 1e3).getOrElse(-1.0)
        println(f"    job $id%3d ${dur}%7.2fs  $desc")
      }
    }
    spark.stop()
  }
}
