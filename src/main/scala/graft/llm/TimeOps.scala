package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timer for the dedup hot path (diagnostic main). */
object TimeOps {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    graft.expressions.GraftFunctions.register(spark)

    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    // warm the JVM + parquet footers
    Dedup.dedupMinhashLsh(spark, sfDir)
      .write.mode("overwrite").format("noop").save()

    t("shingled.count")(Dedup.shingled(spark, sfDir).count())
    t("shingled.localCheckpoint")(Dedup.shingled(spark, sfDir).localCheckpoint())
    val ck = Dedup.shingled(spark, sfDir).localCheckpoint()
    t("minhash16 over checkpoint") {
      ck.withColumn("sig", expr("graft_minhash16(shingles)"))
        .write.mode("overwrite").format("noop").save()
    }
    t("full dedupMinhashLsh") {
      Dedup.dedupMinhashLsh(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    t("full dedupNgramJaccard") {
      Dedup.dedupNgramJaccard(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    t("full dedupClusters") {
      Dedup.dedupClusters(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    t("full minhashUnion") {
      MinHashAgg.dedupMinhashUnion(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
