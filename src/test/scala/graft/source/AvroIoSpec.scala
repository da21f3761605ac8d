package graft.source

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The Avro codec seam's type bridge: every supported type (including the
  * date/timestamp-micros logical types) and nulls must survive the
  * round-trip bit-for-bit, and the read must run one task per container
  * file. */
class AvroIoSpec extends SparkSpec {

  test("container round-trip preserves all bridged types and nulls") {
    val st = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("d", DoubleType), StructField("b", BooleanType),
      StructField("i", IntegerType), StructField("dt", DateType),
      StructField("ts", TimestampType)))
    val ts = java.sql.Timestamp.valueOf("2025-06-27 09:09:51.123456")
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, 7, java.sql.Date.valueOf("2025-06-27"), ts),
      Row(2L, null, null, null, null, null, null),
      Row(3L, "", -0.0, false, -1, java.sql.Date.valueOf("1970-01-01"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), st)
    val dir = java.nio.file.Files.createTempDirectory("avroio").toString
    val files = AvroIo.write(df, dir)
    assert(files.nonEmpty && files.forall(_.endsWith(".avro")))
    val back = AvroIo.read(spark, files, st)
    assert(back.rdd.getNumPartitions == files.size,
      "read must parallelize one task per container file")
    val got = back.collect().sortBy(_.getLong(0))
    assert(got.length == 3)
    assert(got(0) == rows(0), s"row 1 changed: ${got(0)}")
    assert(got(1) == rows(1), s"null row changed: ${got(1)}")
    assert(got(2).getTimestamp(6).getNanos == 999999000,
      "sub-millisecond micros must survive the logical-type bridge")
    assert(got(2) == rows(2), s"edge row changed: ${got(2)}")
  }
}
