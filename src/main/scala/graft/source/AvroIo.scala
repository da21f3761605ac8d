package graft.source

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro CONTAINER-FILE interchange on avro-core (the jar Spark itself
  * ships — the spark-avro DataSource module is a separate artifact the
  * offline build cannot resolve, so the format lands through the same
  * codec-seam pattern as the Multimodal RIFF/WAV readers: per-partition
  * imperative encode/decode at the file boundary, everything around it
  * declarative).
  *
  * Write: one Avro object-container file per partition (mapPartitions —
  * the file is a sequential stream, the one genuinely imperative seam).
  * Read: one task per container file (files are the split unit, like any
  * unsplittable-codec ingest), records decoded straight into Rows under
  * an EXPLICIT expected schema — interchange formats get no inference
  * pass (the src_cdc_envelope discipline).
  *
  * Type bridge (both directions): STRING ↔ string(utf8), LONG ↔ long,
  * INT ↔ int, DOUBLE ↔ double, BOOLEAN ↔ boolean, DATE ↔ int/date
  * logical type, TIMESTAMP ↔ long/timestamp-micros logical type —
  * the standard Avro logical-type mapping. Every field is nullable via
  * the conventional ["null", T] union.
  */
object AvroIo {

  private def avroSchema(st: StructType, name: String): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    st.fields.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case StringType  => Schema.create(Schema.Type.STRING)
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case DateType =>
          org.apache.avro.LogicalTypes.date()
            .addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType =>
          org.apache.avro.LogicalTypes.timestampMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
        case other => throw new IllegalArgumentException(
          s"AvroIo: unsupported type $other for field ${f.name}")
      }
      fs.name(f.name).`type`(Schema.createUnion(
        Schema.create(Schema.Type.NULL), base)).withDefault(null)
    }.endRecord()
  }

  /** Write `df` as Avro container files under `dir` (one per partition).
    * Returns the written file paths. */
  def write(df: DataFrame, dir: String): Seq[String] = {
    val st = df.schema
    val schemaJson = avroSchema(st, "row").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val written = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val path = s"$dir/part-$pid.avro"
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, new java.io.File(path))
        try rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          st.fields.zipWithIndex.foreach { case (f, i) =>
            val v: AnyRef =
              if (r.isNullAt(i)) null
              else f.dataType match {
                case DateType => Int.box(
                  r.getDate(i).toLocalDate.toEpochDay.toInt)
                case TimestampType => Long.box(
                  r.getTimestamp(i).getTime * 1000L +
                    (r.getTimestamp(i).getNanos / 1000L) % 1000L)
                case _ => r.get(i).asInstanceOf[AnyRef]
              }
            rec.put(f.name, v)
          }
          w.append(rec)
        } finally w.close()
        Iterator.single(path)
      }
    }.collect().toSeq
    written
  }

  /** Read Avro container files written by [[write]] back into a DataFrame
    * under the EXPLICIT expected schema — one task per file. */
  def read(s: SparkSession, files: Seq[String], st: StructType): DataFrame = {
    val n = math.max(files.size, 1)
    val rdd = s.sparkContext.parallelize(files, n).flatMap { path =>
      val reader = new DataFileReader[GenericRecord](
        new java.io.File(path), new GenericDatumReader[GenericRecord]())
      try reader.iterator().asScala.map { rec =>
        Row.fromSeq(st.fields.toSeq.map { f =>
          val v = rec.get(f.name)
          if (v == null) null
          else f.dataType match {
            case StringType => v.toString
            case DateType =>
              java.sql.Date.valueOf(
                java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
            case TimestampType =>
              val micros = v.asInstanceOf[Long]
              val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
              ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
              ts
            case _ => v
          }
        })
      }.toArray.iterator // drain before close — the reader is a stream
      finally reader.close()
    }
    s.createDataFrame(rdd, st)
  }
}
