package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver testdata (TESTDATA.md / FIXTURES.md §A).
  *
  * Role mapping from the reference's domain (SURVEY.md §1.2) to testdata:
  * `projects` → `orders`, `project_subitems` → `lineitem`
  * (`revenue_amount` → `l_extendedprice`), cost boards → `events`
  * (amount → `value`, board_relation FK → `props` JSON), snapshot column
  * `extraction_date` → `o_orderdate` / `l_shipdate`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS) which Spark has no native type
    // for; with spark.sql.legacy.parquet.nanosAsLong=true (set by every
    // session builder in this repo) it surfaces as epoch-nanos INT64.
    // Truncate to micros — the same thing DuckDB's ns→µs cast does.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every testdata table as a temp view so `spark.sql` query text
    * can be submitted directly (the reference ships SQL text to BigQuery —
    * `src_warehouse_sql`, SURVEY.md §2.1; Catalyst plays BigQuery's role).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
