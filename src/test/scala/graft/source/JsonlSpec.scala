package graft.source

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** src_jsonl — the JSONL interchange round-trip (SURVEY.md §2.1 ext). */
class JsonlSpec extends SparkSpec {

  test("jsonl round-trip preserves every row and byte of the documents table") {
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    val path = s"${sys.props("java.io.tmpdir")}/graft_jsonl_spec"
    graft.sink.Sinks.deleteDir(path)
    docs.write.json(path)
    val back = spark.read.schema(docs.schema).json(path)
    assert(back.count() == docs.count())
    // full-row fidelity: anti-join in both directions is empty
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty,
      "JSON round-trip altered at least one row")
    graft.sink.Sinks.deleteDir(path)
  }

  test("src_jsonl reads with an explicit schema — no inference scan in the plan") {
    val out = SourceQueries.queries("src_jsonl")(spark, sfDir)
    val rows = out.collect()
    assert(rows.length > 1)
    // per-source counts must sum to the corpus size
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.model.Tables.load(spark, sfDir, "documents").count())
    // checksum column present and distinct across sources (text differs)
    val fps = rows.map(_.getAs[String]("corpus_fp"))
    assert(fps.distinct.length == fps.length)
  }

  test("csv bad records: malformed rows quarantine whole, good rows parse whole") {
    val out = SourceQueries.queries("src_csv_badrecords")(spark, sfDir).collect()
      .map(r => r.getAs[String]("side") -> r.getAs[Long]("n_rows")).toMap
    val docs = graft.model.Tables.load(spark, sfDir, "documents")
    val expectBad = docs.filter(org.apache.spark.sql.functions.expr("doc_id % 17 = 0")).count()
    assert(out("corrupt") == expectBad, s"quarantined ${out("corrupt")} of $expectBad planted")
    assert(out("ok") + out("corrupt") == docs.count(), "rows lost in PERMISSIVE parse")
  }
}
