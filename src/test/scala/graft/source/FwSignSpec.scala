package graft.source

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sign handling in the fixed-width encoder (r10 ADVICE): the TPC-H data
  * is all-positive, so the oracle can never exercise a negative amount —
  * this spec plants one and proves the positional record round-trips it
  * exactly instead of silently parsing to NULL. */
class FwSignSpec extends SparkSpec {

  test("fixed-width records round-trip negative cents via the sign byte") {
    import spark.implicits._
    val df = Seq(
      (1L, "O", 123.45),    // plain positive
      (2L, "F", -987.65),   // refund — the case the old encoder corrupted
      (3L, "P", 0.0),       // boundary
      (4L, "O", -0.01)      // smallest negative cent
    ).toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val recs = SourceQueries.fixedWidthRecords(df)
    // layout contract: every record is exactly 28 bytes (10+4+14)
    recs.collect().foreach(r =>
      assert(r.getString(0).length == 28, s"bad width: '${r.getString(0)}'"))
    val back = SourceQueries.parseFixedWidth(recs)
      .orderBy(col("orderkey")).collect()
    val cents = back.map(r => r.getAs[Long]("orderkey") -> r.getAs[Long]("cents")).toMap
    assert(cents == Map(1L -> 12345L, 2L -> -98765L, 3L -> 0L, 4L -> -1L),
      s"sign round-trip broke: $cents")
    assert(back.map(_.getAs[String]("status")).toSeq == Seq("O", "F", "P", "O"))
    // positive records stay byte-identical to the pre-sign-byte encoding
    val pos = recs.collect().head.getString(0)
    assert(pos == "0000000001O   00000000012345", s"positive layout moved: '$pos'")
  }
}
