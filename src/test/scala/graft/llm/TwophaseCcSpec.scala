package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The large-star/small-star CC core, driven with synthetic graphs the
  * fixture can't produce: a long chain (the diameter case the algorithm
  * exists for), a multi-component forest checked against the min-label
  * propagation core, and the star-forest fixpoint contract. */
class TwophaseCcSpec extends SparkSpec {

  private def edges(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    val e = pairs.toDF("src", "dst")
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("chain graph: every node collapses to the chain minimum") {
    // a 40-long path: label propagation needs ~40 supersteps; the
    // star-contraction loop must land the same answer in far fewer rounds
    val chain = edges((0L until 40L).map(i => (i, i + 1)))
    val out = Dedup.twophaseCc(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 41)
    assert(out.values.forall(_ == 0L), s"chain must collapse to 0: $out")
  }

  test("multi-component forest agrees with min-label propagation") {
    // three components of different shapes: a triangle, a chain, a star
    val g = edges(Seq(
      (10L, 11L), (11L, 12L), (12L, 10L),            // triangle
      (20L, 21L), (21L, 22L), (22L, 23L),            // chain
      (30L, 31L), (30L, 32L), (30L, 33L), (30L, 34L) // star (hub NOT min)
    ).map { case (a, b) => (b, a) })                  // feed reversed: order-free
    val two = Dedup.twophaseCc(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    val one = Dedup.minLabelCc(g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(two == one, s"algorithms disagree: ${two.diff(one)} / ${one.diff(two)}")
    assert(two.count(_._2 == 10L) == 3 && two.count(_._2 == 20L) == 4 &&
      two.count(_._2 == 30L) == 5)
  }

  test("production key: one row per doc, keeper iff component minimum") {
    val out = Dedup.dedupCcTwophase(spark, sfDir).collect()
    val n = graft.model.Tables.load(spark, sfDir, "documents").count()
    assert(out.length == n, "must label every document exactly once")
    assert(out.forall(r => r.getBoolean(2) == (r.getLong(0) == r.getLong(1))))
    // at least one real multi-doc cluster exists on the fixture
    assert(out.exists(r => !r.getBoolean(2)), "no dup cluster found at all")
  }
}
