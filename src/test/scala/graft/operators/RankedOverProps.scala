package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized equivalence tests for the two-pass distributed rank/lag
  * (RankedOver) against a driver-side naive recompute — the device every
  * r11 de-weaked key rests on. Small value domains force heavy ties, and
  * bucket counts below/at/above the distinct-value count exercise empty
  * buckets and peers split across probe boundaries. Hand-rolled seed loop
  * (one Spark run per case keeps the suite's cost bounded; scalacheck's
  * default 100 cases would be ~2 minutes of Spark jobs). */
class RankedOverProps extends SparkSpec {

  // (class, value, tie) — tuples, not an inner case class (Spark encoders
  // cannot instantiate classes nested in a test suite)
  private def randomData(seed: Int): Seq[(String, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val n = 20 + rnd.nextInt(180)
    (0 until n).map { i =>
      (s"c${rnd.nextInt(3)}", rnd.nextInt(10).toLong, i.toLong)
    }
  }

  test("withGlobalRanks equals the naive single-window recompute under heavy ties") {
    import spark.implicits._
    for (seed <- 1 to 6; buckets <- Seq(1, 4, 23)) {
      val data = randomData(seed * 31 + buckets)
      val df = data.toDF("cls", "v", "tie")
      val out = RankedOver.withGlobalRanks(df, Seq("cls"), "v",
          tieCols = Seq("tie"), buckets = buckets)
        .select(col("cls"), col("v"), col("tie"),
          col("__grank"), col("__grn"), col("__gcum"), col("__gn"))
        .collect()
      assert(out.length == data.length, s"seed=$seed buckets=$buckets: row count")
      val byClass = data.groupBy(_._1)
      out.foreach { r =>
        val (c, v, t) = (r.getString(0), r.getLong(1), r.getLong(2))
        val grp = byClass(c)
        val rank = grp.count(_._2 < v) + 1L
        val cum = grp.count(_._2 <= v).toLong
        val rn = grp.count(x => x._2 < v || (x._2 == v && x._3 < t)) + 1L
        assert(r.getLong(3) == rank,
          s"seed=$seed buckets=$buckets ($c,$v,$t): grank ${r.getLong(3)} != $rank")
        assert(r.getLong(4) == rn,
          s"seed=$seed buckets=$buckets ($c,$v,$t): grn ${r.getLong(4)} != $rn")
        assert(r.getLong(5) == cum,
          s"seed=$seed buckets=$buckets ($c,$v,$t): gcum ${r.getLong(5)} != $cum")
        assert(r.getLong(6) == grp.length.toLong)
      }
    }
  }

  test("withGlobalLag equals the naive global lag, including genuine NULL values") {
    import spark.implicits._
    for (seed <- 1 to 6; buckets <- Seq(1, 4, 23)) {
      val rnd = new scala.util.Random(seed * 17 + buckets)
      val n = 20 + rnd.nextInt(180)
      // unique order keys, ~1/3 NULL values (the stitch must not confuse
      // "first row of a bucket" with "lagged value happens to be NULL")
      val data = (0 until n).map { i =>
        (i.toLong * 3 + rnd.nextInt(3),
          if (rnd.nextInt(3) == 0) None else Some(rnd.nextInt(5).toLong))
      }.distinctBy(_._1).sortBy(_._1)
      val df = data.toDF("k", "x")
      val out = RankedOver.withGlobalLag(df, "k", "x", buckets = buckets)
        .select(col("k"), col("x"), col("__plag"))
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .sortBy(_._1)
      val want = data.map(_._2)
      val wantPrev = None +: want.dropRight(1)
      assert(out.length == data.length)
      out.zip(data.zip(wantPrev)).foreach { case ((k, x, plag), ((k0, x0), p0)) =>
        assert(k == k0 && x == x0)
        assert(plag == p0,
          s"seed=$seed buckets=$buckets k=$k: plag $plag != naive $p0")
      }
    }
  }
}
