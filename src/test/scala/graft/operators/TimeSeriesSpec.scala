package graft.operators

import java.sql.Date

import graft.SparkSpec

/** Semantic invariants the oracle hash can't state directly: grid density,
  * forward-fill/interpolation bounds, funnel monotonicity, and the cohort
  * triangle's diagonal. */
class TimeSeriesSpec extends SparkSpec {

  test("ts_fill_gaps: dense calendar, non-null forward fill, real gaps") {
    val rows = TimeSeries.tsFillGaps(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val days = rs.map(_.getAs[Date]("day").toLocalDate)
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        days.min(Ordering.by((_: java.time.LocalDate).toEpochDay)),
        days.max(Ordering.by((_: java.time.LocalDate).toEpochDay))) + 1
      assert(rs.length == span, s"user $u grid not dense: ${rs.length} vs $span")
      assert(days.distinct.length == days.length, s"user $u duplicate days")
    }
    assert(rows.forall(!_.isNullAt(rows.head.fieldIndex("filled_cents"))),
      "filled_cents must never be null (first grid day is observed)")
    // the fill actually fires: fixture purchases are ~13/user/30d, so gaps exist
    assert(rows.exists(_.getBoolean(rows.head.fieldIndex("is_gap"))))
    // forward-fill semantics: walking each user's days in order, a gap row
    // carries exactly the last observed value
    byUser.foreach { case (u, rs) =>
      var lastObs: Option[Long] = None
      rs.sortBy(_.getAs[Date]("day").toLocalDate.toEpochDay).foreach { r =>
        val cents = if (r.isNullAt(r.fieldIndex("cents"))) None
          else Some(r.getLong(r.fieldIndex("cents")))
        val filled = r.getLong(r.fieldIndex("filled_cents"))
        cents match {
          case Some(c) => assert(filled == c); lastObs = Some(c)
          case None    => assert(lastObs.contains(filled),
            s"user $u gap fill $filled != last observed $lastObs")
        }
      }
    }
  }

  test("ts_interpolate: gaps land between their neighbors, observed pass through") {
    val rows = TimeSeries.tsInterpolate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val iCents = rows.head.fieldIndex("cents")
    val iInterp = rows.head.fieldIndex("interp_cents")
    assert(rows.forall(!_.isNullAt(iInterp)), "interp_cents must be total")
    rows.filter(!_.isNullAt(iCents)).foreach(r =>
      assert(r.getLong(iInterp) == r.getLong(iCents)))
    // each gap value lies inside [min(prev,next), max(prev,next)] of the
    // observed neighbors along the user's day-ordered series
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val ordered = rs.sortBy(_.getAs[Date]("day").toLocalDate.toEpochDay)
      val obsIdx = ordered.zipWithIndex.filter(!_._1.isNullAt(iCents)).map(_._2)
      ordered.zipWithIndex.filter(_._1.isNullAt(iCents)).foreach { case (r, i) =>
        val prev = obsIdx.filter(_ < i).max
        val next = obsIdx.filter(_ > i).min
        val lo = math.min(ordered(prev).getLong(iCents), ordered(next).getLong(iCents))
        val hi = math.max(ordered(prev).getLong(iCents), ordered(next).getLong(iCents))
        val v = r.getLong(iInterp)
        assert(v >= lo && v <= hi, s"user $u day $i interp $v outside [$lo,$hi]")
      }
    }
  }

  test("window_funnel: three monotone non-increasing levels") {
    val rows = TimeSeries.windowFunnel(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val counts = rows.map(_.getLong(2))
    assert(counts(0) > 0, "some user viewed")
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      s"funnel must narrow: ${counts.toSeq}")
  }

  test("cohort_retention: offset-0 diagonal is each cohort's peak") {
    val rows = TimeSeries.cohortRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Date]("cohort_day")).foreach { case (cd, rs) =>
      val at0 = rs.find(_.getInt(1) == 0)
      assert(at0.isDefined, s"cohort $cd missing offset 0")
      val peak = rs.map(_.getLong(2)).max
      assert(at0.get.getLong(2) == peak,
        s"cohort $cd: offset-0 (${at0.get.getLong(2)}) must equal peak $peak")
    }
  }

  test("profile_columns: one row per column, exact stats, portable rendering") {
    val rows = DataProfile.profileColumns(spark, sfDir).collect()
    assert(rows.length == 6)
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    assert(byCol("o_orderkey").getLong(1) == 0, "orderkey has no nulls")
    val nRows = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(byCol("o_orderkey").getLong(2) == nRows, "orderkey is unique")
    assert(byCol("o_orderdate").getString(3).matches("\\d{4}-\\d{2}-\\d{2}"),
      "date min renders as ISO date")
    assert(byCol("o_totalprice").getString(4).matches("\\d+\\.\\d{2}"),
      "double max renders as 2dp decimal")
  }

  test("profile_columns_approx: no Expand in the plan, estimates inside the HLL band vs exact (r10)") {
    val approx = DataProfile.profileColumnsApprox(spark, sfDir)
    // the 100 TB contract: the sketch profile must NOT pay
    // profile_columns' per-column Expand branch over the full scan —
    // assert on the COMPILED physical plan (sparkPlan, pre-AQE), which is
    // where a distinct-aggregate Expand would appear
    val phys = approx.queryExecution.sparkPlan.toString
    assert(!phys.contains("Expand"),
      s"approx profile plan must not contain an Expand node:\n$phys")
    val est = approx.collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(est.size == 6)
    val exact = DataProfile.profileColumns(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // 64 registers → standard error 1.04/√64 ≈ 13%; LinearCounting is
    // near-exact at tiny cardinalities. Band: 30% relative (2.3 SE) with
    // an absolute floor of 2 for the handful-of-values columns.
    est.foreach { case (c, e) =>
      val x = exact(c).toDouble
      assert(math.abs(e - x) <= math.max(2.0, 0.30 * x),
        s"$c: estimate $e outside the HLL band around exact $x")
    }
  }

  test("window_ewma: weights are exact powers of two, equals a driver-side recompute (r10)") {
    import org.apache.spark.sql.functions.{col, expr, sum, to_date}
    val rows = TimeSeries.windowEwma(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // independent driver recompute from the raw daily series
    val daily = graft.model.Tables.load(spark, sfDir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .collect()
      .map(r => r.getAs[Date]("day").toLocalDate -> r.getLong(1)).toMap
    rows.foreach { r =>
      val d = r.getAs[Date]("day").toLocalDate
      val window = (0 to 7).flatMap { delta =>
        daily.get(d.minusDays(delta.toLong)).map(c => (c, 1L << (7 - delta)))
      }
      assert(r.getAs[Long]("ewma_num") == window.map(p => p._1 * p._2).sum,
        s"$d: numerator mismatch")
      assert(r.getAs[Long]("ewma_den") == window.map(_._2).sum,
        s"$d: denominator mismatch")
      // the smoothed value sits inside the window's [min, max] envelope
      val vals = window.map(_._1)
      assert(r.getAs[Double]("ewma_cents") >= vals.min - 1 &&
        r.getAs[Double]("ewma_cents") <= vals.max + 1)
    }
  }

  test("ts_resample_ohlc: bar invariants + a driver-recomputed bucket (r10)") {
    import org.apache.spark.sql.functions.col
    val rows = TimeSeries.tsResampleOhlc(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getAs[Long]("open_c"), r.getAs[Long]("high_c"),
        r.getAs[Long]("low_c"), r.getAs[Long]("close_c"))
      assert(l <= o && o <= h && l <= c && c <= h,
        s"bar ${r.get(1)}: open/close outside [low, high]")
      assert(r.getAs[Long]("n_events") >= 1)
      assert(r.getAs[Long]("vol_c") >= l * r.getAs[Long]("n_events"))
    }
    // recompute the largest bucket by walking its events in (ts, id) order
    val biggest = rows.maxBy(_.getAs[Long]("n_events"))
    val hour = biggest.getAs[java.sql.Timestamp]("hour")
    val evs = graft.model.Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), math.round(r.getAs[Double]("value") * 100)))
      .filter { case (ts, _, _) =>
        ts.getTime / 3600000 == hour.getTime / 3600000 }
      .sortBy { case (ts, id, _) => (ts.getTime, id) }
    assert(biggest.getAs[Long]("open_c") == evs.head._3, "open = first by (ts, id)")
    assert(biggest.getAs[Long]("close_c") == evs.last._3, "close = last by (ts, id)")
    assert(biggest.getAs[Long]("n_events") == evs.length)
  }

  test("agg_skew_kurt: matches Spark's built-in skewness/kurtosis (r10)") {
    import org.apache.spark.sql.functions.{col, expr, kurtosis, skewness}
    val rows = DataProfile.aggSkewKurt(spark, sfDir).collect()
    assert(rows.length == 3)
    val builtin = graft.model.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(skewness(expr("round(l_extendedprice * 100)")).as("sk"),
        kurtosis(expr("round(l_extendedprice * 100)")).as("ku"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (sk, ku) = builtin(r.getString(0))
      assert(math.abs(r.getAs[Double]("skewness") - sk) < 1e-6,
        s"${r.getString(0)}: skew ${r.getAs[Double]("skewness")} vs builtin $sk")
      assert(math.abs(r.getAs[Double]("kurtosis") - ku) < 1e-6,
        s"${r.getString(0)}: kurt ${r.getAs[Double]("kurtosis")} vs builtin $ku")
    }
  }

  test("window_streaks: equals a driver-side walk of each user's purchase series (r10)") {
    import org.apache.spark.sql.functions.col
    val out = TimeSeries.windowStreaks(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("longest_run"),
        r.getAs[Long]("n_runs3"), r.getAs[Long]("n_runs"))).toMap
    assert(out.nonEmpty)
    val purchases = graft.model.Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), math.round(r.getAs[Double]("value") * 100)))
      .groupBy(_._1)
    assert(out.keySet == purchases.keySet)
    purchases.foreach { case (u, rows) =>
      val series = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4)
      // walk the series: split into maximal strictly-increasing runs
      val plain = scala.collection.mutable.ListBuffer[Int]()
      var len = 0
      var prev = Long.MinValue
      var first = true
      series.foreach { c =>
        if (first || c <= prev) { if (len > 0) plain += len; len = 1 }
        else len += 1
        prev = c; first = false
      }
      if (len > 0) plain += len
      val (lr, n3, nr) = out(u)
      assert(lr == plain.max, s"user $u: longest $lr != ${plain.max}")
      assert(n3 == plain.count(_ >= 3), s"user $u: n_runs3")
      assert(nr == plain.length, s"user $u: n_runs")
    }
  }

  test("window_zscore_rolling: equals a driver-side trailing-30 recompute (r10)") {
    import org.apache.spark.sql.functions.{col, expr, sum, to_date}
    val rows = TimeSeries.windowZscoreRolling(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = graft.model.Tables.load(spark, sfDir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .collect().map(r => (r.getAs[Date]("day").toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val series = daily.map(_._2)
    val expected = daily.indices.map { i =>
      val w = series.slice(math.max(0, i - 29), i + 1)
      val n = w.length
      val mean = w.sum.toDouble / n
      val variance = w.map(c => c.toDouble * c).sum / n - mean * mean
      if (n >= 10 && variance > 0.0)
        Some(BigDecimal((series(i) - mean) / math.sqrt(variance))
          .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
    }
    rows.sortBy(_.getAs[Date]("day").getTime).zip(expected).foreach {
      case (r, want) =>
        val got = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        // recompute uses double c*c where the engine sums exact decimals;
        // they agree to rounding at this magnitude
        (got, want) match {
          case (Some(g), Some(e)) => assert(math.abs(g - e) <= 2e-4,
            s"${r.get(0)}: z $g vs recompute $e")
          case (g, e) => assert(g == e, s"${r.get(0)}: null mismatch $g vs $e")
        }
    }
  }

  test("window_drawdown: peak monotone, drawdown = peak - cum, exact recompute (r10)") {
    val rows = TimeSeries.windowDrawdown(spark, sfDir).collect()
      .sortBy(_.getAs[Date]("day").getTime)
    assert(rows.nonEmpty)
    var cum = 0L
    var peak = Long.MinValue
    rows.foreach { r =>
      cum += r.getAs[Long]("cents")
      peak = math.max(peak, cum)
      assert(r.getAs[Long]("cum_cents") == cum)
      assert(r.getAs[Long]("peak_cents") == peak)
      assert(r.getAs[Long]("drawdown_cents") == peak - cum)
      assert(r.getAs[Long]("drawdown_cents") >= 0L)
    }
  }

  test("window_rolling_distinct: equals a driver-side 7-day recompute") {
    import org.apache.spark.sql.functions.{col, to_date}
    val rows = TimeSeries.windowRollingDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val act = graft.model.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getAs[Date]("day").toLocalDate))
    val gridDays = act.map(_._2).distinct
    assert(rows.length == gridDays.length, "one row per observed day")
    rows.foreach { r =>
      val d = r.getAs[Date]("day").toLocalDate
      val want = act.filter { case (_, ad) =>
        !ad.isAfter(d) && !ad.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length
      assert(r.getLong(1) == want, s"day $d: ${r.getLong(1)} != $want")
    }
    // the window actually widens the count somewhere (7d > 1d)
    val daily = act.groupBy(_._2).map { case (d, xs) => d -> xs.map(_._1).distinct.length }
    assert(rows.exists(r =>
      r.getLong(1) > daily(r.getAs[Date]("day").toLocalDate)))
  }

  test("anomaly_daily_mad: exact lower medians, internally consistent flags") {
    val rows = DataProfile.anomalyDailyMad(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val med = rows.head.getLong(2)
    val mad = rows.head.getLong(4)
    assert(rows.forall(r => r.getLong(2) == med && r.getLong(4) == mad),
      "median/MAD must be series constants")
    // the lower median IS a series value, and sits at the (n+1)/2 position
    val cents = rows.map(_.getLong(1)).sorted
    assert(med == cents((cents.length + 1) / 2 - 1))
    val devs = rows.map(r => math.abs(r.getLong(1) - med)).sorted
    assert(mad == devs((devs.length + 1) / 2 - 1))
    // flags are exactly the integer cross-multiplied rule
    rows.foreach { r =>
      val dev = r.getLong(3)
      assert(dev == math.abs(r.getLong(1) - med))
      assert(r.getBoolean(5) == (dev * 10000L > mad * 37065L))
    }
  }

  test("agg_corr_regr: matches the built-in corr/regr_slope to 1e-9") {
    import org.apache.spark.sql.functions._
    val rows = DataProfile.aggCorrRegr(spark, sfDir).collect()
    assert(rows.length == 3) // returnflags R/A/N
    rows.foreach(r => assert(r.getDouble(4).abs <= 1.0, "corr out of [-1,1]"))
    // the exact-decimal formulation must agree with Spark's streaming
    // co-moment implementation up to its own fp wobble (the two differ only
    // in summation order; the cent quantization is an exact 100x scaling
    // that cancels in both statistics)
    val builtin = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_extendedprice"), col("l_quantity")).as("c"),
        covar_pop(col("l_quantity"), col("l_extendedprice")).as("cov"),
        var_pop(col("l_quantity")).as("vx"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2) / r.getDouble(3))).toMap
    rows.foreach { r =>
      val (bCorr, bSlope) = builtin(r.getString(0))
      assert((r.getDouble(4) - bCorr).abs < 1e-9,
        s"corr ${r.getDouble(4)} vs builtin $bCorr")
      assert((r.getDouble(2) - bSlope).abs < 1e-6 * (1 + bSlope.abs),
        s"slope ${r.getDouble(2)} vs builtin $bSlope")
    }
  }

  test("CUSUM changepoint: exact scaled statistic, one flagged day, telescoping to zero (r11)") {
    val out = TimeSeries.queries("ts_changepoint_cusum")(spark, sfDir).collect()
    assert(out.length > 10)
    // exactly one changepoint, at the global |CUSUM| peak
    val flagged = out.filter(_.getBoolean(3))
    assert(flagged.length == 1)
    val peak = out.map(r => math.abs(r.getLong(2))).max
    assert(math.abs(flagged.head.getLong(2)) == peak)
    // the LAST scaled CUSUM telescopes to exactly zero:
    // C_N*N = N*S - N*S (the exactness device working as designed)
    assert(out.maxBy(_.getAs[java.sql.Date](0).getTime).getLong(2) == 0L,
      "final scaled CUSUM must telescope to zero")
    // driver recompute of the whole statistic from the day series
    val days = out.sortBy(_.getAs[java.sql.Date](0).getTime)
    val n = days.length.toLong
    val s0 = days.map(_.getLong(1)).sum
    var cum = 0L
    days.zipWithIndex.foreach { case (r, i) =>
      cum += r.getLong(1)
      assert(r.getLong(2) == cum * n - (i + 1) * s0,
        s"scaled CUSUM mismatch on day ${r.get(0)}")
    }
  }

  test("ts_seasonal_decompose: additive identity, null edges, ISO weekday join (r11)") {
    val out = TimeSeries.queries("ts_seasonal_decompose")(spark, sfDir)
      .orderBy(org.apache.spark.sql.functions.col("day")).collect()
    assert(out.length > 20)
    // exactly the 3 leading + 3 trailing days lack a full centered window
    val nullTrend = out.zipWithIndex.filter(_._1.isNullAt(2)).map(_._2)
    assert(nullTrend.toSeq == Seq(0, 1, 2, out.length - 3, out.length - 2,
      out.length - 1), "trend must be null exactly at the 3-day edges")
    out.filter(!_.isNullAt(2)).foreach { r =>
      // the additive identity holds exactly: cents = trend + seasonal + resid
      assert(r.getLong(1) == r.getLong(2) + r.getLong(4) + r.getLong(5),
        s"decomposition identity broken on ${r.get(0)}")
      // ISO weekday range
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 7)
    }
    // seasonal is constant per weekday and sums detrended to ~zero per dow:
    // mean via truncating div => per-dow residual sums lie in (-n, n)
    val byDow = out.filter(!_.isNullAt(2)).groupBy(_.getInt(3))
    byDow.foreach { case (dow, rows) =>
      assert(rows.map(_.getLong(4)).distinct.length == 1,
        s"seasonal not constant for dow $dow")
      val residSum = rows.map(_.getLong(5)).sum
      assert(math.abs(residSum) < rows.length,
        s"per-dow residuals don't center: sum $residSum over ${rows.length}")
    }
    // trend replay on a sample: centered 7-day truncating mean
    val cents = out.map(_.getLong(1))
    (3 until out.length - 3 by 7).foreach { i =>
      val want = (i - 3 to i + 3).map(cents).sum / 7
      assert(out(i).getLong(2) == want, s"trend at index $i")
    }
  }

  test("ts_seasonal_strength: exact BigInt replay from the decomposition, bounded ppm (r11)") {
    val row = TimeSeries.queries("ts_seasonal_strength")(spark, sfDir).head()
    val days = TimeSeries.queries("ts_seasonal_decompose")(spark, sfDir)
      .collect().filter(!_.isNullAt(2))
    assert(row.getLong(0) == days.length, "n_days must be the interior count")
    val resid = days.map(r => BigInt(r.getLong(5)))
    val detr = days.map(r => BigInt(r.getLong(4) + r.getLong(5)))
    val n = BigInt(days.length)
    def num(xs: Array[BigInt]): BigInt = {
      val s0 = xs.sum
      xs.map(x => (n * x - s0) * (n * x - s0)).sum
    }
    val want = (BigInt(1000000) - num(resid) * 1000000 / num(detr)).max(BigInt(0))
    assert(BigInt(row.getLong(1)) == want, "strength_ppm replay mismatch")
    assert(row.getLong(1) >= 0 && row.getLong(1) <= 1000000)
    // TPC-H order dates are calendar-uniform: the monitor must report NO
    // weekly rhythm (the honest negative — a high strength here would
    // mean the seasonal means are fitting noise structure)
    assert(row.getLong(1) < 100000,
      s"fixture has no weekly cycle but strength=${row.getLong(1)}ppm")
  }

  test("ts_autocorr: exact integer PPM, |r_k| <= 1, driver replay bit-for-bit (r11)") {
    import org.apache.spark.sql.functions._
    val out = TimeSeries.queries("ts_autocorr")(spark, sfDir).collect()
    assert(out.length == 7)
    // rebuild the daily cents series and replay the n^2-scaled estimator
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("c"))
      .orderBy(col("day")).collect().map(_.getLong(1))
    val n = daily.length.toLong
    val s0 = daily.sum
    val dev = daily.map(x => BigInt(n * x - s0))
    val num0 = dev.map(d => d * d).sum
    out.foreach { r =>
      val k = r.getInt(0)
      val numK = (0 until (daily.length - k))
        .map(t => dev(t) * dev(t + k)).sum
      val ppm = (if (numK < 0) -1 else 1) * ((numK.abs * 1000000) / num0)
      assert(r.getLong(1) == daily.length - k, s"n_pairs at lag $k")
      assert(BigInt(r.getLong(2)) == ppm, s"acf_ppm at lag $k")
      // |r_k| <= 1 by Cauchy-Schwarz over the truncated overlap... not
      // guaranteed for the raw truncated estimator, but ppm must at least
      // stay inside the numerically sane band
      assert(math.abs(r.getLong(2)) <= 1200000L, s"acf_ppm magnitude at lag $k")
    }
  }

  test("ts_cross_corr: exact BigInt replay with isqrt norms, pair counts n-|k| (r12)") {
    import org.apache.spark.sql.functions._
    val out = TimeSeries.queries("ts_cross_corr")(spark, sfDir).collect()
    assert(out.length == 11, s"expected 11 lags, got ${out.length}")
    // rebuild both daily series, replay devs, norms and every lag exactly
    val ev = graft.model.Tables.load(spark, sfDir, "events")
    val a = ev.filter(col("event_type") === "purchase")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("a"))
    val b = ev.filter(col("event_type") === "view")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("b"))
    val cmn = a.join(b, Seq("day")).orderBy(col("day")).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val n = cmn.length.toLong
    val (sa, sb) = (cmn.map(_._1).sum, cmn.map(_._2).sum)
    val da = cmn.map(x => BigInt(n * x._1 - sa))
    val db = cmn.map(x => BigInt(n * x._2 - sb))
    def isqrt(v: BigInt): BigInt = {
      var r = BigInt(math.sqrt(v.toDouble).toLong)
      while (r * r > v) r -= 1
      while ((r + 1) * (r + 1) <= v) r += 1
      r
    }
    val (ra, rb) = (isqrt(da.map(d => d * d).sum), isqrt(db.map(d => d * d).sum))
    out.foreach { r =>
      val k = r.getInt(0)
      val idx = (0 until cmn.length).filter(t => t + k >= 0 && t + k < cmn.length)
      val numK = idx.map(t => da(t) * db(t + k)).sum
      val ppm = (if (numK < 0) -1 else 1) * (numK.abs * 1000000 / ra / rb)
      assert(r.getLong(1) == cmn.length - math.abs(k), s"n_pairs at lag $k")
      assert(BigInt(r.getLong(2)) == ppm, s"ccf_ppm at lag $k")
    }
    // non-vacuity: the statistic separates lags (not a constant column)
    assert(out.map(_.getLong(2)).distinct.length > 1, "ccf is degenerate")
  }

  test("holt linear smoothing: SQL fold matches an independent Scala replay; level tracks, trend converges (r12)") {
    import spark.implicits._
    import java.sql.Date
    // independent plain-Scala replay of the recursion (same integer
    // truncation) — a second implementation, not the fold under test
    def replay(xs: Seq[Long]): Seq[(Long, Long)] =
      xs.tail.scanLeft((xs.head, 0L)) { case ((l, b), x) =>
        val ln = (x + 3 * (l + b)) / 4
        (ln, (ln - l + 3 * b) / 4)
      }
    def drive(xs: Seq[Long]): Seq[(Long, Long, Long)] = {
      val df = xs.zipWithIndex
        .map { case (c, i) => (Date.valueOf(s"2024-01-${i + 1}"), c) }
        .toDF("day", "cents")
      TimeSeries.holtFromDaily(df).orderBy("day").collect()
        .map(r => (r.getAs[Long]("level_cents"), r.getAs[Long]("trend_cents"),
          r.getAs[Long]("forecast_7d_cents"))).toSeq
    }
    // linear ramp 1000, 1100, ... +100/day: trend must converge toward 100
    val ramp = (0 until 28).map(i => 1000L + 100L * i)
    val outRamp = drive(ramp)
    assert(outRamp.map { case (l, b, _) => (l, b) } == replay(ramp),
      "SQL fold diverged from the Scala replay on the ramp")
    assert(outRamp.last._2 >= 90 && outRamp.last._2 <= 100,
      s"trend should converge near the ramp slope 100, got ${outRamp.last._2}")
    // forecast column is exactly l + 7b
    outRamp.foreach { case (l, b, f) => assert(f == l + 7 * b) }
    // constant series: zero trend everywhere, level pinned to the constant
    val flat = Seq.fill(10)(5000L)
    val outFlat = drive(flat)
    assert(outFlat.forall { case (l, b, f) => l == 5000L && b == 0L && f == 5000L },
      s"constant series must hold (l=x, b=0): $outFlat")
    // level-shift series: after a jump the trend goes positive then decays
    // back toward zero once the new level is absorbed
    val shift = Seq.fill(8)(1000L) ++ Seq.fill(20)(9000L)
    val outShift = drive(shift)
    assert(outShift.map { case (l, b, _) => (l, b) } == replay(shift),
      "SQL fold diverged from the Scala replay on the level shift")
    val bs = outShift.map(_._2)
    assert(bs.max > 500, s"jump must register as positive trend: ${bs.max}")
    assert(bs.last < bs.max / 4,
      s"trend must decay after the level is absorbed: last=${bs.last} max=${bs.max}")
  }

  test("forecast residual: pred is yesterday's level+trend, MAD flag identity, medians are series values (r12)") {
    val holt = TimeSeries.tsHoltLinear(spark, sfDir).collect()
      .map(r => r.getAs[java.sql.Date]("day") ->
        (r.getAs[Long]("level_cents"), r.getAs[Long]("trend_cents"))).toMap
    val days = holt.keys.toSeq.sortBy(_.getTime)
    val out = TimeSeries.tsForecastResidual(spark, sfDir).collect()
    assert(out.length == days.length - 1, "one residual per day after the first")
    val byDay = out.map(r => r.getAs[java.sql.Date]("day") -> r).toMap
    // the prediction column is EXACTLY the prior day's l + b (the honest
    // out-of-sample forecast), cross-checked against the holt key
    days.sliding(2).foreach { case Seq(prev, d) =>
      val (l, b) = holt(prev)
      assert(byDay(d).getAs[Long]("pred_cents") == l + b,
        s"$d: pred != prior day's l+b")
      assert(byDay(d).getAs[Long]("resid_cents") ==
        byDay(d).getAs[Long]("cents") - (l + b))
    }
    // med and mad are real series values (lower medians), the flag is the
    // exact integer cross-multiply, and both tails exist on this fixture
    val resids = out.map(_.getAs[Long]("resid_cents")).sorted
    val med = out.head.getAs[Long]("med")
    assert(resids.contains(med), "median must be a series value")
    val mad = out.head.getAs[Long]("mad")
    val devs = out.map(_.getAs[Long]("dev")).sorted
    assert(devs.contains(mad), "MAD must be a deviation value")
    assert(med == resids((resids.length + 1) / 2 - 1), "lower median rule")
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_anomaly") ==
        (r.getAs[Long]("dev") * 10000L > mad * 44478L))
    }
    val n = out.count(_.getAs[Boolean]("is_anomaly"))
    assert(n > 0 && n < out.length / 10,
      s"flag rate insane: $n of ${out.length}")
  }
}
