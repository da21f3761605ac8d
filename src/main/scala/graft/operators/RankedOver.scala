package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-pass distributed rank — the device that removes the "window over a
  * low-cardinality partition key" scale-killer (r10 VERDICT: a rank window
  * partitioned by a 3-5-value column sorts a fact-table-sized partition in
  * one task at 100×).
  *
  * Topology (the classic sample → bucket → local rank + offsets plan every
  * distributed sort engine uses):
  *   1. one quantile pass picks ~`buckets` boundary values of `valueCol`
  *      (approxQuantile — a mergeable single-scan aggregate);
  *   2. each row gets a DETERMINISTIC bucket id = number of boundaries
  *      strictly below its value. The bucket is a pure function of the
  *      value, so equal values (rank peers) always share a bucket and no
  *      correctness depends on physical partition placement or exchange
  *      reuse;
  *   3. local rank/row_number/peer-cumulative-count windows run partitioned
  *      by (class, bucket) — |classes|·buckets balanced groups instead of
  *      |classes| giant ones;
  *   4. per-(class, bucket) row counts (a map-side-combining aggregate,
  *      ≤ |classes|·buckets rows) turn into per-bucket offsets via a tiny
  *      window over that bucket-grain relation, and BROADCAST back onto the
  *      ranked rows: global = offset + local.
  *
  * Exactness: ranks are integer arithmetic end to end. The quantile
  * boundaries only need to be monotone w.r.t. the true value order for the
  * decomposition to hold (all rows of bucket i sort before bucket i+1, ties
  * co-bucketed) — approximation error moves bucket SIZES, never rank values.
  */
object RankedOver {

  /** Adds to `df`:
    *   `__grank` — rank() over (classCols) ORDER BY valueCol: VALUE ties
    *               share the smallest rank (tieCols play no part);
    *   `__grn`   — row_number() over (classCols) ORDER BY (valueCol,
    *               tieCols) — a total order when the composite is unique
    *               per class (ties otherwise break by bucket-local
    *               position — don't use `__grn` with non-unique keys);
    *   `__gcum`  — VALUE-peers-inclusive cumulative count (rows whose
    *               valueCol is <= the current row's — the cume_dist
    *               numerator);
    *   `__gn`    — total row count of the class (the denominator).
    *
    * `buckets` bounds per-task sort size at n_rows / buckets: size it like
    * a shuffle partition count (callers pass spark.sql.shuffle.partitions).
    */
  def withGlobalRanks(df: DataFrame, classCols: Seq[String], valueCol: String,
      tieCols: Seq[String] = Nil, buckets: Int = 64): DataFrame = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    // one extra scan (a QuantileSummaries aggregate). Casting the value to
    // double for BUCKETING only is safe: long->double is non-decreasing, so
    // boundaries stay monotone and ties stay co-bucketed even past 2^53.
    // buckets <= 1 degenerates to one bucket (approxQuantile rejects an
    // empty probability list).
    val bounds =
      if (buckets <= 1) Array.empty[Double]
      else df.stat.approxQuantile(valueCol, probs, 0.001)
    val bucketCol: Column =
      if (bounds.isEmpty) lit(0)
      else size(filter(typedLit(bounds),
        b => b < col(valueCol).cast("double")))
    val b = df.withColumn("__bkt", bucketCol)
    val classC = classCols.map(col)
    val grpC = classC :+ col("__bkt")
    val ordC = (valueCol +: tieCols).map(col)

    // bucket-grain relation: <= |classes| * buckets rows, so the offset
    // window below (low-cardinality/unpartitioned by design) sorts a
    // metadata-sized input — whitelisted in the tools/ci.sh window lint
    val counts = b.groupBy(grpC: _*).agg(count(lit(1L)).as("__cnt"))
    val wOff = Window.partitionBy(classC: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .withColumn("__gn",
        sum(col("__cnt")).over(Window.partitionBy(classC: _*)))
      .drop("__cnt")

    // rank/cum order by the VALUE alone (peers = equal values, the
    // rank/cume_dist contract; the default RANGE frame counts all peers);
    // row_number orders by the full (value, tieCols) composite. The
    // total-order sort satisfies the value window's required ordering by
    // prefix, so both windows ride ONE exchange + sort.
    val wVal = Window.partitionBy(grpC: _*).orderBy(col(valueCol))
    val wTot = Window.partitionBy(grpC: _*).orderBy(ordC: _*)
    b.withColumn("__lrank", rank().over(wVal))
      .withColumn("__lrn", row_number().over(wTot))
      .withColumn("__lcum", count(lit(1L)).over(wVal))
      .join(broadcast(offsets), "__bkt" +: classCols)
      .withColumn("__grank", col("__off") + col("__lrank"))
      .withColumn("__grn", col("__off") + col("__lrn"))
      .withColumn("__gcum", col("__off") + col("__lcum"))
      .drop("__bkt", "__lrank", "__lrn", "__lcum", "__off")
  }

  /** Global-order lag without a single-partition window: adds `__plag` =
    * lag(valueCol, 1) over the TOTAL order of `orderCol` (which must be
    * unique — the same precondition any global lag has). Same bucket
    * device as withGlobalRanks; the only cross-bucket traffic is one
    * bucket-grain relation of per-bucket LAST values, whose lag supplies
    * the predecessor for each bucket's first row (empty buckets simply
    * don't appear, so the chain skips them correctly). The positional
    * `row_number == 1` test — not a null check on the local lag — decides
    * when to stitch, so genuinely-NULL lagged values pass through. */
  def withGlobalLag(df: DataFrame, orderCol: String, valueCol: String,
      buckets: Int = 64): DataFrame = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (buckets <= 1) Array.empty[Double]
      else df.stat.approxQuantile(orderCol, probs, 0.001)
    val bucketCol: Column =
      if (bounds.isEmpty) lit(0)
      else size(filter(typedLit(bounds),
        b => b < col(orderCol).cast("double")))
    val b = df.withColumn("__bkt", bucketCol)
    val wB = Window.partitionBy(col("__bkt")).orderBy(col(orderCol))
    // bucket-grain (≤ `buckets` rows): per-bucket last value, lagged by
    // bucket id — whitelisted in the tools/ci.sh window lint
    val prevB = b.groupBy(col("__bkt"))
      .agg(expr(s"max_by($valueCol, $orderCol)").as("__last"))
      .withColumn("__pl", lag(col("__last"), 1).over(Window.orderBy(col("__bkt")))) // lint:series-grain (bucket-grain, <= `buckets` rows)
      .select(col("__bkt"), col("__pl"))
    b.withColumn("__lagv", lag(col(valueCol), 1).over(wB))
      .withColumn("__rnb", row_number().over(wB))
      .join(broadcast(prevB), Seq("__bkt"))
      .withColumn("__plag",
        when(col("__rnb") === 1, col("__pl")).otherwise(col("__lagv")))
      .drop("__bkt", "__lagv", "__rnb", "__pl")
  }
}
