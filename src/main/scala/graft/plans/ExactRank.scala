package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global EXACT ascending `row_number` with no single-partition window
  * anywhere — the distributed total-order scan shared by the z-order
  * exact-ntile writer and the Gini/concentration rollups:
  *
  *  1. range-partition on the sort key (sampled-boundary exchange;
  *     partition-id order IS sort order),
  *  2. `row_number` within each partition (a PARTITIONED window),
  *  3. add per-partition rank offsets (one count per partition —
  *     driver-side bounded bookkeeping, the k-core histogram shape).
  *
  * Sampled boundaries decide only WHERE partitions split, never the
  * global rank, so the result is bit-identical to the oracle's global
  * `ROW_NUMBER()`. The input is `localCheckpoint`ed so the count pass
  * and the rank pass see the SAME partition ids (range boundaries are
  * sampled — two plans would disagree). Callers must pass a TOTAL
  * order (include a unique tie-break column), or tied rows would get
  * partition-dependent ranks.
  */
object ExactRank {

  /** Adds `rankCol` (1-based global ascending rank over `sortCols`)
    * to `df`; the result keeps the range partitioning. Also returns
    * the total row count (already known from the offset pass — free
    * for callers that need `n` alongside the ranks). */
  def withRank(df: DataFrame, nPart: Int, sortCols: Seq[Column],
      rankCol: String): (DataFrame, Long) = {
    val parted = df.repartitionByRange(nPart, sortCols: _*).localCheckpoint()
    val counts = parted.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("cnt")).orderBy(col("pid"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val offsets = counts.scanLeft((0, 0L)) {
      case ((_, acc), (pid, cnt)) => (pid, acc + cnt)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("pid", "off")
    val ranked = parted.withColumn("pid", spark_partition_id())
      .join(broadcast(offDf), "pid")
      .withColumn(rankCol, row_number()
        .over(Window.partitionBy(col("pid")).orderBy(sortCols: _*))
        .cast("long") + col("off"))
      .drop("pid", "off")
    (ranked, counts.map(_._2).sum)
  }
}
