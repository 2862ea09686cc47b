package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.ST._

/** Structured Streaming extension (SURVEY.md §2.12 — absent from the
  * reference, marked extension): event-time windowed spatial
  * aggregation per Z-order cell, and stateful per-key processing for
  * incremental cell statistics.
  *
  * The same ST expressions run unchanged under streaming because they
  * are ordinary Catalyst expressions — watermarking and state live
  * entirely in Spark.
  */
object Streaming {

  /** Tumbling-window page/event counts + bounding envelope per cell.
    * Input must have an event-time column, lon/lat columns.
    */
  def cellWindowStats(events: DataFrame, tsCol: String, lonCol: String,
                      latCol: String, level: Int,
                      windowDur: String, watermarkDur: String): DataFrame = {
    events
      .withWatermark(tsCol, watermarkDur)
      .withColumn("cell", st_cellOf(col(lonCol), col(latCol), lit(level)))
      .withColumn("pt", st_point(col(lonCol), col(latCol)))
      .groupBy(window(col(tsCol), windowDur), col("cell"))
      .agg(count(lit(1)).as("n"),
        min(col(lonCol)).as("xmin"), min(col(latCol)).as("ymin"),
        max(col(lonCol)).as("xmax"), max(col(latCol)).as("ymax"))
  }

  /** Running per-cell state: total count and expanding envelope,
    * maintained incrementally with mapGroupsWithState — the streaming
    * analogue of a per-cell spatial index warm cache.
    */
  final case class CellObs(cell: Long, lon: Double, lat: Double)
  final case class CellState(cell: Long, n: Long,
                             xmin: Double, ymin: Double, xmax: Double, ymax: Double)

  /** Streaming exact dedup for ingest pipelines: keep the FIRST
    * occurrence of each text within the watermark horizon. State is a
    * 32-byte hash per distinct document, expired by the watermark —
    * the streaming analogue of Dedup.exactDedup, safe at ingest scale
    * because state is bounded by (distinct docs per horizon), not by
    * stream length.
    */
  def dedupTextStream(docs: DataFrame, tsCol: String, textCol: String,
                      watermarkDur: String): DataFrame =
    docs.withWatermark(tsCol, watermarkDur)
      .withColumn("__text_sha", sha2(col(textCol), 256))
      .dropDuplicatesWithinWatermark("__text_sha")
      .drop("__text_sha")

  /** Stream-static spatial join: windowed per-region counts of
    * streamed points against a STATIC polygon table — the flagship
    * PIP job as a stream. The static side is collected/indexed once
    * (prepared broadcast R-tree probe, a stateless Generator), so the
    * stream side never shuffles data rows; only the windowed count
    * aggregate keeps state.
    */
  def streamingRegionCounts(points: DataFrame, tsCol: String,
                            lonCol: String, latCol: String,
                            regions: DataFrame, geomCol: String, keyCol: String,
                            windowDur: String, watermarkDur: String): DataFrame = {
    val tagged = graft.operators.SpatialJoins.broadcastPointKeyJoin(
      points.withWatermark(tsCol, watermarkDur),
      col(lonCol), col(latCol), regions, geomCol, keyCol,
      pred = "contains", outKey = "region_key")
    tagged.groupBy(window(col(tsCol), windowDur), col("region_key"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-cell running envelope/count state. `idleTimeout` (e.g.
    * "30 minutes") expires cells not seen for that long — the warm
    * cache stays bounded by ACTIVE cells, not by every cell ever
    * observed (at web scale a level-12 grid has ~16.7M possible keys;
    * a long-running ingest would otherwise pin them all in the state
    * store). None keeps the original keep-forever semantics.
    */
  def runningCellState(obs: Dataset[CellObs],
                       idleTimeout: Option[String] = None): Dataset[CellState] = {
    import obs.sparkSession.implicits._
    val timeoutKind = idleTimeout.map(_ => GroupStateTimeout.ProcessingTimeTimeout)
      .getOrElse(GroupStateTimeout.NoTimeout)
    obs.groupByKey(_.cell)
      .mapGroupsWithState[CellState, CellState](timeoutKind) {
        (cell, rows, state: GroupState[CellState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            var st = state.getOption.getOrElse(
              CellState(cell, 0L, Double.MaxValue, Double.MaxValue,
                -Double.MaxValue, -Double.MaxValue))
            rows.foreach { o =>
              st = CellState(cell, st.n + 1,
                math.min(st.xmin, o.lon), math.min(st.ymin, o.lat),
                math.max(st.xmax, o.lon), math.max(st.ymax, o.lat))
            }
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            st
          }
      }
  }
}
