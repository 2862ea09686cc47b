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

  /** One exploded (band-key, doc) observation for streaming LSH. */
  final case class BandObs(key: Long, ts: java.sql.Timestamp, bk: Long)
  /** A near-dup candidate: `key` collided with the bucket's canonical
    * first-seen document `firstKey` on band bucket `bk`.
    */
  final case class DupHit(key: Long, firstKey: Long, bk: Long)
  /** LSH bucket state: canonical first-seen doc + last event time.
    * (Public: the state Encoder's generated code instantiates it.)
    */
  final case class BucketState(firstKey: Long, lastTsMs: Long)

  /** Streaming MinHash-LSH near-dup candidates: the streaming analogue
    * of [[graft.operators.Dedup.minhashCandidates]]. Each document is
    * expanded to `bands` band keys in one codegen'd pass
    * (shingles -> k min-hashes -> band keys); buckets are
    * flatMapGroupsWithState groups keyed on the band key, whose state
    * is ONLY (canonical first-seen doc key, last event time) — every
    * later arrival in the bucket emits a (key, firstKey, bk) candidate
    * against the canonical representative, so state is O(1) per active
    * bucket rather than O(docs). Buckets idle past `expireAfter` are
    * dropped via event-time timeout against the watermark — at ingest
    * scale state is bounded by ACTIVE buckets per horizon, the same
    * contract as [[dedupTextStream]]. Within a micro-batch the
    * canonical key is the bucket minimum, so output is deterministic
    * under batch-internal reordering. Downstream: distinct on
    * (key, firstKey) and (for the exact pipeline) a jaccard/cosine
    * refine join — identical post-processing to the batch path.
    */
  def nearDupCandidatesStream(docs: DataFrame, tsCol: String, textCol: String,
                              keyCol: String, watermarkDur: String,
                              expireAfter: String = "30 minutes",
                              shingleN: Int = 3, k: Int = 24,
                              bands: Int = 8): Dataset[DupHit] = {
    import docs.sparkSession.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(expireAfter))
    // months have no fixed millisecond width; silently mapping "1 month"
    // to ~0 ms would drop every bucket's state at the watermark
    require(iv.months == 0,
      s"expireAfter must be day-or-smaller denominated, got '$expireAfter'")
    val expireMs = iv.days * 86400000L + iv.microseconds / 1000L
    val banded = docs.withWatermark(tsCol, watermarkDur)
      .select(col(keyCol).cast("long").as("key"), col(tsCol).as("ts"),
        explode(minhash_bandKeys(col(textCol), shingleN, k, bands)).as("bk"))
      .as[BandObs]
    banded.groupByKey(_.bk)
      .flatMapGroupsWithState[BucketState, DupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bk, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val obs = rows.toArray.sortBy(_.key)
            val prior = state.getOption
            val first = prior.map(_.firstKey).getOrElse(obs.head.key)
            val maxTs = obs.iterator.map(_.ts.getTime).max
            state.update(BucketState(first,
              math.max(maxTs, prior.map(_.lastTsMs).getOrElse(0L))))
            // a timeout at or before the current watermark throws;
            // clamp when expireAfter is shorter than the watermark lag
            state.setTimeoutTimestamp(math.max(state.get.lastTsMs + expireMs,
              state.getCurrentWatermarkMs() + 1000L))
            obs.iterator.filter(_.key != first).map(o => DupHit(o.key, first, bk))
          }
      }
  }

  final case class SessEvent(user: Long, ts: java.sql.Timestamp)
  final case class SessionOut(user: Long, start_ms: Long, end_ms: Long,
                              n_events: Long)
  final case class SessState(startMs: Long, lastMs: Long, n: Long)

  /** Streaming gap-delimited sessionization — the incremental form of
    * Temporal.sessionize: a user's session CLOSES (and is emitted,
    * append-mode) when the event-time watermark passes lastEvent+gap.
    * State per user is three longs, expired with the session, so the
    * store is bounded by concurrently-active users, not stream length.
    * Within a batch, events are processed in ts order and a gap
    * overrun splits sessions exactly like the batch operator; the
    * StreamingSpec cross-checks emitted sessions against hand-computed
    * gap semantics across multiple micro-batches.
    */
  def sessionizeStream(events: DataFrame, tsCol: String, userCol: String,
                       gap: String, watermarkDur: String): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0, s"gap must be day-or-smaller denominated, got '$gap'")
    val gapMs = iv.days * 86400000L + iv.microseconds / 1000L
    // project/cast BEFORE the watermark: a cast after withWatermark
    // creates a fresh attribute without the event-time tag and the
    // query fails analysis
    val src = events
      .select(col(userCol).cast("long").as("user"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDur)
      .as[SessEvent]
    src.groupByKey(_.user)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.startMs, st.lastMs, st.n))
          } else {
            val ts = rows.map(_.ts.getTime).toArray.sorted
            var closed = List.empty[SessionOut]
            var st = state.getOption.getOrElse(SessState(ts.head, ts.head, 0L))
            ts.foreach { t =>
              if (st.n > 0L && t - st.lastMs > gapMs) {
                closed ::= SessionOut(user, st.startMs, st.lastMs, st.n)
                st = SessState(t, t, 1L)
              } else {
                st = SessState(if (st.n == 0L) t else st.startMs,
                  math.max(st.lastMs, t), st.n + 1L)
              }
            }
            state.update(st)
            // a timeout at or before the current watermark throws;
            // clamp (same discipline as nearDupCandidatesStream)
            state.setTimeoutTimestamp(math.max(st.lastMs + gapMs,
              state.getCurrentWatermarkMs() + 1000L))
            closed.reverseIterator
          }
      }
  }

  final case class FetchReq(domain: String, url: String, ts: java.sql.Timestamp)
  final case class FetchSlot(domain: String, url: String, req_ms: Long,
                             fetch_ms: Long)
  final case class DomainGate(nextFreeMs: Long)

  /** Streaming politeness rate limiter — the live counterpart of the
    * batch frontier schedule (q163): fetch requests stream in, and
    * per domain each request is assigned the earliest fetch slot that
    * keeps `minGap` between same-domain fetches:
    *   fetch = max(request time, domain's next free slot);
    *   next free slot = fetch + minGap.
    * Within a batch requests process in (ts, url) order — a total
    * order, so assignments are deterministic and replayable. State is
    * ONE long per active domain and expires at the watermark once the
    * gate is in the past (an expired gate constrains nothing: any
    * later request has ts > watermark >= nextFree), so the store is
    * bounded by domains fetched within the politeness horizon, not by
    * every domain ever seen.
    */
  def politenessStream(reqs: DataFrame, tsCol: String, urlCol: String,
                       domainCol: String, minGap: String,
                       watermarkDur: String): Dataset[FetchSlot] = {
    import reqs.sparkSession.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(minGap))
    require(iv.months == 0, s"minGap must be day-or-smaller denominated, got '$minGap'")
    val gapMs = iv.days * 86400000L + iv.microseconds / 1000L
    val src = reqs
      .select(col(domainCol).cast("string").as("domain"),
        col(urlCol).cast("string").as("url"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDur)
      .as[FetchReq]
    src.groupByKey(_.domain)
      .flatMapGroupsWithState[DomainGate, FetchSlot](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (domain, rows, state: GroupState[DomainGate]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ordered = rows.toArray.sortBy(r => (r.ts.getTime, r.url))
            var nextFree = state.getOption.map(_.nextFreeMs).getOrElse(Long.MinValue)
            val out = ordered.map { r =>
              val req = r.ts.getTime
              val fetch = math.max(req, nextFree)
              nextFree = fetch + gapMs
              FetchSlot(domain, r.url, req, fetch)
            }
            state.update(DomainGate(nextFree))
            state.setTimeoutTimestamp(math.max(nextFree,
              state.getCurrentWatermarkMs() + 1000L))
            out.iterator
          }
      }
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
