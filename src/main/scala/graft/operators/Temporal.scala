package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal crawl-pipeline primitives: latest-snapshot dedup,
  * sessionization, and the as-of join. All three are the canonical
  * operations over a (url, warc_ts, ...) crawl table — "keep the
  * newest fetch of every url", "split a host's fetches into crawl
  * sessions", "attach the snapshot that was current at time t".
  */
object Temporal {

  /** Microseconds-since-epoch of a timestamp column of EITHER flavor
    * (parquet scans yield TIMESTAMP_NTZ, which `unix_micros` rejects).
    * The NTZ→TZ cast interprets the wall time in the session timezone
    * — all mains and tests pin UTC, and gap ARITHMETIC is invariant
    * under any fixed offset regardless.
    */
  def micros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Latest-snapshot dedup: one row per key — the row with the
    * maximum (tsCol, tieCol). `tieCol` must be unique within a key so
    * the winner is total-order determined (bit-stable across retries).
    *
    * Executed as ONE hash aggregation (`max_by` over the full row):
    * partials combine map-side, so only one candidate row per key per
    * task reaches the shuffle — the dominated 10^12-row bulk never
    * moves. The window-function phrasing (`row_number() = 1`) would
    * shuffle and sort EVERY row of the table; at crawl scale that is
    * the difference between minutes and hours.
    */
  def latestSnapshot(df: DataFrame, keyCols: Seq[String],
                     tsCol: String, tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val others = df.columns.filterNot(keyCols.contains).toSeq
    require(others.contains(tsCol) && others.contains(tieCol),
      "tsCol/tieCol must be non-key columns of df")
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(others.map(col): _*),
        struct(col(tsCol), col(tieCol))).as("__top"))
      .select(keyCols.map(col) ++
        others.map(o => col("__top")(o).as(o)): _*)
  }

  /** Sessionization: assign each row a 1-based `session` id within
    * its key; a new session starts when the gap to the previous row
    * (ordered by tsCol, tieCol) exceeds `gapMicros`. Two windows over
    * the SAME (key, order) — Catalyst evaluates both in one sort, so
    * the cost is a single shuffle+sort by key.
    *
    * Scale note: the sort is per-key; web-scale keys (url, host,
    * user) are fine-grained, so no single task sees more than one
    * key's rows unless a key is degenerate — for those, pre-split by
    * a coarse time bucket first (sessions never span a gap, so
    * bucketing by day with gap < 1 day is lossless).
    */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 tieCol: String, gapMicros: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(gapMicros > 0, "gap must be positive")
    require(!df.columns.contains("session"),
      "sessionize adds `session`; rename the existing column first")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val tsu = micros(col(tsCol))
    val newSession = when(
      lag(tsu, 1).over(w).isNull ||
        tsu - lag(tsu, 1).over(w) > gapMicros, 1L).otherwise(0L)
    df.withColumn("session",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** As-of join: for every left row, the single right row with the
    * greatest rightTs <= leftTs within the same key (no row if none).
    * Output: left columns + the requested right `payload` columns
    * (null-free — unmatched left rows are dropped, like an inner
    * ASOF JOIN).
    *
    * Executed as the union-merge: tag both sides, union, ONE
    * shuffle+sort by (key, ts, side-tiebreak), then `last_value
    * (ignoreNulls)` of the right payload carries the most recent
    * right row forward onto each left row. No join node at all — the
    * classic equi-join + filter phrasing explodes to |L|x|R| per key
    * before filtering, and a range-join is a BNL in Spark; the
    * union-merge is linear in |L|+|R| per key after one sort.
    *
    * Right rows sort BEFORE left rows at equal ts (side 0 < side 1),
    * so a right row at exactly leftTs matches, and ties among right
    * rows at the same ts resolve to the largest tieCol (last in sort
    * order) — a total, replayable rule.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTsCol: String, rightTsCol: String,
               rightTieCol: String, payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(payloadCols.nonEmpty, "need at least one payload column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => payloadCols.contains(c)),
      "payload column names collide with left columns; alias them first")
    val l = left.withColumn("__side", lit(1))
      .withColumn("__ats", col(leftTsCol))
      .withColumn("__rtie", lit(null).cast(right.schema(rightTieCol).dataType))
    val payloadStruct = struct((payloadCols :+ rightTieCol).distinct.map(col): _*)
    val r0 = right.select((keyCols.map(col) :+
      col(rightTsCol).as("__ats") :+ col(rightTieCol).as("__rtie") :+
      payloadStruct.as("__pay")): _*)
      .withColumn("__side", lit(0))
    val lAll = l.select((keyCols.map(col) :+ col("__ats") :+
      col("__rtie") :+ lit(null).cast(r0.schema("__pay").dataType).as("__pay") :+
      col("__side") :+ struct(leftCols.map(col): _*).as("__lrow")): _*)
    val rAll = r0.withColumn("__lrow",
      lit(null).cast(lAll.schema("__lrow").dataType))
      .select(lAll.columns.map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ats"), col("__side"), col("__rtie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAll.unionByName(rAll)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__match").isNotNull)
      .select(leftCols.map(c => col("__lrow")(c).as(c)) ++
        payloadCols.map(p => col("__match")(p).as(p)): _*)
  }

  /** Crawl snapshot diff (CDC over two crawls of the same keyspace):
    * classify every key as added / removed / changed / unchanged by
    * comparing a content value (fingerprint, etag, hash) across the
    * old and new snapshot. ONE full-outer equi-join on the key — the
    * canonical incremental-recrawl planner input at 10^12 URLs (both
    * sides shuffle-partition on the key; no window, no skew pivot
    * since URLs are unique per snapshot).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCol: String, valCol: String): DataFrame = {
    val o = oldSnap.select(col(keyCol).as("k"), col(valCol).as("__vo"))
    val n = newSnap.select(col(keyCol).as("k"), col(valCol).as("__vn"))
    o.join(n, Seq("k"), "full_outer")
      .select(col("k").as(keyCol),
        when(col("__vo").isNull, lit("added"))
          .when(col("__vn").isNull, lit("removed"))
          .when(col("__vo") === col("__vn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Ordered funnel analysis: for each user, the earliest completion
    * chain through `steps` — t1 = first step-1 event, t_{i+1} = first
    * step-(i+1) event STRICTLY after t_i (the greedy chain; strict >
    * makes simultaneous events non-qualifying, a total and replayable
    * rule). Output per user who entered the funnel: the step
    * timestamps (micros, null once the chain breaks) and `reached`.
    *
    * Shape: one filtered aggregation for step 1, then per additional
    * step one equi-join on the user + one conditional-min aggregation
    * — k-1 joins for a k-step funnel, each shuffling only funnel
    * entrants (monotonically shrinking), never a window over the full
    * event stream.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(micros(col(tsCol))).as("t1"))
      .withColumn("reached", lit(1))
    for ((st, i) <- steps.tail.zipWithIndex) {
      val n = i + 2
      val ev = events.where(col(typeCol) === st)
        .select(col(userCol), micros(col(tsCol)).as("__t"))
      val keep = cur.columns.filter(_ != "reached").map(col) :+ col("reached")
      cur = cur.join(ev, Seq(userCol), "left")
        .groupBy(keep: _*)
        .agg(min(when(col("__t") > col(s"t${n - 1}"), col("__t"))).as(s"t$n"))
        .withColumn("reached",
          when(col(s"t$n").isNotNull, lit(n)).otherwise(col("reached")))
    }
    cur
  }

  /** Retention cohort matrix: users bucketed by the calendar week of
    * their first event (cohort_week = first-day DIV 7, days = epoch
    * micros DIV 86400e6 — all integer division, exact and
    * engine-shared), counted distinct in every calendar week offset
    * they were active. Two hash aggregations + one equi-join on the
    * user — the standard cohort triangle at any scale.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val days = events.select(col(userCol).as("__u"),
      micros(col(tsCol)).as("__us"))
      .withColumn("__day", expr("__us DIV 86400000000"))
    val first = days.groupBy(col("__u"))
      .agg(expr("min(__day) DIV 7").as("cohort_week"))
    days.join(first, "__u")
      .withColumn("week_offset", expr("__day DIV 7") - col("cohort_week"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("__u")).as("n_users"))
  }
}
