package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** Temporal operators vs in-test brute force: latest-snapshot dedup
  * (incl. ts ties broken by the tie column), sessionization (gap
  * boundary exactly at/over the gap, single-row sessions, multiple
  * keys), and the as-of join (exact-ts match allowed, no-prior-row
  * drop, right-ts ties to the largest tie). All checked across
  * partitionings — the operators promise bit-stable output.
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // (id, key, ts, v) — key "a": ts tie at 100 (ids 2,3), gap exactly
  // 60s (no break at gap == 60 with gap-micros 60e6? break iff > gap),
  // key "b": single row; key "c": two sessions 61s apart
  private def corpus(parts: Int) = {
    val rows = Seq(
      (1L, "a", ts(40), 1.0), (2L, "a", ts(100), 2.0), (3L, "a", ts(100), 3.0),
      (4L, "a", ts(160), 4.0), // 60s after 100: same session (not > gap)
      (5L, "b", ts(10), 5.0),
      (6L, "c", ts(0), 6.0), (7L, "c", ts(61), 7.0))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts))
      .toDF("id", "key", "ts", "v")
  }

  test("latestSnapshot: max (ts, tie) row per key, one hash agg, stable") {
    for (parts <- Seq(1, 7)) {
      val got = Temporal.latestSnapshot(corpus(parts), Seq("key"), "ts", "id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSet
      assert(got === Set(("a", 4L, 4.0), ("b", 5L, 5.0), ("c", 7L, 7.0)))
    }
    // ts tie: drop id=4, winner among (2,3)@100 must be id 3
    val tied = Temporal.latestSnapshot(
        corpus(3).filter($"id" =!= 4L), Seq("key"), "ts", "id")
      .filter($"key" === "a").collect()
    assert(tied.length === 1 && tied.head.getLong(1) === 3L)
  }

  test("sessionize: 1-based ids, break strictly beyond the gap") {
    val got = Temporal.sessionize(corpus(5), Seq("key"), "ts", "id",
        gapMicros = 60L * 1000000L)
      .select($"id", $"session").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a: 40 -> s1; 100 (gap 60, not >60) -> s1; 160 -> s1. b: s1.
    // c: 0 -> s1; 61 (> 60) -> s2.
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 6L -> 1L, 7L -> 2L))
    val broken = Temporal.sessionize(corpus(2), Seq("key"), "ts", "id",
        gapMicros = 59L * 1000000L)
      .filter($"key" === "a").select($"id", $"session").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(broken === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 3L))
  }

  test("asofJoin: greatest right ts <= left ts; exact match; inner drop; tie to max tie") {
    val left = Seq((10L, "a", ts(50)), (11L, "a", ts(100)), (12L, "a", ts(5)),
        (13L, "b", ts(500)))
      .toDF("lid", "key", "ts")
    val right = Seq((1L, "a", ts(20), "r1"), (2L, "a", ts(100), "r2"),
        (3L, "a", ts(100), "r3"), (4L, "c", ts(1), "rc"))
      .toDF("rid", "key", "rts", "tag")
    for (parts <- Seq(1, 4)) {
      val got = Temporal.asofJoin(
          left.repartition(parts), right.repartition(parts), Seq("key"),
          "ts", "rts", "rid", Seq("tag", "rts"))
        .collect().map(r => (r.getLong(0), r.getString(3))).toSet
      // lid 10 @50 -> r1@20; lid 11 @100 -> tie (r2,r3)@100 -> max rid=3
      // lid 12 @5 -> no prior right: dropped; lid 13 key b: dropped
      assert(got === Set((10L, "r1"), (11L, "r3")), s"parts=$parts")
    }
  }

  test("asofJoin carries full payload columns with left schema intact") {
    val left = Seq((10L, "a", ts(50), "keepme")).toDF("lid", "key", "ts", "note")
    val right = Seq((1L, "a", ts(20), 9.5)).toDF("rid", "key", "rts", "score")
    val row = Temporal.asofJoin(left, right, Seq("key"),
      "ts", "rts", "rid", Seq("score")).collect().head
    assert(row.getLong(0) === 10L && row.getString(3) === "keepme" &&
      row.getDouble(4) === 9.5)
  }

  test("funnel: strict-after chaining, break carries reached, simultaneous non-qualifying") {
    val ev = Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),   // full chain
      (2L, "A", 10L), (2L, "B", 10L),                   // simultaneous B: not after
      (3L, "B", 5L), (3L, "A", 10L), (3L, "B", 50L),    // early B ignored, late B counts
      (4L, "B", 99L),                                   // never entered
      (5L, "A", 40L), (5L, "C", 50L)                    // skips B: C must not count
    ).toDF("u", "et", "sec").withColumn("ts", col("sec").cast("timestamp"))
    val out = Temporal.funnel(ev, "u", "ts", "et", Seq("A", "B", "C"))
      .collect().map(r => (r.getLong(0),
        (r.getInt(r.fieldIndex("reached")),
          Option(r.get(r.fieldIndex("t2"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("t3"))).map(_.asInstanceOf[Long])))).toMap
    assert(out(1L) === ((3, Some(20000000L), Some(30000000L))))
    assert(out(2L) === ((1, None, None)))
    assert(out(3L) === ((2, Some(50000000L), None)))
    assert(!out.contains(4L))
    assert(out(5L) === ((1, None, None)))
  }

  test("retentionCohorts: calendar-week buckets, distinct users, exact integer math") {
    val day = 86400L
    val ev = Seq(
      (1L, 0L), (1L, 6L * day), (1L, 7L * day),     // cohort week 0: active w0 (x2 events), w1
      (2L, 8L * day), (2L, 8L * day + 10),          // cohort week 1: one active week, dup event
      (3L, 1L * day), (3L, 15L * day)               // cohort week 0: w0 and w2
    ).toDF("u", "sec").withColumn("ts", col("sec").cast("timestamp"))
    val out = Temporal.retentionCohorts(ev, "u", "ts")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out === Map(
      (0L, 0L) -> 2L,   // users 1 and 3 in week 0
      (0L, 1L) -> 1L,   // user 1
      (0L, 2L) -> 1L,   // user 3
      (1L, 0L) -> 1L))  // user 2, duplicate event counted once
  }

  test("guards: missing columns / empty keys / column collisions reject") {
    intercept[IllegalArgumentException] {
      Temporal.latestSnapshot(corpus(1), Seq.empty, "ts", "id")
    }
    intercept[IllegalArgumentException] {
      Temporal.sessionize(corpus(1).withColumn("session", lit(1)),
        Seq("key"), "ts", "id", 1000L)
    }
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(corpus(1), corpus(1).withColumnRenamed("ts", "rts"),
        Seq("key"), "ts", "rts", "id", Seq("v")) // v collides with left
    }
  }
}
