package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.functions.SparkTestSession.spark
  import spark.implicits._

  test("windowed per-cell stats over a file stream") {
    // stage a small deterministic geotagged batch as parquet
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val batch = spark.range(2000).select(
      col("id"),
      timestamp_seconds(lit(1704067200L) + col("id") % 600).as("ts"),
      ((col("id") % 360).cast("double") - 180.0).as("lon"),
      ((col("id") % 170).cast("double") - 85.0).as("lat"))
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val agg = Streaming.cellWindowStats(stream, "ts", "lon", "lat",
      level = 4, windowDur = "5 minutes", watermarkDur = "10 minutes")

    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("cell_stats")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val out = spark.sql("SELECT * FROM cell_stats")
    assert(out.count() > 0)
    // each (window, cell) row's envelope is self-consistent
    val bad = out.filter(col("xmin") > col("xmax") || col("ymin") > col("ymax")).count()
    assert(bad == 0)
    // total events across windows/cells = input size
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    assert(total == 2000L)
  }

  test("streaming exact dedup within watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toString
    // 300 rows over 100 distinct texts -> exactly 100 survivors
    val batch = spark.range(300).select(
      col("id"),
      timestamp_seconds(lit(1704067200L) + col("id")).as("ts"),
      concat(lit("doc text "), col("id") % 100).as("text"))
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val deduped = Streaming.dedupTextStream(stream, "ts", "text", "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val out = spark.sql("SELECT * FROM dedup_stream")
    assert(out.count() === 100L)
    assert(out.select("text").distinct().count() === 100L)
    // the dedup key column does not leak into the output
    assert(!out.columns.contains("__text_sha"))
  }

  test("stream-static broadcast PIP join with windowed region counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pip_stream").toString
    val batch = spark.range(1000).select(
      col("id"),
      timestamp_seconds(lit(1704067200L) + col("id") % 300).as("ts"),
      ((col("id") % 100).cast("double") / 10.0 - 5.0 + 0.05).as("lon"),
      ((col("id") % 80).cast("double") / 10.0 - 4.0 + 0.05).as("lat"))
    batch.write.mode("overwrite").parquet(dir)
    // two static boxes covering the left / right halves of the domain
    val regions = Seq(
      (1L, -5.0, -4.0, 0.0, 4.0),
      (2L, 0.0, -4.0, 5.0, 4.0)).toDF("rid", "x0", "y0", "x1", "y1")
      .withColumn("geom", graft.functions.ST.st_makeEnvelope(
        col("x0"), col("y0"), col("x1"), col("y1")))

    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val agg = Streaming.streamingRegionCounts(stream, "ts", "lon", "lat",
      regions, "geom", "rid", windowDur = "5 minutes", watermarkDur = "10 minutes")
    // update mode: emit window rows as they accumulate (append would
    // hold them until the watermark passes each window's end)
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("region_counts")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val out = spark.sql("SELECT * FROM region_counts")
    assert(out.count() > 0)
    // every streamed point lies strictly inside one of the two boxes
    // (offsets keep them off the shared edge), so counts conserve
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    assert(total === 1000L)
    assert(out.select("region_key").distinct().count() === 2L)
  }

  test("streaming minhash near-dup candidates against bucket canonicals") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_stream").toString
    // 120 docs over 20 distinct texts (id % 20): each class of 6 docs
    // collides in every band against its canonical (min id). Every
    // token carries the class id, so shingle sets are DISJOINT across
    // classes — texts differing in only one token would be genuine
    // ~0.85-Jaccard near-dups and legitimately collide cross-class
    val batch = spark.range(120).select(
      col("id"),
      timestamp_seconds(lit(1704067200L) + col("id")).as("ts"),
      concat(lit("alpha"), col("id") % 20, lit(" bravo"), col("id") % 20,
        lit(" charlie"), col("id") % 20, lit(" delta"), col("id") % 20,
        lit(" echo"), col("id") % 20).as("text"))
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val hits = Streaming.nearDupCandidatesStream(
      stream, "ts", "text", "id", watermarkDur = "10 minutes")
    val q = hits.writeStream.outputMode("append")
      .format("memory").queryName("lsh_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val pairs = spark.sql("SELECT DISTINCT key, firstKey FROM lsh_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical texts collide in all bands; canonical = class minimum,
    // so the expected pair set is exactly (id, id % 20) for id >= 20
    val expected = (20L until 120L).map(id => (id, id % 20L)).toSet
    assert(pairs === expected)
  }

  test("streaming sessionization closes sessions at the watermark") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_stream").toString
    val t0 = 1704067200L
    // user 1: two sessions (events at 0,60,120 s then 1000,1030 s);
    // user 2: one session (500 s). gap 5 min, watermark 1 min.
    val a = Seq(
      (1L, t0 + 0L), (1L, t0 + 60L), (1L, t0 + 120L),
      (1L, t0 + 1000L), (1L, t0 + 1030L),
      (2L, t0 + 500L)).toDF("user", "s")
      .select(col("user"), timestamp_seconds(col("s")).as("ts"))
    // two sentinel batches push the watermark far past every gap so
    // all real sessions time out and emit
    val b = Seq((99L, t0 + 90000L)).toDF("user", "s")
      .select(col("user"), timestamp_seconds(col("s")).as("ts"))
    val c = Seq((99L, t0 + 180000L)).toDF("user", "s")
      .select(col("user"), timestamp_seconds(col("s")).as("ts"))
    a.coalesce(1).write.parquet(s"$dir/f0")
    b.coalesce(1).write.parquet(s"$dir/f1")
    c.coalesce(1).write.parquet(s"$dir/f2")

    val stream = spark.readStream.schema(a.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/f*")
    val sess = Streaming.sessionizeStream(stream, "ts", "user",
      gap = "5 minutes", watermarkDur = "1 minute")
    val q = sess.writeStream.outputMode("append")
      .format("memory").queryName("sess_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.sql(
      "SELECT user, start_ms, end_ms, n_events FROM sess_stream WHERE user < 99")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = Set(
      (1L, (t0 + 0L) * 1000, (t0 + 120L) * 1000, 3L),
      (1L, (t0 + 1000L) * 1000, (t0 + 1030L) * 1000, 2L),
      (2L, (t0 + 500L) * 1000, (t0 + 500L) * 1000, 1L))
    assert(got === want)
  }

  test("streaming politeness limiter spaces same-domain fetches across batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pol_stream").toString
    val t0 = 1704067200L
    // batch 1: hot domain bursts 3 requests at the same second plus one
    // at +5 s; cold domain one request. minGap 10 s.
    val a = Seq(
      ("hot", "u1", t0 + 0L), ("hot", "u2", t0 + 0L), ("hot", "u3", t0 + 0L),
      ("hot", "u4", t0 + 5L), ("cold", "c1", t0 + 0L))
      .toDF("domain", "url", "s")
      .select(col("domain"), col("url"), timestamp_seconds(col("s")).as("ts"))
    // batch 2: a hot request AFTER the gate from batch 1 state
    val b = Seq(("hot", "u5", t0 + 31L)).toDF("domain", "url", "s")
      .select(col("domain"), col("url"), timestamp_seconds(col("s")).as("ts"))
    a.coalesce(1).write.parquet(s"$dir/f0")
    b.coalesce(1).write.parquet(s"$dir/f1")
    val stream = spark.readStream.schema(a.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/f*")
    val slots = Streaming.politenessStream(stream, "ts", "url", "domain",
      minGap = "10 seconds", watermarkDur = "1 minute")
    val q = slots.writeStream.outputMode("append")
      .format("memory").queryName("pol_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT url, fetch_ms FROM pol_stream")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val ms = 1000L
    // in-batch order is (ts, url): u1@0, u2 deferred to +10, u3 to +20,
    // u4 (req +5) to +30; cold unaffected; batch-2 u5 (req +31) lands
    // at +40 because the persisted gate says next free = +40.
    assert(got === Map(
      "u1" -> (t0 + 0L) * ms, "u2" -> (t0 + 10L) * ms,
      "u3" -> (t0 + 20L) * ms, "u4" -> (t0 + 30L) * ms,
      "c1" -> (t0 + 0L) * ms, "u5" -> (t0 + 40L) * ms))
    // politeness invariant: same-domain fetches >= minGap apart
    val hot = got.filterKeys(_.startsWith("u")).values.toSeq.sorted
    assert(hot.sliding(2).forall(p => p.length < 2 || p(1) - p(0) >= 10L * ms))
  }

  test("stateful running cell envelope") {
    val obs = Seq(
      Streaming.CellObs(1L, 0.0, 0.0), Streaming.CellObs(1L, 2.0, 3.0),
      Streaming.CellObs(2L, -5.0, -5.0)).toDS()
    // batch Dataset exercises the same mapGroupsWithState code path shape
    val grouped = obs.groupByKey(_.cell).mapGroups { (cell, rows) =>
      val rs = rows.toSeq
      Streaming.CellState(cell, rs.size,
        rs.map(_.lon).min, rs.map(_.lat).min, rs.map(_.lon).max, rs.map(_.lat).max)
    }.collect().sortBy(_.cell)
    assert(grouped(0) == Streaming.CellState(1L, 2, 0.0, 0.0, 2.0, 3.0))
    assert(grouped(1) == Streaming.CellState(2L, 1, -5.0, -5.0, -5.0, -5.0))
  }
}
