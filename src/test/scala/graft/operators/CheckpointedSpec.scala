package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

class CheckpointedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("ckpt").toString
    d
  }

  private def stage = {
    // deterministic synthetic stage output
    spark.range(10000).toDF("id")
      .withColumn("v", pmod(col("id") * 2654435761L, lit(1000000L)))
  }

  test("first run computes all buckets; rerun is a pure resume") {
    val dir = freshDir()
    val r1 = Checkpointed.run(stage, col("id"), 8, dir)
    assert(r1.computed.sorted == (0 until 8))
    assert(r1.metas.map(_.rows).sum == 10000L)

    val r2 = Checkpointed.run(stage, col("id"), 8, dir)
    assert(r2.computed.isEmpty, "second run must be a no-op resume")
    assert(r2.metas == r1.metas, "lineage metadata must be stable")

    val back = Checkpointed.read(spark, dir, 8)
    assert(back.count() == 10000)
    // checksum lineage matches a recomputed checksum of the read-back data
    val expect = stage.withColumn("__h", xxhash64(col("id"), col("v")))
      .agg(bit_xor(col("__h"))).first().getLong(0)
    val got = back.withColumn("__h", xxhash64(col("id"), col("v")))
      .agg(bit_xor(col("__h"))).first().getLong(0)
    assert(got == expect)
  }

  test("stage input is scanned exactly once (validation+metrics fused into the write)") {
    val dir = freshDir()
    val acc = spark.sparkContext.longAccumulator("scan-counter")
    // nondeterministic marker stops CollapseProject from inlining the
    // udf into multiple downstream expressions (which would double-count)
    val counting = udf { (id: Long) => acc.add(1L); id }.asNondeterministic()
    val df = spark.range(5000).toDF("id")
      .withColumn("v", counting(col("id")))
    Checkpointed.run(df, col("id"), 4, dir)
    // round 2 scanned three times (validate / write / metrics) => 15000
    assert(acc.value == 5000L,
      s"expected one pass over 5000 rows, saw ${acc.value}")
  }

  test("invalid bucket values fail the write job itself, not a pre-pass") {
    val dir = freshDir()
    val df = spark.range(100).toDF("id")
    val bad = when(col("id") === 57, lit(null).cast("int"))
      .otherwise(pmod(col("id"), lit(4)).cast("int"))
    val e = intercept[Exception] {
      Checkpointed.runKeyed(df, bad, 4, dir)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("checkpoint manifest")),
      s"unexpected failure: ${msgs(e).mkString(" | ")}")
    // nothing was committed
    val r = Checkpointed.run(spark.range(100).toDF("id"), col("id"), 4, dir)
    assert(r.computed.sorted == (0 until 4))
  }

  test("losing buckets triggers partial recompute only, same bytes") {
    val dir = freshDir()
    val r1 = Checkpointed.run(stage, col("id"), 8, dir)
    val keepMeta = r1.metas.map(m => m.bucket -> m).toMap

    // simulate loss of two buckets (crash before manifest commit)
    for (k <- Seq(2, 5)) {
      Files.delete(Paths.get(dir, "_manifest", s"bucket-$k.json"))
      val d = Paths.get(dir, "data", s"__bucket=$k")
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }

    val r2 = Checkpointed.run(stage, col("id"), 8, dir)
    assert(r2.computed.sorted == Seq(2, 5), s"recomputed ${r2.computed}")
    // recomputed buckets carry identical lineage (determinism)
    for (k <- Seq(2, 5)) {
      val m = r2.metas.find(_.bucket == k).get
      assert(m.rows == keepMeta(k).rows && m.checksum == keepMeta(k).checksum)
    }
    assert(Checkpointed.read(spark, dir, 8).count() == 10000)
  }

  test("interrupted write (stale partial data, no manifest) is repaired") {
    val dir = freshDir()
    Checkpointed.run(stage, col("id"), 4, dir)
    // fake a crashed run: bucket data present but manifest missing AND
    // data corrupted (extra junk file)
    Files.delete(Paths.get(dir, "_manifest", "bucket-1.json"))
    Files.write(Paths.get(dir, "data", "__bucket=1", "junk.bin"), Array[Byte](1, 2, 3))
    val r = Checkpointed.run(stage, col("id"), 4, dir)
    assert(r.computed == Seq(1))
    assert(!Files.exists(Paths.get(dir, "data", "__bucket=1", "junk.bin")),
      "stale partial must be replaced atomically")
    assert(Checkpointed.read(spark, dir, 4).count() == 10000)
  }
}
