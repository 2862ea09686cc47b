package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpointed stage execution with per-partition lineage + metrics
  * and idempotent resume — the north rule's recoverability contract.
  *
  * A stage's output is split into `nBuckets` deterministic buckets
  * (hash of a caller-chosen key). Each bucket commits independently:
  *
  *   outDir/data/__bucket=k/...parquet      (written to a temp dir,
  *                                           atomically renamed)
  *   outDir/_manifest/bucket-k.json         (created AFTER data rename;
  *                                           presence = committed)
  *
  * Re-running the same stage computes ONLY buckets with no manifest
  * entry, in one filtered pass. Because bucket assignment is a pure
  * hash of row keys and the synthesis/inputs are deterministic, a
  * retried or resumed run produces byte-identical buckets — the
  * idempotence the 10^12-row job needs under task retries and driver
  * restarts. The manifest entry carries the lineage/metrics fields:
  * row count, order-independent xxhash64 checksum, wall time, and the
  * stage epoch.
  *
  * (Iceberg would supply the manifest/atomic-commit machinery on a
  * real cluster; this is the same commit protocol on plain parquet,
  * which is what the zero-egress sandbox has.)
  */
object Checkpointed {

  final case class BucketMeta(bucket: Int, rows: Long, checksum: Long, wallMs: Long)

  /** Result of a run: per-bucket metas (all buckets) plus which buckets
    * this invocation actually computed (empty on a pure resume).
    */
  final case class StageResult(metas: Seq[BucketMeta], computed: Seq[Int])

  private def manifestDir(outDir: String) = Paths.get(outDir, "_manifest")
  private def bucketPath(outDir: String, k: Int) =
    Paths.get(outDir, "data", s"__bucket=$k")

  private def readMeta(outDir: String, k: Int): Option[BucketMeta] = {
    val p = manifestDir(outDir).resolve(s"bucket-$k.json")
    if (!Files.exists(p)) return None
    val s = new String(Files.readAllBytes(p), "UTF-8")
    def field(name: String): String =
      s.split("\"" + name + "\":")(1).split("[,}]")(0).trim
    Some(BucketMeta(k, field("rows").toLong, field("checksum").toLong,
      field("wallMs").toLong))
  }

  private def writeMeta(outDir: String, m: BucketMeta): Unit = {
    Files.createDirectories(manifestDir(outDir))
    val tmp = manifestDir(outDir).resolve(s".bucket-${m.bucket}.json.tmp")
    val fin = manifestDir(outDir).resolve(s"bucket-${m.bucket}.json")
    Files.write(tmp,
      s"""{"bucket":${m.bucket},"rows":${m.rows},"checksum":${m.checksum},"wallMs":${m.wallMs}}"""
        .getBytes("UTF-8"))
    Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Run (or resume) a checkpointed stage. `df` must be deterministic
    * (same rows on recompute); `bucketKey` is any stable column.
    * Returns all bucket metas + the set recomputed by THIS call.
    */
  def run(df: DataFrame, bucketKey: Column, nBuckets: Int,
          outDir: String): StageResult =
    runWith(df, pmod(xxhash64(bucketKey), lit(nBuckets)).cast("int"), nBuckets, outDir)

  /** Variant where the caller supplies the bucket index column directly
    * (must already be in [0, nBuckets)).
    */
  def runKeyed(df: DataFrame, bucketIdx: Column, nBuckets: Int,
               outDir: String): StageResult =
    runWith(df, bucketIdx.cast("int"), nBuckets, outDir)

  private def runWith(df: DataFrame, bucketCol: Column, nBuckets: Int,
                      outDir: String): StageResult = {
    Files.createDirectories(Paths.get(outDir, "data"))
    val existing = (0 until nBuckets).flatMap(k => readMeta(outDir, k))
    val have = existing.map(_.bucket).toSet
    val missing = (0 until nBuckets).filterNot(have)
    if (missing.isEmpty) return StageResult(existing.sortBy(_.bucket), Nil)

    // Recoverability contract: every input row must land in exactly one
    // manifest-tracked bucket. A null or out-of-range bucket index would
    // be silently dropped by the isin() filter below (or land in a
    // __HIVE_DEFAULT_PARTITION__ the manifest never records). Round 2
    // validated with a separate bad.limit(1).count() job — a FULL extra
    // scan of the input in the (always-taken) clean path, and with a
    // nondeterministic source the rows validated were not the rows
    // later written. Instead the bucket expression itself raises inside
    // the write job: validation, metrics, and the write are ONE pass
    // over one set of rows.
    val checkedBucket = when(
      bucketCol.isNull || bucketCol < 0 || bucketCol >= nBuckets,
      raise_error(concat(
        lit(s"bucket column produced null or out-of-[0,$nBuckets) value '"),
        coalesce(bucketCol.cast("string"), lit("null")),
        lit("' — rows would be lost from the checkpoint manifest")))
        .cast("int"))
      .otherwise(bucketCol)
    val withBucket = df.withColumn("__bucket", checkedBucket)
    val todo = withBucket.filter(col("__bucket").isin(missing: _*))

    // lineage metrics per bucket, collected IN the write pass via
    // observe(): row count + order-independent checksum over the full
    // row content (bit_xor of per-row hashes: commutative, associative,
    // overflow-free under ANSI mode). One filtered aggregate pair per
    // missing bucket; the helper __h column is observed below the
    // projection that drops it, so it is never written.
    val hashCols = df.columns.map(col)
    val obs = org.apache.spark.sql.Observation(s"graft-ckpt-${java.util.UUID.randomUUID()}")
    val obsAggs: Seq[Column] = missing.flatMap { k =>
      Seq(
        count(when(col("__bucket") === k, 1)).as(s"rows_$k"),
        coalesce(bit_xor(when(col("__bucket") === k, col("__h"))), lit(0L)).as(s"sum_$k"))
    }

    // one filtered pass: write all missing buckets into a temp area
    val t0 = System.nanoTime()
    val tmpRoot = Paths.get(outDir, s".inflight-${java.util.UUID.randomUUID()}")
    todo.withColumn("__h", xxhash64(hashCols: _*))
      .observe(obs, obsAggs.head, obsAggs.tail: _*)
      .drop("__h")
      .write.partitionBy("__bucket").parquet(tmpRoot.toString)
    val obsRow = obs.get
    val metrics = missing.map { k =>
      k -> (obsRow(s"rows_$k").asInstanceOf[Long], obsRow(s"sum_$k").asInstanceOf[Long])
    }.toMap
    val wallMs = (System.nanoTime() - t0) / 1000000

    // commit each bucket: atomic dir rename, THEN manifest entry
    val fresh = missing.map { k =>
      val src = tmpRoot.resolve(s"__bucket=$k")
      val dst = bucketPath(outDir, k)
      if (Files.exists(dst)) { // stale partial from a crashed run
        Files.walk(dst).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
      if (Files.exists(src))
        Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
      else
        Files.createDirectories(dst) // bucket genuinely empty
      val (rows, sum) = metrics.getOrElse(k, (0L, 0L))
      val m = BucketMeta(k, rows, sum, wallMs)
      writeMeta(outDir, m)
      m
    }
    // clean temp area remnants (_SUCCESS etc.)
    if (Files.exists(tmpRoot)) {
      Files.walk(tmpRoot).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    StageResult((existing ++ fresh).sortBy(_.bucket), missing)
  }

  /** Read a committed stage back (only manifest-committed buckets). */
  def read(spark: SparkSession, outDir: String, nBuckets: Int): DataFrame = {
    val committed = (0 until nBuckets)
      .filter(k => Files.exists(manifestDir(outDir).resolve(s"bucket-$k.json")))
      .map(k => bucketPath(outDir, k).toString)
      .filter { p =>
        val s = Files.list(Paths.get(p))
        try s.findFirst().isPresent finally s.close()
      }
    require(committed.nonEmpty, s"no committed buckets under $outDir")
    spark.read.parquet(committed: _*)
  }
}
