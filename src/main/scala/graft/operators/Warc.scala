package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500 — the Common Crawl container format)
  * record assembly and parsing.
  *
  * A WARC file is a plain concatenation of records; each record is a
  * version line, named header fields, a blank line, then EXACTLY
  * `Content-Length` bytes of block, then CRLF CRLF. For `response`
  * records the block is an HTTP/1.1 message (status line, headers,
  * blank line, body). The parser below is byte-counted, never
  * split-on-separator: bodies legally contain "\r\n\r\n" and
  * "WARC/1.0", and only the Content-Length walk survives that (the
  * test corpus plants both traps).
  *
  * Scale shape: one blob (a WARC segment of many records) is one row;
  * parsing is a per-partition flatMap over the binary column — no
  * shuffle, no driver involvement, linear in bytes. That is exactly
  * how a 100 TB crawl read runs: parquet/object-store splits carry
  * whole segments, each task walks its own records.
  *
  * Malformed tails (truncated version line, bad Content-Length,
  * overrunning block) terminate that blob's walk cleanly — a 10^12-row
  * job must degrade per-record, never throw per-task.
  */
object Warc {

  val recordSchema: StructType = StructType(Seq(
    StructField("rec_idx", IntegerType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("http_status", IntegerType),
    StructField("content_length", LongType),
    StructField("payload", StringType)))

  private val CRLF = "\r\n".getBytes("US-ASCII")

  private def indexOfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == CRLF(0) && b(i + 1) == CRLF(1)) return i
      i += 1
    }
    -1
  }

  /** Parse one concatenated-record WARC blob into records. */
  def parse(bytes: Array[Byte]): Seq[Row] = {
    if (bytes == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    var pos = 0
    var idx = 0
    while (pos < bytes.length) {
      // version line
      val vEnd = indexOfCrlf(bytes, pos)
      if (vEnd < 0) return out.toSeq
      val version = new String(bytes, pos, vEnd - pos, "US-ASCII")
      if (!version.startsWith("WARC/")) return out.toSeq
      pos = vEnd + 2
      // WARC named fields until blank line
      var wtype: String = null; var uri: String = null
      var date: String = null; var clen = -1L
      var headersOk = true
      var blank = false
      while (!blank && headersOk) {
        val hEnd = indexOfCrlf(bytes, pos)
        if (hEnd < 0) headersOk = false
        else if (hEnd == pos) { blank = true; pos += 2 }
        else {
          val line = new String(bytes, pos, hEnd - pos, "US-ASCII")
          val ci = line.indexOf(':')
          if (ci > 0) {
            val k = line.substring(0, ci).trim.toLowerCase
            val v = line.substring(ci + 1).trim
            k match {
              case "warc-type"       => wtype = v
              case "warc-target-uri" => uri = v
              case "warc-date"       => date = v
              case "content-length"  =>
                clen = try v.toLong catch { case _: NumberFormatException => -1L }
              case _ => ()
            }
          }
          pos = hEnd + 2
        }
      }
      if (!headersOk || clen < 0 || pos + clen > bytes.length) return out.toSeq
      // the block: for response records, an HTTP/1.1 message
      var status: Integer = null
      var payload: String = null
      val blockEnd = pos + clen.toInt
      val sEnd = indexOfCrlf(bytes, pos)
      if (sEnd >= 0 && sEnd < blockEnd) {
        val statusLine = new String(bytes, pos, sEnd - pos, "US-ASCII")
        val parts = statusLine.split(" ")
        if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
          status = try Integer.valueOf(parts(1).toInt)
                   catch { case _: NumberFormatException => null }
        // HTTP headers end at the first blank line INSIDE the block;
        // everything after is body, taken by byte count (bodies may
        // contain further blank lines)
        var hp = sEnd + 2
        var bodyStart = -1
        while (bodyStart < 0 && hp < blockEnd) {
          val he = indexOfCrlf(bytes, hp)
          if (he < 0 || he >= blockEnd) hp = blockEnd
          else if (he == hp) bodyStart = hp + 2
          else hp = he + 2
        }
        if (bodyStart >= 0 && bodyStart <= blockEnd)
          payload = new String(bytes, bodyStart, blockEnd - bodyStart, "UTF-8")
      }
      out += Row(idx, wtype, uri, date, status, clen, payload)
      idx += 1
      pos = blockEnd
      // record separator CRLF CRLF
      if (pos + 4 <= bytes.length &&
          bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
          bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n') pos += 4
      else return out.toSeq
    }
    out.toSeq
  }

  /** Explode a (keys..., warc binary) DataFrame into one row per
    * record: input columns + the fields of [[recordSchema]].
    */
  def records(df: DataFrame, blobCol: String): DataFrame = {
    val keep = df.schema.fields.filterNot(_.name == blobCol)
    val outSchema = StructType(keep ++ recordSchema.fields)
    val binIdx = df.schema.fieldIndex(blobCol)
    val keepIdx = keep.map(f => df.schema.fieldIndex(f.name))
    implicit val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { iter =>
      iter.flatMap { r =>
        val prefix = keepIdx.map(r.get).toSeq
        parse(r.getAs[Array[Byte]](binIdx)).map(rec =>
          Row.fromSeq(prefix ++ rec.toSeq))
      }
    }
  }

  /** Deterministic WARC writer — the inverse the parser is gated on:
    * `records(assemble(docs)) == docs` field-for-field. One record per
    * input row; Content-Length is the true byte length of the HTTP
    * block. Pure Column expressions, so the SQL oracle rebuilds the
    * same bytes with string concatenation.
    */
  def responseRecord(uri: org.apache.spark.sql.Column,
                     date: org.apache.spark.sql.Column,
                     statusLine: org.apache.spark.sql.Column,
                     body: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val http = concat(statusLine, lit("\r\nContent-Type: text/html\r\n\r\n"), body)
    concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: "), date,
      lit("\r\nContent-Length: "), octet_length(http).cast("string"),
      lit("\r\n\r\n"), http, lit("\r\n\r\n"))
  }
}
