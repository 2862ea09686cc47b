package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** Header decoders against hand-assembled real container bytes. */
class MultimodalSpec extends AnyFunSuite {

  private def wav(ch: Int, sr: Int, bits: Int, dataLen: Int,
                  junkChunk: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Long): Unit =
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v.toInt).array())
    out.write("RIFF".getBytes); le32(36L + dataLen); out.write("WAVE".getBytes)
    if (junkChunk) { // a LIST chunk before fmt — the walk must skip it
      out.write("LIST".getBytes); le32(4); out.write("INFO".getBytes)
    }
    out.write("fmt ".getBytes); le32(16); le16(1); le16(ch); le32(sr)
    val byteRate = sr.toLong * ch * bits / 8
    le32(byteRate); le16(ch * bits / 8); le16(bits)
    out.write("data".getBytes); le32(dataLen)
    out.toByteArray
  }

  private def flac(ch: Int, sr: Int, bits: Int, total: Long): Array[Byte] = {
    val b = new Array[Byte](42)
    "fLaC".getBytes.copyToArray(b, 0)
    b(4) = 0x80.toByte; b(7) = 0x22
    b(8) = 0x10; b(10) = 0x10 // min/max block 4096
    val o = 18
    b(o) = (sr >> 12).toByte
    b(o + 1) = ((sr >> 4) & 0xFF).toByte
    b(o + 2) = (((sr & 0xF) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4)).toByte
    b(o + 3) = ((((bits - 1) & 0xF) << 4) | ((total >> 32) & 0xF).toInt).toByte
    b(o + 4) = ((total >> 24) & 0xFF).toByte
    b(o + 5) = ((total >> 16) & 0xFF).toByte
    b(o + 6) = ((total >> 8) & 0xFF).toByte
    b(o + 7) = (total & 0xFF).toByte
    b
  }

  private def ogg(ch: Int, sr: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("OggS".getBytes); out.write(0); out.write(2)
    out.write(new Array[Byte](20)) // granule + serial + seq + crc
    out.write(1); out.write(30)    // one segment
    out.write(1); out.write("vorbis".getBytes)
    out.write(new Array[Byte](4))  // version
    out.write(ch)
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(sr).array())
    out.toByteArray
  }

  test("WAV fmt/data chunk walk") {
    assert(Multimodal.decodeAudioMeta(wav(2, 44100, 16, 44100 * 4 * 3)) ===
      (("wav", 2, 44100, 16, 3000L)))
    // extra chunk before fmt
    assert(Multimodal.decodeAudioMeta(wav(1, 8000, 8, 8000, junkChunk = true)) ===
      (("wav", 1, 8000, 8, 1000L)))
  }

  test("FLAC STREAMINFO bit fields") {
    assert(Multimodal.decodeAudioMeta(flac(2, 48000, 24, 48000L * 7)) ===
      (("flac", 2, 48000, 24, 7000L)))
    assert(Multimodal.decodeAudioMeta(flac(1, 22050, 16, 11025L)) ===
      (("flac", 1, 22050, 16, 500L)))
  }

  test("Ogg Vorbis identification header") {
    assert(Multimodal.decodeAudioMeta(ogg(2, 44100)) === (("ogg", 2, 44100, 0, 0L)))
  }

  test("hostile/truncated audio payloads degrade to unknown") {
    assert(Multimodal.decodeAudioMeta(null)._1 === "unknown")
    assert(Multimodal.decodeAudioMeta(Array.empty[Byte])._1 === "unknown")
    assert(Multimodal.decodeAudioMeta("RIFFxxxxWAVE".getBytes)._1 === "unknown")
    assert(Multimodal.decodeAudioMeta("fLaC then junk that is far too short".getBytes.take(20))._1 === "unknown")
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      Multimodal.decodeAudioMeta(b) // must not throw
    }
    // truncating real payloads anywhere must not throw
    for (full <- Seq(wav(2, 44100, 16, 1000), flac(2, 48000, 16, 480L), ogg(1, 8000));
         n <- 0 to full.length)
      Multimodal.decodeAudioMeta(full.take(n))
  }

  test("image header decode (PNG/JPEG/GIF/WebP)") {
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val png = hex("89504E470D0A1A0A0000000D49484452" + "00000280" + "000001E0" + "0806000000")
    assert(Multimodal.decodeImageMeta(png) === ((640, 480, "png", png.length)))
    val gif = hex("474946383961" + "8002" + "E001" + "F70000")
    assert(Multimodal.decodeImageMeta(gif) === ((640, 480, "gif", gif.length)))
  }
}
