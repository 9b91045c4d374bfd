package graft.llm

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Multimodal.{GvidCodec, PpmCodec, WavCodec}

/** Pure-JVM codec tests — no Spark. The DataFrame-level plumbing is covered
  * by LlmOpsSpec ("multimodal media frames decode ...") and the q29/q50
  * DuckDB oracles. */
class MultimodalSpec extends AnyFunSuite {

  test("PPM round-trip: encode then decode recovers dims, maxval, pixels") {
    val px = Array.tabulate(2 * 3 * 3)(i => (i * 7).toByte)
    val ppm = PpmCodec.decode(PpmCodec.encode(2, 3, px))
    assert((ppm.width, ppm.height, ppm.maxVal) === (2, 3, 255))
    assert(ppm.pixels.toSeq === px.toSeq)
  }

  test("PPM decode handles comments and arbitrary header whitespace") {
    val raster = Array.tabulate(6)(_.toByte)
    val header = "P6 # a comment\n# another full-line comment\n 2\t1 # dims done\n255\n"
    val ppm = PpmCodec.decode(header.getBytes(UTF_8) ++ raster)
    assert((ppm.width, ppm.height) === (2, 1))
    assert(ppm.pixels.toSeq === raster.toSeq)
  }

  test("PPM decode rejects malformed input loudly") {
    val ok = PpmCodec.encode(2, 1, Array.fill(6)(1.toByte))
    // wrong magic
    val badMagic = ok.clone(); badMagic(1) = '5'
    assertThrows[IllegalArgumentException](PpmCodec.decode(badMagic))
    // truncated raster
    assertThrows[IllegalArgumentException](PpmCodec.decode(ok.dropRight(1)))
    // 16-bit maxval (unsupported)
    assertThrows[IllegalArgumentException](
      PpmCodec.decode("P6\n1 1\n65535\n".getBytes(UTF_8) ++ Array.fill[Byte](3)(0)))
    // zero dims
    assertThrows[IllegalArgumentException](
      PpmCodec.decode("P6\n0 1\n255\n".getBytes(UTF_8)))
  }

  test("WAV round-trip: PCM16 mono samples and header survive") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345)
    val wav = WavCodec.decode(WavCodec.encode(samples, 44100))
    assert((wav.sampleRate, wav.nChannels, wav.bitsPerSample) === (44100, 1, 16))
    assert(wav.samples.toSeq === samples.toSeq)
  }

  test("WAV decoder walks past unknown chunks (LIST before data)") {
    val base = WavCodec.encode(Array[Short](7, -7, 300), 8000)
    // splice an odd-sized LIST chunk between fmt and data (ends at offset 36)
    val listBody = Array[Byte](1, 2, 3) // size 3 -> padded to 4 in the stream
    val chunk = java.nio.ByteBuffer.allocate(8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes(UTF_8)).putInt(listBody.length).put(listBody).put(0.toByte)
      .array()
    val spliced = base.take(36) ++ chunk ++ base.drop(36)
    val wav = WavCodec.decode(spliced)
    assert(wav.samples.toSeq === Seq[Short](7, -7, 300))
  }

  test("WAV round-trip survives the full byte range of document-derived samples") {
    // every possible text byte maps into [-32768, 32512] step 256
    val samples = (0 until 256).map(b => ((b - 128) * 256).toShort).toArray
    val wav = WavCodec.decode(WavCodec.encode(samples, 8000))
    assert(wav.samples.toSeq === samples.toSeq)
  }

  test("WAV decoder rejects non-PCM, bad framing, and overrunning chunks") {
    val ok = WavCodec.encode(Array[Short](1, 2), 8000)
    val notRiff = ok.clone(); notRiff(0) = 'X'
    assertThrows[IllegalArgumentException](WavCodec.decode(notRiff))
    // audioFormat = 3 (IEEE float) at offset 20
    val float32 = ok.clone(); float32(20) = 3
    assertThrows[IllegalArgumentException](WavCodec.decode(float32))
    // data chunk size overruns the file
    val overrun = ok.clone(); overrun(40) = 99
    assertThrows[IllegalArgumentException](WavCodec.decode(overrun))
  }

  test("PNG round-trip: ImageIO encode then decode recovers the exact raster") {
    import graft.llm.Multimodal.PngCodec
    val pixels = Array.tabulate(4 * 3 * 3)(i => ((i * 37 + 11) % 256).toByte)
    val png = PngCodec.encode(4, 3, pixels)
    assert(PngCodec.isPng(png), "encoded payload must carry the PNG signature")
    val back = PngCodec.decode(png)
    assert(back.width === 4 && back.height === 3 && back.maxVal === 255)
    assert(back.pixels.toSeq === pixels.toSeq, "PNG is lossless RGB — raster must survive")
  }

  test("sniffing decodeImage dispatches PNG vs PPM; rejects garbage loudly") {
    import graft.llm.Multimodal.{decodeImage, PngCodec}
    val pixels = Array.tabulate(2 * 2 * 3)(i => (i * 19).toByte)
    val asPng = decodeImage(PngCodec.encode(2, 2, pixels))
    val asPpm = decodeImage(PpmCodec.encode(2, 2, pixels))
    assert(asPng.pixels.toSeq === asPpm.pixels.toSeq)
    assert(asPng.width === asPpm.width && asPng.height === asPpm.height)
    // non-image bytes fail on the PPM branch's loud magic check
    val e = intercept[IllegalArgumentException](decodeImage("not an image".getBytes(UTF_8)))
    assert(e.getMessage.contains("magic"))
    // a PNG signature with a corrupt body fails on the PNG branch
    val broken = PngCodec.encode(2, 2, pixels).take(12)
    intercept[Exception](decodeImage(broken))
  }

  test("GVID round-trip: dims, frame count, and frame bytes survive") {
    val frames = Array.tabulate(3 * 4)(i => (i * 11).toByte) // 3 frames of 2x2
    val v = GvidCodec.decode(GvidCodec.encode(2, 2, frames))
    assert((v.width, v.height, v.nFrames) === (2, 2, 3))
    assert(v.frames.toSeq === frames.toSeq)
  }

  test("GVID decode rejects malformed input loudly") {
    val ok = GvidCodec.encode(2, 1, Array.fill(4)(7.toByte))
    val badMagic = ok.clone(); badMagic(2) = '2'
    assertThrows[IllegalArgumentException](GvidCodec.decode(badMagic))
    assertThrows[IllegalArgumentException](GvidCodec.decode(ok.dropRight(1)))
    assertThrows[IllegalArgumentException](
      GvidCodec.decode("GV1\n0 1 1\n".getBytes(UTF_8)))
    assertThrows[IllegalArgumentException](
      GvidCodec.encode(2, 1, Array.fill(3)(0.toByte))) // not a whole frame
    // geometry whose Int product wraps (each value under the per-value cap)
    // must fail the truncation check loudly, not pass with a wrapped `need`
    val wrapped = GvidCodec.decode _
    val e = intercept[IllegalArgumentException](
      wrapped(("GV1\n100000 100000 10\n" + "x" * 64).getBytes(UTF_8)))
    assert(e.getMessage.contains("truncated frames"), e.getMessage)
  }
}
