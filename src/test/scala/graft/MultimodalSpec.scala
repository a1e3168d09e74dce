package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.file.Files

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaItem

class MultimodalSpec extends SparkSpec {

  private def pngBytes(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Minimal RIFF/WAVE container around 16-bit PCM mono samples. */
  private def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  test("decodeImage reads a real PNG: dimensions and exact luminance stats") {
    // left half black (lum 0), right half white (lum 255)
    val bytes = pngBytes(8, 4)((x, _) => if (x < 4) 0x000000 else 0xffffff)
    val f = Multimodal.decodeImage(MediaItem(1L, bytes, "png", -1, -1)).get
    assert(f.kind === "image")
    assert((f.width, f.height) === (8, 4))
    assert(f.mean_byte === 127.5) // (0*16 + 255*16) / 32
    assert(f.byte_entropy === 1.0) // two equiprobable luminance values
    assert(f.features(0) === 0.5f && f.features(7) === 0.5f)
  }

  test("decodeWav parses PCM16: rate, channels, amplitude stats") {
    // constant amplitude 12800 -> |s|>>7 = 100
    val f = Multimodal.decodeWav(MediaItem(2L,
      wavBytes(16000, Array.fill[Short](100)(12800)), "wav", -1, -1)).get
    assert(f.kind === "audio")
    assert((f.width, f.height) === (16000, 1)) // sample rate, channels
    assert(f.mean_byte === 100.0)
    assert(f.byte_entropy === 0.0) // single amplitude symbol
  }

  test("dispatch: corrupt image bytes degrade to kind=raw, not an error") {
    val f = Multimodal.decode(MediaItem(3L, Array[Byte](1, 2, 3), "png", -1, -1))
    assert(f.kind === "raw")
    assert(f.n_bytes === 3)
  }

  test("a negative RIFF chunk size terminates (no loop) and degrades to raw") {
    // valid RIFF/WAVE preamble, then a chunk declaring size 0xFFFFFFFF
    val evil = wavBytes(8000, Array.fill[Short](4)(1))
    evil(16) = -1; evil(17) = -1; evil(18) = -1; evil(19) = -1 // fmt size
    val f = Multimodal.decode(MediaItem(9L, evil, "wav", -1, -1))
    assert(f.kind === "raw")
  }

  test("binaryFile -> extractFeatures decodes real media end-to-end") {
    val dir = Files.createTempDirectory("graft-realmedia")
    Files.write(dir.resolve("img.png"),
      pngBytes(5, 5)((_, _) => 0x808080))
    Files.write(dir.resolve("tone.wav"),
      wavBytes(8000, Array.tabulate[Short](50)(i => if (i % 2 == 0) 6400 else -6400)))
    Files.write(dir.resolve("blob.bin"), Array[Byte](9, 9, 9))

    val feats = Multimodal.extractFeatures(
        Multimodal.mediaFromBinaryFiles(spark, dir.toString))
      .collect().map(f => f.kind -> f).toMap
    assert(feats.keySet === Set("image", "audio", "raw"))
    assert(feats("image").width === 5)
    // gray 0x808080: lum = (299+587+114)*128/1000 = 128
    assert(feats("image").mean_byte === 128.0)
    assert(feats("audio").width === 8000)
    assert(feats("audio").mean_byte === 50.0) // 6400 >> 7
    assert(feats("raw").n_bytes === 3)
  }

  test("dHash: real PNG — stable under brightness shift, flipped by mirror") {
    // horizontal gradient: luminance rises left->right, so every dHash
    // bit is 1 (cell c < cell c+1)
    def gradient(shift: Int) = pngBytes(90, 80)((x, _) => {
      val v = math.min(255, x * 2 + shift); (v << 16) | (v << 8) | v
    })
    def h(b: Array[Byte]) =
      Multimodal.dHash(MediaItem(0L, b, "png", -1, -1))
    val (h0, k0) = h(gradient(0))
    assert(k0 === "image")
    assert(h0 === -1L) // all 64 gradient bits set
    // +10 brightness changes every byte of the file but no gradient
    // direction: identical hash
    val (h1, _) = h(gradient(10))
    assert(java.lang.Long.bitCount(h0 ^ h1) === 0)
    // mirrored gradient reverses every comparison: all bits clear
    val mirrored = pngBytes(90, 80)((x, _) => {
      val v = math.min(255, (89 - x) * 2); (v << 16) | (v << 8) | v
    })
    assert(h(mirrored)._1 === 0L)
  }

  test("dHash byte fallback: deterministic, local-edit robust, empty = 0") {
    def h(b: Array[Byte]) = Multimodal.dHashBytes(b)
    assert(h(Array.emptyByteArray) === 0L)
    val base = Array.tabulate[Byte](720)(i => (i % 128).toByte)
    assert(h(base) === h(base.clone())) // pure function of content
    // one overwritten byte moves at most the two bits adjacent to its
    // cell
    val edited = base.clone(); edited(360) = 0
    assert(java.lang.Long.bitCount(h(base) ^ h(edited)) <= 2)
  }

  test("dHashNearDups: exact copies collapse, planted near-dup pairs, no false pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = Array.tabulate[Byte](720)(i => (i % 97).toByte)
    val aCopy = a.clone()
    val aEdit = a.clone(); aEdit(100) = 7 // near-dup of a, not identical
    val far = Array.tabulate[Byte](720)(i => ((i * 31) % 255).toByte)
    val media = Seq(
      (1L, a), (2L, aCopy), (3L, aEdit), (4L, far))
      .toDF("media_id", "content")
      .withColumn("format", lit("bin"))
      .withColumn("width", lit(-1)).withColumn("height", lit(-1))
    val r = Multimodal.dHashNearDups(media, maxDist = 3)
    // 1 and 2 are byte-identical: one cluster of 2, rep = 1
    val clusters = r.copyClusters.collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(clusters(1L) === 2L && clusters(3L) === 1L && clusters(4L) === 1L)
    assert(!clusters.contains(2L))
    // the only near-dup pair among representatives is (1, 3)
    val pairs = r.pairs.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs === Set((1L, 3L)))
  }

  test("dHashNearDups hot-chunk cap bounds a solid-color degenerate bucket") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 8 byte-DISTINCT solid payloads (different fill values / lengths)
    // all dHash to 0 — the exact degenerate population the cap exists
    // for: sha256 dedup cannot collapse them, and every one of their
    // pigeonhole chunks is the same (c, 0) key.
    val solids = (10L to 17L).map(i =>
      (i, Array.fill[Byte](700 + 4 * i.toInt)((i % 7).toByte)))
    val a = Array.tabulate[Byte](720)(i => (i % 97).toByte)
    val aEdit = a.clone(); aEdit(100) = 7
    val media = (solids ++ Seq((1L, a), (3L, aEdit)))
      .toDF("media_id", "content")
      .withColumn("format", lit("bin"))
      .withColumn("width", lit(-1)).withColumn("height", lit(-1))
    def pairSet(r: Multimodal.MediaNearDups) =
      r.pairs.select("id_a", "id_b").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val uncapped = pairSet(Multimodal.dHashNearDups(media, maxDist = 3))
    assert(uncapped === Set((1L, 3L)) ++
      (for (x <- 10L to 17L; y <- 10L to 17L if x < y) yield (x, y)).toSet,
      "uncapped finds the planted pair plus all 28 solid-color pairs")
    val capped = pairSet(Multimodal.dHashNearDups(media, maxDist = 3,
      maxBucketSize = 5))
    assert(capped === Set((1L, 3L)),
      "cap drops the degenerate solid-color cluster, keeps the real pair")
    assert(capped.subsetOf(uncapped))
  }

  test("frameStats: frame boundaries, short tail frame, exact means") {
    import spark.implicits._
    // 10 bytes at frame size 4 -> frames of 4, 4, 2
    val media = Seq((1L, Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100),
        "fake/raw", 1, 1))
      .toDF("media_id", "content", "format", "width", "height")
    val got = Multimodal.frameStats(media, frameSize = 4)
      .collect().map(r => r.getInt(1) -> (r.getInt(2), r.getDouble(3))).toMap
    assert(got === Map(
      0 -> ((4, 25.0)),   // (10+20+30+40)/4
      1 -> ((4, 65.0)),   // (50+60+70+80)/4
      2 -> ((2, 95.0))))  // (90+100)/2
  }
}
