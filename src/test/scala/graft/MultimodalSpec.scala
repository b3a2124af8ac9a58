package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Unit properties of the stub perceptual hash and the banded near-dup
  * join: spatial sensitivity (reordered content hashes differently, the
  * property a global histogram lacks), hamming locality for small edits,
  * and the two-band pigeonhole's losslessness vs a brute-force scan. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("fakeAhash is spatially sensitive: reversal changes the hash") {
    // ramp: low bytes first, high bytes last -> top segments above mean
    val ramp = Array.tabulate(160)(i => (i / 2).toByte)
    val rev = ramp.reverse
    val a = Multimodal.fakeAhash(ramp)
    val b = Multimodal.fakeAhash(rev)
    assert(a != b)
    // the reversal mirrors the segment pattern: bit k of a == bit 15-k of b
    (0 until 16).foreach { k =>
      assert(((a >> k) & 1L) === ((b >> (15 - k)) & 1L), s"bit $k")
    }
  }

  test("fakeAhash: uniform payload sets no bits; empty payload hashes 0") {
    assert(Multimodal.fakeAhash(Array.fill(64)(7.toByte)) === 0L)
    assert(Multimodal.fakeAhash(Array.emptyByteArray) === 0L)
  }

  test("a single-segment perturbation moves few bits") {
    val base = Array.tabulate(320)(i => ((i * 37) % 251).toByte)
    val tweaked = base.clone()
    // inflate one 20-byte segment
    (40 until 60).foreach(i => tweaked(i) = 0xff.toByte)
    val d = java.lang.Long.bitCount(
      Multimodal.fakeAhash(base) ^ Multimodal.fakeAhash(tweaked))
    assert(d >= 1 && d <= 6, s"hamming $d")
  }

  test("interleave: slot mod 3 is the kind lane; per-kind slots step by 3 in a shard") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val media = (0L until 90L)
      .map(id => (id, Seq("image", "audio", "video")((id % 3).toInt)))
      .toDF("doc_id", "kind")
    val rows = Multimodal.interleaveModalities(media, shards = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val lane = Map("image" -> 0L, "audio" -> 1L, "video" -> 2L)
    rows.foreach { case (id, kind, _, slot) =>
      assert(slot % 3 === lane(kind), s"doc $id in wrong lane")
    }
    rows.groupBy(r => (r._3, r._2)).foreach { case ((shard, kind), grp) =>
      val slots = grp.sortBy(_._1).map(_._4)
      assert(slots === slots.indices.map(i => lane(kind) + 3L * i),
        s"shard $shard kind $kind slots not a stride-3 run: ${slots.toSeq}")
    }
  }

  test("real codec arm: a genuine PNG decodes to its exact luminance histogram") {
    // 4×2 grayscale PNG with known luminances: 0,64,128,255 twice over —
    // bins 0,2,4,7 get 2/8 = 0.25 each, everything else 0
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val lums = Array(0, 64, 128, 255)
    for (y <- 0 until 2; x <- 0 until 4) {
      val l = lums(x)
      img.setRGB(x, y, (l << 16) | (l << 8) | l)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(0L, "image", png, 4, 2, 0),
      Multimodal.MediaRow(1L, "audio", png, 0, 0, 16000))) // audio: stub arm
    val out = Multimodal.extractFeatures(ds, useRealCodec = true).collect()
      .map(f => f.doc_id -> f.features).toMap
    assert(out(0L).toSeq === Seq(0.25f, 0f, 0.25f, 0f, 0.25f, 0f, 0f, 0.25f))
    // non-image rows stay on the byte-histogram stub regardless of flag
    assert(out(1L).toSeq === Multimodal.fakeDecode(png).toSeq)
    // a non-decodable payload falls back to the stub, not a crash
    val junk = spark.createDataset(Seq(
      Multimodal.MediaRow(2L, "image", bytes("not a png"), 1, 1, 0)))
    val fb = Multimodal.extractFeatures(junk, useRealCodec = true).collect().head
    assert(fb.features.toSeq === Multimodal.fakeDecode(bytes("not a png")).toSeq)
  }

  test("imageRoundTrip: PNG encode→decode reproduces the analytic histogram") {
    import spark.implicits._
    val docs = spark.range(8).select(org.apache.spark.sql.functions.col("id").as("doc_id"))
    Multimodal.imageRoundTrip(docs).collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = (id % 16 + 8).toInt; val h = (id % 8 + 8).toInt
      assert(r.getAs[Int]("width") === w)
      assert(r.getAs[Int]("height") === h)
      assert(r.getAs[Int]("png_valid") === 1)
      val expect = new Array[Long](8)
      for (y <- 0 until h; x <- 0 until w)
        expect(((id * 31 + x * 7 + y * 13) % 256).toInt >> 5) += 1L
      val got = (0 until 8).map(b => r.getAs[Long](s"b$b"))
      assert(got === expect.toSeq, s"doc $id histogram mismatch")
    }
  }

  test("audioRoundTrip: WAV encode→decode reproduces the analytic stats") {
    import spark.implicits._
    val docs = spark.range(8).select(org.apache.spark.sql.functions.col("id").as("doc_id"))
    Multimodal.audioRoundTrip(docs).collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = (id % 512 + 256).toInt
      val samples = (0 until n).map(i => (id * 31 + i.toLong * 7919) % 65536 - 32768)
      assert(r.getAs[Int]("wav_valid") === 1, s"doc $id decode failed")
      assert(r.getAs[Long]("n_samples") === n.toLong)
      assert(r.getAs[Long]("s_min") === samples.min)
      assert(r.getAs[Long]("s_max") === samples.max)
      assert(r.getAs[Long]("s_sum") === samples.sum)
      assert(r.getAs[Long]("ord_chk") ===
        samples.zipWithIndex.map { case (s, i) => s * ((i % 31) + 1) }.sum,
        s"doc $id order checksum mismatch — frames reordered or dropped")
    }
  }

  test("engine WAV codec interoperates with javax.sound.sampled, both ways") {
    // r16: m09's codec is engine-native (the AudioSystem provider lock
    // serialized the fan-out). Interop is the honesty gate: (a) our
    // encoder's bytes must decode through the JDK's real WAV reader to
    // the same samples, and (b) the JDK encoder's bytes must decode
    // through our RIFF chunk walk — so the container is the WAV format,
    // not a private dialect.
    val n = 300
    val pcm = Array.tabulate[Byte](n * 2) { k =>
      val i = k / 2
      val s = (((7L * 31 + i.toLong * 7919) % 65536) - 32768).toInt
      if (k % 2 == 0) (s & 0xff).toByte else ((s >> 8) & 0xff).toByte
    }
    // (a) engine encode -> JDK decode
    val wav = Multimodal.wavEncodePcm16Mono(pcm, 8000)
    val back = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val bf = back.getFormat
    assert(bf.getSampleSizeInBits === 16 && bf.getChannels === 1 &&
      bf.getEncoding === javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
      !bf.isBigEndian && bf.getSampleRate === 8000f,
      s"JDK reader parsed a different format from the engine header: $bf")
    assert(back.readAllBytes().toSeq === pcm.toSeq,
      "JDK decode of the engine container altered the PCM payload")
    // (b) JDK encode -> engine decode
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val decoded = Multimodal.wavDecodePcm16Mono(baos.toByteArray)
    assert(decoded.nonEmpty, "engine decoder rejected a JDK-written WAV")
    assert(decoded.get._1 === 8000 && decoded.get._2.toSeq === pcm.toSeq,
      "engine decode of the JDK container altered rate or payload")
  }

  test("engine WAV decoder degrades malformed containers to None") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    assert(Multimodal.wavDecodePcm16Mono(junk).isEmpty, "junk accepted")
    assert(Multimodal.wavDecodePcm16Mono(Array.empty[Byte]).isEmpty)
    val good = Multimodal.wavEncodePcm16Mono(Array[Byte](1, 2, 3, 4), 8000)
    assert(Multimodal.wavDecodePcm16Mono(good).nonEmpty)
    // truncated data chunk: declared size runs past the buffer
    assert(Multimodal.wavDecodePcm16Mono(good.dropRight(2)).isEmpty,
      "truncated data chunk accepted")
    // stereo/8-bit/non-PCM fmt variants must be rejected, not misread
    val stereo = good.clone(); stereo(22) = 2
    assert(Multimodal.wavDecodePcm16Mono(stereo).isEmpty, "stereo accepted")
    val bits8 = good.clone(); bits8(34) = 8
    assert(Multimodal.wavDecodePcm16Mono(bits8).isEmpty, "8-bit accepted")
    val float = good.clone(); float(20) = 3
    assert(Multimodal.wavDecodePcm16Mono(float).isEmpty, "non-PCM accepted")
  }

  test("banded near-dup join == brute-force hamming<=1 scan") {
    import spark.implicits._
    val media = (0L until 60L).map { id =>
      Multimodal.MediaRow(id, "image",
        Array.tabulate(200)(i => (((i + id) * 31 + id * (i % 5)) % 256).toByte),
        64, 64, 0)
    }
    val ds = spark.createDataset(media)
    val got = Multimodal.phashNearDup(ds).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashes = media.map(m => m.doc_id -> Multimodal.fakeAhash(m.payload))
    val want = (for {
      (d1, h1) <- hashes; (d2, h2) <- hashes if d1 < d2
      if java.lang.Long.bitCount(h1 ^ h2) <= 1
    } yield (d1, d2)).toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture produced no near pairs — weak test")
  }
}
