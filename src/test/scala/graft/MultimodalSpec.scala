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
