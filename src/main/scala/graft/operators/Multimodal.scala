package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `BINARY` columns
  * with a typed metadata struct, plus batch-shaped decode/feature-extract
  * over `mapPartitions`.
  *
  * The Spark-side plumbing is real — schema, partition-wise batched
  * processing, feature array output ready for [[Similarity]] — while the
  * actual codec is a clearly marked deterministic STUB ([[fakeDecode]]):
  * image/audio libraries are not available in this environment, and a real
  * deployment swaps `fakeDecode` for (e.g.) a JNI JPEG decoder without
  * touching any of the distribution logic. The fixture corpus has no
  * binary column, so media is synthesized from `documents.text` bytes —
  * deterministic and schema-faithful.
  *
  * Scale notes: payloads stay in executors end-to-end (no collect); decode
  * is a narrow per-partition pass, so it pipelines with the scan and
  * parallelizes with input splits. Partition sizing for ~MB-scale blobs is
  * controlled by `spark.sql.files.maxPartitionBytes`.
  */
object Multimodal {

  /** A media row: payload + typed metadata (what a real pipeline carries). */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
      features: Array[Float])

  /** Synthesize the media table: binary payload from text bytes, kind and
    * metadata derived deterministically from doc_id. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 32).cast("int").as("width"),
      (col("doc_id") % 480 + 32).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).cast("int").as("sample_rate"))

  /** STUB decoder: a real implementation would JPEG/PCM-decode `payload`;
    * this deterministic fake emits an 8-bin byte histogram, L1-normalized.
    * The *shape* (bytes → fixed-dim float vector, computed per partition
    * with no driver round-trip) is exactly what the real decoder needs. */
  private[graft] def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 5) += 1f; i += 1 }
    val n = math.max(payload.length, 1).toFloat
    var k = 0
    while (k < 8) { hist(k) /= n; k += 1 }
    hist
  }

  /** REAL image decode — JDK-built-in `javax.imageio` (PNG/BMP/GIF ship
    * with the JDK; no external libraries, headless-safe): payload →
    * BufferedImage → 8-bin LUMINANCE histogram (integer BT.601 weights
    * 299/587/114 over /1000, so a gray pixel (l,l,l) maps to exactly l),
    * L1-normalized — the same `bytes → fixed-dim float vector` contract
    * as [[fakeDecode]], so the two arms swap behind a flag without
    * touching any distribution logic. None when the payload is not a
    * decodable image (ImageIO returns null). */
  private[operators] def imageIoDecode(payload: Array[Byte]): Option[Array[Float]] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) None
    else {
      val hist = new Array[Float](8)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(lum >> 5) += 1f
          x += 1
        }
        y += 1
      }
      val n = math.max(img.getWidth * img.getHeight, 1).toFloat
      var k = 0
      while (k < 8) { hist(k) /= n; k += 1 }
      Some(hist)
    }
  }

  /** Batched per-partition decode/feature-extract. With
    * `useRealCodec = true`, image payloads go through the REAL
    * [[imageIoDecode]] (JDK ImageIO), falling back to the stub for
    * payloads ImageIO can't parse (the fixture corpus synthesizes
    * payloads from text bytes, which aren't PNGs — MultimodalSpec feeds
    * the real arm genuine PNGs); audio/video stay on the stub either
    * way (no JDK-built-in codec). Default is the stub: deterministic,
    * oracle-checkable (m02). */
  def extractFeatures(media: Dataset[MediaRow],
      useRealCodec: Boolean = false): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // partition = one batch; a real codec would allocate its native
      // context once here and reuse it across the iterator
      rows.map { r =>
        val feats =
          if (useRealCodec && r.kind == "image")
            imageIoDecode(r.payload).getOrElse(fakeDecode(r.payload))
          else fakeDecode(r.payload)
        MediaFeatures(r.doc_id, r.kind, r.payload.length, feats)
      }
    }
  }

  /** Dispose hoisted per-task ImageIO codec instances when the partition
    * iterator is exhausted (r15 ADVICE): mapPartitions returns a lazy
    * mapped iterator with no completion hook, so without this the codec
    * objects (which may hold native/heap buffers) linger on the executor
    * task thread until GC. */
  private def disposeOnExhaust[T](it: Iterator[T],
      wr: Option[javax.imageio.ImageWriter],
      rd: Option[javax.imageio.ImageReader]): Iterator[T] = new Iterator[T] {
    private var disposed = false
    def hasNext: Boolean = {
      val h = it.hasNext
      if (!h && !disposed) {
        disposed = true
        wr.foreach(w => try w.dispose() catch { case _: Exception => () })
        rd.foreach(r => try r.dispose() catch { case _: Exception => () })
      }
      h
    }
    def next(): T = it.next()
  }

  /** The real-codec certification arm (m08): synthesize a deterministic
    * grayscale image per document (pixel luminance
    * `(doc_id·31 + x·7 + y·13) mod 256`), ENCODE it to real PNG bytes
    * with ImageIO, DECODE those bytes back with [[imageIoDecode]]'s
    * machinery, and emit the per-bin luminance histogram as exact
    * integer counts. PNG is lossless on TYPE_INT_RGB, so
    * decode(encode(pixels)) == pixels — which the oracle certifies
    * ANALYTICALLY: DuckDB recomputes the histogram from the same pixel
    * formula without ever touching a PNG. Green == the real codec path
    * round-trips bit-exactly; a decoder that cropped, re-gamma'd, or
    * mis-sampled would shift bins and break the hash.
    *
    * Scale shape: one narrow mapPartitions pass, no shuffle at all —
    * codec work pipelines with the scan exactly like [[extractFeatures]]. */
  def imageRoundTrip(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // codec work is the whole cost of this operator and the scan plans
    // as one task on a small tier — fan out first (no-op at scale)
    graft.FanOut.cpuBound(docs.select(col("doc_id")), col("doc_id"))
      .as[Long].mapPartitions { ids =>
      // Heavyweight codec state ONCE PER TASK (guide §4.5): the
      // ImageIO.write/read conveniences do a synchronized registry
      // lookup per call and route streams through the registry's
      // disk-backed cache — under the cores-wide fan-out those
      // process-global locks serialize the tasks (measured: the fan-out
      // alone made this operator 2.7× SLOWER until the per-row lookups
      // were hoisted). One writer/reader per task, memory-cached
      // streams; a missing codec degrades every row of the task to
      // png_valid=0, the same visible data property as before.
      val wrOpt = try {
        val it = javax.imageio.ImageIO.getImageWritersByFormatName("png")
        if (it.hasNext) Some(it.next()) else None
      } catch { case _: Exception => None }
      val rdOpt = try {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName("png")
        if (it.hasNext) Some(it.next()) else None
      } catch { case _: Exception => None }
      disposeOnExhaust(ids.map { id =>
        val w = (id % 16 + 8).toInt
        val h = (id % 8 + 8).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val l = ((id * 31 + x * 7 + y * 13) % 256).toInt
            img.setRGB(x, y, (l << 16) | (l << 8) | l)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        val png: Array[Byte] = wrOpt match {
          case Some(wr) =>
            try {
              val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
              try {
                wr.setOutput(ios)
                wr.write(img)
              } finally {
                try ios.close() catch { case _: Exception => () }
                // reset in finally (r15 ADVICE, the GIF-path rule): a row
                // whose write throws is degraded to png_valid=0 — the
                // task-shared writer must not carry that row's
                // partially-written state into the next one
                try wr.reset() catch { case _: Exception => () }
              }
              baos.toByteArray
            } catch { case _: Exception => Array.empty[Byte] }
          case None => Array.empty[Byte]
        }
        // a failed decode reports png_valid=0 with zero bins instead of
        // NPEing the task (the ImageIO.read null-return contract, kept)
        val back: java.awt.image.BufferedImage =
          if (png.isEmpty) null
          else rdOpt match {
            case Some(rd) =>
              try {
                val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
                  new java.io.ByteArrayInputStream(png))
                try { rd.setInput(iis); rd.read(0) }
                finally {
                  try rd.reset() catch { case _: Exception => () }
                  try iis.close() catch { case _: Exception => () }
                }
              } catch { case _: Exception => null }
            case None => null
          }
        val hist = new Array[Long](8)
        if (back != null) {
          var yy = 0
          while (yy < back.getHeight) {
            var xx = 0
            while (xx < back.getWidth) {
              val rgb = back.getRGB(xx, yy)
              val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              hist(lum >> 5) += 1L
              xx += 1
            }
            yy += 1
          }
        }
        (id, w, h, if (png.nonEmpty && back != null) 1 else 0,
          hist(0), hist(1), hist(2), hist(3), hist(4), hist(5), hist(6), hist(7))
      }, wrOpt, rdOpt)
    }.toDF("doc_id", "width", "height", "png_valid",
      "b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7")
  }

  /** ENCODE a 16-bit mono little-endian PCM payload into a canonical WAV
    * container: the 44-byte RIFF/WAVE header (16-byte PCM `fmt ` chunk)
    * over the raw sample bytes — the byte-for-byte layout of the WAV
    * spec (RIFF "WAVE" form, format tag 1 = PCM). Engine-native (r16
    * optimization, r15 verdict #3): `AudioSystem.write` funnels every
    * call through the JDK's process-global synchronized provider lookup,
    * which serialized the cores-wide fan-out; the container itself is 44
    * bytes of little-endian arithmetic. */
  private[graft] def wavEncodePcm16Mono(pcm: Array[Byte],
      sampleRate: Int): Array[Byte] = {
    val out = new Array[Byte](44 + pcm.length)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    tag(0, "RIFF"); le32(4, 36 + pcm.length); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16) // PCM fmt chunk is 16 bytes
    le16(20, 1) // format tag 1 = PCM
    le16(22, 1) // mono
    le32(24, sampleRate)
    le32(28, sampleRate * 2) // byte rate = rate * blockAlign
    le16(32, 2) // blockAlign = channels * bytesPerSample
    le16(34, 16) // bits per sample
    tag(36, "data"); le32(40, pcm.length)
    System.arraycopy(pcm, 0, out, 44, pcm.length)
    out
  }

  /** DECODE a WAV container: walk the RIFF chunk list (not a fixed
    * 44-byte offset — a conforming reader must skip unknown chunks like
    * `LIST`/`fact`), verify PCM signed 16-bit mono in the `fmt ` chunk,
    * and return (sampleRate, PCM bytes of the `data` chunk). None on any
    * malformed structure — the caller degrades the row, never throws. */
  private[graft] def wavDecodePcm16Mono(
      wav: Array[Byte]): Option[(Int, Array[Byte])] = {
    def u16(off: Int): Int = (wav(off) & 0xff) | ((wav(off + 1) & 0xff) << 8)
    def u32(off: Int): Long = (wav(off) & 0xffL) | ((wav(off + 1) & 0xffL) << 8) |
      ((wav(off + 2) & 0xffL) << 16) | ((wav(off + 3) & 0xffL) << 24)
    def tagAt(off: Int, s: String): Boolean =
      wav.length >= off + 4 && (0 until 4).forall(i => wav(off + i) == s.charAt(i).toByte)
    if (wav.length < 12 || !tagAt(0, "RIFF") || !tagAt(8, "WAVE")) return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (tag, channels, rate, bits)
    var data: Option[Array[Byte]] = None
    while (off + 8 <= wav.length && (fmt.isEmpty || data.isEmpty)) {
      val size = u32(off + 4)
      val body = off + 8
      if (size < 0 || body + size > wav.length) return None
      if (tagAt(off, "fmt ") && size >= 16)
        fmt = Some((u16(body), u16(body + 2), u32(body + 4).toInt, u16(body + 14)))
      else if (tagAt(off, "data"))
        data = Some(java.util.Arrays.copyOfRange(wav, body, body + size.toInt))
      off = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((1, 1, rate, 16)), Some(d)) => Some((rate, d))
      case _ => None
    }
  }

  /** The real-codec certification arm for AUDIO (m09) — m08's exact
    * pattern on the WAV container. Per document: synthesize a
    * deterministic 16-bit mono PCM waveform (sample i =
    * `(doc_id·31 + i·7919) mod 2¹⁶ − 2¹⁵`, full signed range,
    * `doc_id mod 512 + 256` samples at 8 kHz), ENCODE it to WAV
    * container bytes, DECODE those bytes back through a conforming RIFF
    * chunk walk, and recompute integer waveform stats from the decoded
    * samples. PCM WAV is lossless, so the oracle certifies ANALYTICALLY:
    * DuckDB recomputes min/max/sum and an order-sensitive checksum
    * Σ sᵢ·((i mod 31)+1) from the same formula without touching a WAV.
    * A decoder that dropped frames, byte-swapped, or re-biased
    * signedness breaks the hash; a failed decode reports wav_valid=0
    * (the m08 null-decode lesson) instead of throwing.
    *
    * Codec provenance (r16 optimization, r15 verdict #3): the encoder/
    * decoder are ENGINE-NATIVE ([[wavEncodePcm16Mono]]/
    * [[wavDecodePcm16Mono]]) rather than `javax.sound.sampled` — the
    * JDK's AudioSystem routes every write/read through a process-global
    * synchronized provider lookup with no hoistable per-task handle
    * (unlike ImageIO), which serialized the m08-style fan-out (measured
    * 3.2× slower in r15). The certified property is unchanged: real WAV
    * container bytes round-trip losslessly, gated value-level by the
    * oracle; MultimodalSpec additionally pins the container header and
    * cross-checks the engine decoder against AudioSystem off the hot
    * path.
    *
    * Scale shape: m08's — codec work fans out on bare doc ids
    * (FanOut.cpuBound, a no-op at scale where the scan carries ≥ cores
    * splits), one narrow mapPartitions pass, no payload-sized shuffle. */
  def audioRoundTrip(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    graft.FanOut.cpuBound(docs.select(col("doc_id")), col("doc_id"))
      .as[Long].mapPartitions { ids =>
      ids.map { id =>
        val n = (id % 512 + 256).toInt
        val pcm = new Array[Byte](n * 2) // little-endian signed 16-bit
        var i = 0
        while (i < n) {
          val s = (((id * 31 + i.toLong * 7919) % 65536) - 32768).toInt
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val stats =
          try {
            val wav = wavEncodePcm16Mono(pcm, 8000)
            wavDecodePcm16Mono(wav) match {
              case Some((_, bytes)) if bytes.length == n * 2 =>
                var mn = Long.MaxValue; var mx = Long.MinValue
                var sum = 0L; var chk = 0L
                var j = 0
                while (j < n) {
                  val lo = bytes(2 * j) & 0xff
                  val hi = bytes(2 * j + 1).toInt // sign-carrying
                  val s = ((hi << 8) | lo).toLong
                  if (s < mn) mn = s
                  if (s > mx) mx = s
                  sum += s
                  chk += s * ((j % 31) + 1)
                  j += 1
                }
                Some((n.toLong, mn, mx, sum, chk))
              case _ => None
            }
          } catch { case _: Exception => None }
        stats match {
          case Some((m, mn, mx, sum, chk)) => (id, m, 1, mn, mx, sum, chk)
          case None => (id, 0L, 0, 0L, 0L, 0L, 0L)
        }
      }
    }.toDF("doc_id", "n_samples", "wav_valid", "s_min", "s_max",
      "s_sum", "ord_chk")
  }

  /** The real-codec certification arm for FRAME SEQUENCES (m10) — what
    * m09 did for audio, one codec over (r11 verdict #6): the JDK ships a
    * real multi-frame GIF reader/writer in `javax.imageio`, so
    * video-shaped data gets a genuine container round trip instead of
    * the m03/m04 byte-block stand-in. Per document: synthesize
    * `doc_id % 3 + 2` deterministic 8×6 grayscale frames (luminance
    * `(doc_id·31 + f·17 + x·7 + y·13) mod 256` — ≤48 distinct colors per
    * frame, inside GIF's 256-entry palette, so the indexed encoding is
    * LOSSLESS), ENCODE them into one animated-GIF byte stream with
    * `prepareWriteSequence`/`writeToSequence`, DECODE it back frame by
    * frame, and recompute integer luminance stats from the decoded
    * pixels — the order-sensitive checksum weights both pixel AND frame
    * position, so a codec that reordered, dropped, or delta-composited
    * frames breaks the hash. The oracle recomputes the same stats
    * analytically from the formula (the m08/m09 gate). A failed decode
    * or frame-count mismatch reports gif_valid=0 instead of throwing.
    *
    * Scale shape: identical to m08/m09 — one narrow mapPartitions pass
    * over doc ids, codec work pipelines with the scan, zero shuffle. */
  def gifRoundTrip(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // codec work is the whole cost of this operator and the scan plans
    // as one task on a small tier — fan out first (no-op at scale)
    graft.FanOut.cpuBound(docs.select(col("doc_id")), col("doc_id"))
      .as[Long].mapPartitions { ids =>
      // Codec lookups hoisted ONCE PER TASK (guide §4.5, the m08
      // lesson): getImageWritersBySuffix / getImageReadersBySuffix /
      // createImage{Out,In}putStream all take the process-global
      // registry lock (and the stream factories consult the disk-backed
      // cache) — per-row they serialize the cores-wide fan-out. One
      // writer/reader per task, reset between rows, memory-cached
      // streams; a missing codec degrades the task's rows to
      // gif_valid=0 exactly like a per-row failure did.
      val wrOpt = try {
        val it = javax.imageio.ImageIO.getImageWritersBySuffix("gif")
        if (it.hasNext) Some(it.next()) else None
      } catch { case _: Exception => None }
      val rdOpt = try {
        val it = javax.imageio.ImageIO.getImageReadersBySuffix("gif")
        if (it.hasNext) Some(it.next()) else None
      } catch { case _: Exception => None }
      disposeOnExhaust(ids.map { id =>
        val w = 8; val h = 6
        val nf = (id % 3 + 2).toInt
        def lum(f: Int, x: Int, y: Int): Int =
          ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt
        // Frames are PRE-INDEXED into an explicit 256-gray palette
        // (r12 ADVICE): a TYPE_INT_RGB source leaves palettization to
        // the writer's internal quantizer — exact on this JDK only
        // because distinct colors ≤ 256, an undocumented behavior a
        // different JRE may not share. With an IndexColorModel raster
        // the writer never quantizes, so losslessness is by
        // construction, not by vendor luck. Encode failures degrade to
        // gif_valid=0 like decode failures — a codec gap must be a
        // visible data property, never a task kill.
        val gray = Array.tabulate[Byte](256)(_.toByte)
        val icm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
        val gif: Array[Byte] =
          try {
            val wr = wrOpt.getOrElse(throw new java.io.IOException("no gif writer"))
            val baos = new java.io.ByteArrayOutputStream()
            // memory-cached stream (no registry lock, no temp file); the
            // r13 ADVICE close-in-finally stands — and the task-shared
            // writer is reset() instead of disposed, so a failed row
            // cannot poison the next one's state
            val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
            try {
              wr.setOutput(ios)
              wr.prepareWriteSequence(null)
              var f = 0
              while (f < nf) {
                val img = new java.awt.image.BufferedImage(
                  w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
                val raster = img.getRaster
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    raster.setSample(x, y, 0, lum(f, x, y))
                    x += 1
                  }
                  y += 1
                }
                wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
                f += 1
              }
              wr.endWriteSequence()
            } finally {
              try ios.close() catch { case _: Exception => () }
              try wr.reset() catch { case _: Exception => () }
            }
            baos.toByteArray
          } catch { case _: Exception => Array.empty[Byte] }
        val stats =
          try {
            if (gif.isEmpty) throw new java.io.IOException("encode failed")
            val rd = rdOpt.getOrElse(throw new java.io.IOException("no gif reader"))
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(gif))
            try {
              rd.setInput(iis)
              val got = rd.getNumImages(true)
              if (got == nf) {
                var sum = 0L; var chk = 0L
                var ff = 0
                while (ff < got) {
                  val back = rd.read(ff)
                  if (back.getWidth == w && back.getHeight == h) {
                    var yy = 0
                    while (yy < h) {
                      var xx = 0
                      while (xx < w) {
                        val l = (back.getRGB(xx, yy) & 0xff).toLong
                        sum += l
                        chk += l * ((yy * w + xx) % 31 + 1) * (ff + 1)
                        xx += 1
                      }
                      yy += 1
                    }
                  }
                  ff += 1
                }
                Some((got.toLong, sum, chk))
              } else None
            } finally {
              try rd.reset() catch { case _: Exception => () }
              try iis.close() catch { case _: Exception => () }
            }
          } catch { case _: Exception => None }
        stats match {
          case Some((m, sum, chk)) => (id, m, 1, sum, chk)
          case None => (id, 0L, 0, 0L, 0L)
        }
      }, wrOpt, rdOpt)
    }.toDF("doc_id", "n_frames", "gif_valid", "lum_sum", "ord_chk")
  }

  /** Deterministic frame sampling for "video" payloads: every `stride`-th
    * 16-byte block stands in for a frame. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      r.payload.grouped(16).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (block, idx) => (r.doc_id, idx, block.length) }
    }.toDF("doc_id", "frame_idx", "frame_bytes")
  }

  /** Deterministic "resize" for image payloads: keep every `stride`-th
    * byte as the thumbnail — the stub stand-in for a real downscale (a
    * real deployment swaps the inner loop for an image-library resample;
    * the batched per-partition shape and the 1/stride output-size
    * contract are what the pipeline depends on). */
  def resize(media: Dataset[MediaRow], stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map { r =>
        val n = r.payload.length
        val thumbLen = (n + stride - 1) / stride
        var sum = 0L
        var i = 0
        while (i < n) { sum += (r.payload(i) & 0xff); i += stride }
        (r.doc_id, n, thumbLen, sum)
      }
    }.toDF("doc_id", "n_bytes", "thumb_bytes", "thumb_sum")
  }

  /** Byte-exact payload dedup: keeper = min doc_id per md5 of the RAW
    * binary payload — the multimodal sibling of [[Dedup.exactDedup]]
    * (which fingerprints normalized text; identical images/audio dedupe
    * on bytes, not on any normalization). Same bounded-memory shape:
    * shared-exchange aggregate + join, never a per-cluster window. */
  def payloadDedup(media: DataFrame): DataFrame = {
    val fps = media.select(col("doc_id"), md5(col("payload")).as("fp"))
      .repartition(col("fp"))
    val keepers = fps.groupBy(col("fp")).agg(min(col("doc_id")).as("keeper_id"))
    fps.join(keepers, "fp")
      .select(col("doc_id"), col("keeper_id"),
        (col("doc_id") =!= col("keeper_id")).as("is_dup"))
  }

  /** STUB perceptual hash (aHash shape): a real implementation decodes
    * the image and averages pixel blocks of the 4×4 downscale; this
    * deterministic fake splits the raw payload into 16 equal byte
    * segments ("pixels") and sets bit k iff segment k's byte sum is
    * strictly above the uniform share (`seg·16 > total` — exact integer
    * inequality, re-derivable by the oracle). Spatially sensitive, unlike
    * a global histogram — reordered content hashes differently. */
  private[graft] def fakeAhash(payload: Array[Byte]): Long = {
    val n = payload.length
    val seg = new Array[Long](16)
    var tot = 0L
    var i = 0
    while (i < n) {
      val b = payload(i) & 0xff
      seg((16L * i / n).toInt) += b
      tot += b
      i += 1
    }
    var ph = 0L
    var k = 0
    while (k < 16) { if (seg(k) * 16 > tot) ph |= 1L << k; k += 1 }
    ph
  }

  /** Perceptual-hash near-duplicate pairs over DECODED media — the
    * multimodal sibling of MinHash LSH (d02): exact payload dedup (m05)
    * misses re-encoded/resampled copies, which is what a perceptual hash
    * over decoded content catches ([[fakeAhash]] is the stub decode).
    *
    * Scale shape: candidate pairs come from a BANDED equi-join, not an
    * all-pairs scan — hamming ≤ 1 on 16 bits pigeonholes into "one of
    * the two 8-bit halves matches exactly", so each doc posts two band
    * keys and candidates join per (band, key) bucket. Hamming is
    * verified in-row on candidates (`bit_count(xor)`). The oracle is the
    * naive quadratic join with no knowledge of the banding — a green row
    * machine-checks the pigeonhole's losslessness, the d13 pattern. */
  def phashNearDup(media: Dataset[MediaRow], maxHamming: Int = 1): DataFrame = {
    require(maxHamming <= 1, "two 8-bit bands only cover hamming <= 1")
    import media.sparkSession.implicits._
    val hashed = media.mapPartitions { rows =>
      rows.map(r => (r.doc_id, fakeAhash(r.payload)))
    }.toDF("doc_id", "phash")
    val bands = hashed.select(col("doc_id"), col("phash"),
      explode(array(
        struct(lit(0).as("band"), col("phash").bitwiseAND(lit(255L)).as("bkey")),
        struct(lit(1).as("band"), shiftright(col("phash"), 8).as("bkey")))).as("e"))
      .select(col("doc_id"), col("phash"), col("e.band"), col("e.bkey"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("bit_count(a.phash ^ b.phash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Shard-parallel modality interleave — the deterministic round-robin
    * layout a multimodal training stream wants (image, audio, video
    * alternating) computed without a global sort: within each
    * content-hash shard, rank per kind and slot = (rank−1)·3 + kind
    * index, the t10 sequence-packing shape applied to modality mixing.
    * Per-task state is one (shard, kind) run; shards size parallelism at
    * 100 TB exactly as t10's packing shards do. */
  def interleaveModalities(media: DataFrame, shards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kindIdx = when(col("kind") === "image", 0)
      .when(col("kind") === "audio", 1).otherwise(2)
    val t = media.select(col("doc_id"), col("kind"),
      pmod(graft.functions.PortableHash.baseHash(col("doc_id").cast("string")),
        lit(shards.toLong)).as("shard"))
    val w = Window.partitionBy(col("shard"), col("kind")).orderBy(col("doc_id"))
    t.withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("kind"), col("shard"),
        ((col("rn") - 1) * 3 + kindIdx).cast("long").as("slot"))
  }

  private def mediaDs(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    mediaTable(Tables.load(s, dir, "documents")).as[MediaRow]
  }

  val queries: Seq[Q] = Seq(

    // ---- m01: binary payload + metadata projection (oracle-checked) ----
    Q("m01_media_meta",
      (s, dir) => mediaTable(Tables.load(s, dir, "documents"))
        .select(col("doc_id"), col("kind"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("width"), col("height"), col("sample_rate"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
             |  octet_length(encode(text)) AS n_bytes,
             |  md5(text) AS payload_md5,
             |  (doc_id % 640 + 32)::INT AS width,
             |  (doc_id % 480 + 32)::INT AS height,
             |  (CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END)::INT AS sample_rate
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // ---- m02: batched feature extraction (stubbed codec) ---------------
    // The stub codec is deterministic byte math (8-bin histogram of
    // byte >> 5, L1-normalized), so the oracle can recompute it: byte >> 5
    // equals highNibble >> 1, and the high nibbles are the odd-position
    // chars of hex(payload). The checked columns are the *integer* bin
    // counts (recovered exactly from the float features: count = round(f·n),
    // |float error·n| < 0.5 for any payload < 2^23 bytes — float relative
    // error is 2^-24 and the recovery needs error·n below a half) —
    // integers hash
    // identically across engines where re-rounded floats might not.
    Q("m02_media_features",
      (s, dir) => {
        import s.implicits._
        extractFeatures(mediaDs(s, dir))
          .select(col("doc_id"), col("kind"), col("n_bytes"),
            round(element_at(col("features"), 1).cast("double") * col("n_bytes"))
              .cast("long").as("b0"),
            round(element_at(col("features"), 2).cast("double") * col("n_bytes"))
              .cast("long").as("b1"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH m AS (SELECT doc_id,
             |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
             |    encode(text) AS payload FROM documents),
             |h AS (SELECT doc_id, kind, octet_length(payload) AS n_bytes,
             |    regexp_replace(hex(payload), '(.).', '\1', 'g') AS hn FROM m)
             |SELECT doc_id, kind, n_bytes,
             |  CAST(length(hn) - length(regexp_replace(hn, '[01]', '', 'g')) AS BIGINT) AS b0,
             |  CAST(length(hn) - length(regexp_replace(hn, '[23]', '', 'g')) AS BIGINT) AS b1
             |FROM h
             |ORDER BY doc_id""".stripMargin)),

    // ---- m03: frame sampling -------------------------------------------
    // The fake "frames" are 16-byte blocks, every 4th kept: pure integer
    // arithmetic over octet_length, so the oracle enumerates the same
    // (block index, block size) grid per video payload.
    Q("m03_frame_sample",
      (s, dir) => sampleFrames(mediaDs(s, dir))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH v AS (SELECT doc_id, octet_length(encode(text)) AS n
             |           FROM documents WHERE doc_id % 3 = 2),
             |b AS (SELECT doc_id, n, (n + 15) // 16 AS nblocks FROM v WHERE n > 0),
             |f AS (SELECT doc_id, n, nblocks,
             |        unnest(range(0, nblocks)) AS frame_idx FROM b)
             |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
             |  CAST(CASE WHEN frame_idx = nblocks - 1 AND n % 16 <> 0
             |            THEN n % 16 ELSE 16 END AS INT) AS frame_bytes
             |FROM f
             |WHERE frame_idx % 4 = 0
             |ORDER BY doc_id, frame_idx""".stripMargin)),

    // ---- m04: resize (every-4th-byte thumbnail for image payloads) -----
    // Checked as thumbnail size + unsigned-byte checksum: the oracle
    // re-derives the same sampled bytes from hex(payload) pairs, so the
    // whole thumbnail is pinned by exact integers.
    Q("m04_resize",
      (s, dir) => resize(mediaDs(s, dir))
        .orderBy(col("doc_id")),
      Some("""WITH m AS (SELECT doc_id, encode(text) AS payload
             |           FROM documents WHERE doc_id % 3 = 0),
             |h AS (SELECT doc_id, octet_length(payload) AS n,
             |        regexp_extract_all(hex(payload), '..') AS pairs FROM m)
             |SELECT doc_id, CAST(n AS INT) AS n_bytes,
             |  CAST((n + 3) // 4 AS INT) AS thumb_bytes,
             |  CAST(coalesce(list_sum(list_transform(range(0, (n + 3) // 4),
             |        i -> ('0x' || pairs[1 + 4 * i])::INT)), 0) AS BIGINT) AS thumb_sum
             |FROM h
             |ORDER BY doc_id""".stripMargin)),

    // ---- m06: perceptual-hash near-dup (banded, lossless) --------------
    // The oracle recomputes the 16-bit spatial aHash from hex byte pairs
    // (byte i -> segment 16i//n, the m04 byte-recovery technique) and
    // joins ALL pairs quadratically — no banding — so the green row
    // machine-checks that the two-band pigeonhole loses no hamming<=1
    // pair.
    Q("m06_phash_neardup",
      (s, dir) => phashNearDup(mediaDs(s, dir))
        .orderBy(col("d1"), col("d2")),
      Some("""WITH m AS (SELECT doc_id, encode(text) AS payload FROM documents),
             |h AS (SELECT doc_id, octet_length(payload) AS n,
             |        regexp_extract_all(hex(payload), '..') AS pairs FROM m),
             |b AS (SELECT doc_id, n, pairs, unnest(range(0, n)) AS i FROM h),
             |v AS (SELECT doc_id, (16 * i) // n AS k,
             |        ('0x' || pairs[CAST(i + 1 AS INT)])::INT AS byte FROM b),
             |segs AS (SELECT doc_id, k, sum(byte) AS sk FROM v GROUP BY doc_id, k),
             |pb AS (SELECT doc_id, k, sk,
             |        sum(sk) OVER (PARTITION BY doc_id) AS tot FROM segs),
             |ph AS (SELECT doc_id,
             |        CAST(sum(CASE WHEN sk * 16 > tot
             |                      THEN (1::BIGINT << CAST(k AS INT))
             |                      ELSE 0 END) AS BIGINT) AS phash
             |       FROM pb GROUP BY doc_id),
             |p AS (SELECT m.doc_id, coalesce(ph.phash, 0) AS phash
             |      FROM m LEFT JOIN ph USING (doc_id))
             |SELECT a.doc_id AS d1, b.doc_id AS d2,
             |  CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
             |FROM p a JOIN p b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.phash, b.phash)) <= 1
             |ORDER BY d1, d2""".stripMargin)),

    // ---- m07: shard-parallel modality interleave -----------------------
    // The oracle re-derives the same shard hash and per-(shard, kind)
    // ranks — the whole layout is integer-exact and hash-gated, like t10.
    Q("m07_interleave",
      (s, dir) => interleaveModalities(mediaTable(Tables.load(s, dir, "documents")))
        .orderBy(col("doc_id")),
      Some(s"""WITH m AS (SELECT doc_id,
              |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
              |    ${graft.functions.PortableHash.baseHashSql("doc_id::VARCHAR")} % 8 AS shard
              |  FROM documents),
              |r AS (SELECT doc_id, kind, shard,
              |    row_number() OVER (PARTITION BY shard, kind ORDER BY doc_id) AS rn
              |  FROM m)
              |SELECT doc_id, kind, CAST(shard AS BIGINT) AS shard,
              |  CAST((rn - 1) * 3 + (CASE kind WHEN 'image' THEN 0
              |                       WHEN 'audio' THEN 1 ELSE 2 END) AS BIGINT) AS slot
              |FROM r
              |ORDER BY doc_id""".stripMargin)),

    // ---- m08: REAL PNG encode→decode round-trip, analytically gated ----
    // The Spark side runs genuine ImageIO codec work per row (PNG encode
    // then decode of a deterministic grayscale image); the oracle
    // recomputes the expected luminance histogram from the pixel formula
    // alone. Lossless PNG means the two must agree exactly — the real
    // codec path under the same cross-engine gate as every stub.
    Q("m08_image_roundtrip",
      (s, dir) => imageRoundTrip(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id")),
      Some("""WITH d AS (SELECT doc_id, doc_id % 16 + 8 AS w, doc_id % 8 + 8 AS h
             |           FROM documents),
             |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
             |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
             |b AS (SELECT doc_id, w, h,
             |        ((doc_id * 31 + x * 7 + y * 13) % 256) // 32 AS bin FROM px)
             |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
             |  1 AS png_valid,
             |  CAST(sum(CASE WHEN bin = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
             |  CAST(sum(CASE WHEN bin = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
             |  CAST(sum(CASE WHEN bin = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
             |  CAST(sum(CASE WHEN bin = 3 THEN 1 ELSE 0 END) AS BIGINT) AS b3,
             |  CAST(sum(CASE WHEN bin = 4 THEN 1 ELSE 0 END) AS BIGINT) AS b4,
             |  CAST(sum(CASE WHEN bin = 5 THEN 1 ELSE 0 END) AS BIGINT) AS b5,
             |  CAST(sum(CASE WHEN bin = 6 THEN 1 ELSE 0 END) AS BIGINT) AS b6,
             |  CAST(sum(CASE WHEN bin = 7 THEN 1 ELSE 0 END) AS BIGINT) AS b7
             |FROM b GROUP BY doc_id, w, h
             |ORDER BY doc_id""".stripMargin)),

    // ---- m09: real AUDIO codec round trip (PCM WAV) ---------------------
    // m08's certification pattern on javax.sound.sampled: synthesize →
    // encode to real WAV bytes → decode → recompute integer waveform
    // stats; the oracle derives the same stats analytically from the
    // sample formula. Green == the JDK audio codec path round-trips
    // bit-exactly; the multimodal story stops being image-only.
    Q("m09_audio_roundtrip",
      (s, dir) => audioRoundTrip(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id")),
      Some("""WITH d AS (SELECT doc_id, doc_id % 512 + 256 AS n
             |           FROM documents),
             |s AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
             |v AS (SELECT doc_id, n, i,
             |        (doc_id * 31 + i * 7919) % 65536 - 32768 AS smp
             |      FROM s)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_samples, 1 AS wav_valid,
             |  CAST(min(smp) AS BIGINT) AS s_min,
             |  CAST(max(smp) AS BIGINT) AS s_max,
             |  CAST(sum(smp) AS BIGINT) AS s_sum,
             |  CAST(sum(smp * (i % 31 + 1)) AS BIGINT) AS ord_chk
             |FROM v GROUP BY doc_id, n
             |ORDER BY doc_id""".stripMargin)),

    // ---- m10: multi-frame GIF round trip (frame sequences) --------------
    // m09's certification pattern on the JDK's multi-frame codec:
    // synthesize an animated GIF per document, decode it back, and
    // recompute frame-and-pixel-order-sensitive luminance stats; the
    // oracle derives the same stats analytically. Green == the container
    // preserved every frame, in order, losslessly — the multimodal story
    // covers image, audio, AND frame sequences with real codecs.
    Q("m10_gif_roundtrip",
      (s, dir) => gifRoundTrip(Tables.load(s, dir, "documents"))
        .orderBy(col("doc_id")),
      Some("""WITH d AS (SELECT doc_id, doc_id % 3 + 2 AS nf FROM documents),
             |fs AS (SELECT doc_id, nf, unnest(range(0, nf)) AS f FROM d),
             |xs AS (SELECT doc_id, nf, f, unnest(range(0, 8)) AS x FROM fs),
             |px AS (SELECT doc_id, nf, f, x, unnest(range(0, 6)) AS y FROM xs),
             |v AS (SELECT doc_id, nf, f,
             |        (doc_id * 31 + f * 17 + x * 7 + y * 13) % 256 AS l,
             |        (y * 8 + x) % 31 + 1 AS pw
             |      FROM px)
             |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, 1 AS gif_valid,
             |  CAST(sum(l) AS BIGINT) AS lum_sum,
             |  CAST(sum(l * pw * (f + 1)) AS BIGINT) AS ord_chk
             |FROM v GROUP BY doc_id, nf
             |ORDER BY doc_id""".stripMargin)),

    // ---- m05: byte-exact payload dedup ---------------------------------
    // Unlike d01 (normalized-text fingerprints), payload dedup is over
    // the RAW bytes — the dedup pass a mixed media corpus runs before
    // any decode. The oracle re-derives the payload as encode(text).
    Q("m05_payload_dedup",
      (s, dir) => payloadDedup(mediaTable(Tables.load(s, dir, "documents")))
        .orderBy(col("doc_id")),
      // DuckDB's md5 takes VARCHAR, not BLOB; md5(text) hashes the same
      // UTF-8 bytes the Spark side gets from encode(text, 'UTF-8')
      Some("""WITH f AS (SELECT doc_id, md5(text) AS fp FROM documents)
             |SELECT doc_id,
             |  min(doc_id) OVER (PARTITION BY fp) AS keeper_id,
             |  doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup
             |FROM f
             |ORDER BY doc_id""".stripMargin)),
  )
}
