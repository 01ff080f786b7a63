package graft.multimodal

/** Dependency-free REAL media codecs: a 24-bit uncompressed BMP
  * encoder/decoder and a 16-bit PCM WAV encoder/decoder, plus the
  * feature kernels built on them. These replace the former md5 stub —
  * the decode step now genuinely parses file headers, row strides,
  * bottom-up raster order and RIFF chunk framing, byte for byte
  * (unit-asserted against crafted files).
  *
  * Reference parity target: the betl datastore contract treats every
  * source as typed cell data (betl/io/DatastoreClass.py:1-11) — media
  * columns are our extension, so the formats chosen are the two classic
  * codec-free ones (BITMAPINFOHEADER BMP, canonical RIFF/WAVE PCM).
  */
object MediaCodecs {

  // ------------------------------------------------------------------ BMP

  /** 24bpp bottom-up BMP with BITMAPINFOHEADER — 54-byte header, rows
    * padded to 4-byte strides.
    */
  object Bmp {

    /** Row stride in bytes for a 24bpp image of width `w`. */
    def stride(w: Int): Int = ((3 * w + 3) / 4) * 4

    /** Total file size for a `w`×`h` 24bpp BMP. */
    def fileSize(w: Int, h: Int): Int = 54 + stride(w) * h

    /** Encode top-down row-major pixels (B,G,R triplets, `3*w*h`
      * bytes) as a standard bottom-up 24bpp BMP.
      */
    def encode(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
      require(pixels.length == 3 * w * h,
        s"need ${3 * w * h} pixel bytes, got ${pixels.length}")
      val st = stride(w)
      val out = new Array[Byte](fileSize(w, h))
      out(0) = 'B'; out(1) = 'M'
      putLe32(out, 2, out.length)
      putLe32(out, 10, 54) // pixel data offset
      putLe32(out, 14, 40) // BITMAPINFOHEADER size
      putLe32(out, 18, w)
      putLe32(out, 22, h) // positive = bottom-up
      putLe16(out, 26, 1) // planes
      putLe16(out, 28, 24) // bpp
      putLe32(out, 30, 0) // BI_RGB, uncompressed
      putLe32(out, 34, st * h)
      var y = 0
      while (y < h) {
        // logical row y lands at storage row h-1-y (bottom-up)
        System.arraycopy(pixels, y * 3 * w, out, 54 + (h - 1 - y) * st,
          3 * w)
        y += 1
      }
      out
    }

    /** Decoded image: top-down row-major B,G,R triplets. */
    final case class Image(w: Int, h: Int, pixels: Array[Byte])

    /** Decode a 24bpp uncompressed BMP (bottom-up or top-down) into
      * top-down row-major pixels. Honors the header's pixel-data
      * offset and the 4-byte row stride.
      */
    def decode(data: Array[Byte]): Image = {
      require(data.length >= 54 && data(0) == 'B' && data(1) == 'M',
        "not a BMP payload")
      val off = le32(data, 10)
      val w = le32(data, 18)
      val hRaw = le32(data, 22)
      val bottomUp = hRaw > 0
      val h = math.abs(hRaw)
      val bpp = le16(data, 28)
      val comp = le32(data, 30)
      require(bpp == 24 && comp == 0,
        s"only 24bpp uncompressed BMP supported (bpp=$bpp comp=$comp)")
      val st = stride(w)
      require(data.length >= off + st * h, "truncated BMP pixel data")
      val px = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        val srcRow = if (bottomUp) h - 1 - y else y
        System.arraycopy(data, off + srcRow * st, px, y * 3 * w, 3 * w)
        y += 1
      }
      Image(w, h, px)
    }
  }

  // ------------------------------------------------------------------ WAV

  /** Canonical RIFF/WAVE, PCM (format 1), 16-bit mono. The decoder
    * walks the chunk list (skipping unknown chunks like LIST/fact), so
    * files from real tools parse too.
    */
  object Wav {

    def fileSize(nSamples: Int): Int = 44 + 2 * nSamples

    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = 2 * samples.length
      val out = new Array[Byte](44 + dataLen)
      putTag(out, 0, "RIFF"); putLe32(out, 4, 36 + dataLen)
      putTag(out, 8, "WAVE")
      putTag(out, 12, "fmt "); putLe32(out, 16, 16)
      putLe16(out, 20, 1) // PCM
      putLe16(out, 22, 1) // mono
      putLe32(out, 24, sampleRate)
      putLe32(out, 28, sampleRate * 2) // byte rate
      putLe16(out, 32, 2) // block align
      putLe16(out, 34, 16) // bits per sample
      putTag(out, 36, "data"); putLe32(out, 40, dataLen)
      var i = 0
      while (i < samples.length) {
        putLe16(out, 44 + 2 * i, samples(i) & 0xffff)
        i += 1
      }
      out
    }

    final case class Audio(sampleRate: Int, samples: Array[Short])

    def decode(data: Array[Byte]): Audio = {
      require(data.length >= 44 && tag(data, 0) == "RIFF" &&
        tag(data, 8) == "WAVE", "not a WAV payload")
      var pos = 12
      var sampleRate = -1
      var samples: Array[Short] = null
      while (pos + 8 <= data.length && (sampleRate < 0 || samples == null)) {
        val id = tag(data, pos)
        val len = le32(data, pos + 4)
        id match {
          case "fmt " =>
            val fmt = le16(data, pos + 8)
            val ch = le16(data, pos + 10)
            val bits = le16(data, pos + 22)
            require(fmt == 1 && ch == 1 && bits == 16,
              s"only 16-bit mono PCM supported (fmt=$fmt ch=$ch bits=$bits)")
            sampleRate = le32(data, pos + 12)
          case "data" =>
            require(sampleRate >= 0, "WAV data chunk before fmt chunk")
            val n = len / 2
            samples = new Array[Short](n)
            var i = 0
            while (i < n) {
              samples(i) = ((data(pos + 8 + 2 * i) & 0xff) |
                (data(pos + 9 + 2 * i) << 8)).toShort
              i += 1
            }
          case _ => // skip unknown chunk (LIST, fact, ...)
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      require(samples != null, "WAV has no data chunk")
      Audio(sampleRate, samples)
    }
  }

  // ------------------------------------------------------------------ AVI

  /** Uncompressed RIFF/AVI: LIST hdrl (avih + LIST strl (strh 'vids'/
    * 'DIB ', strf BITMAPINFOHEADER)) + LIST movi of '00db' frames, each
    * frame a bottom-up 24bpp DIB raster with 4-byte row strides — the
    * same raster rules as [[Bmp]] without the 14-byte file header. The
    * decoder walks the RIFF chunk tree (skipping unknown chunks like
    * JUNK/idx1), so files from real tools parse too.
    */
  object Avi {

    /** Decoded video: frames are top-down row-major B,G,R triplets. */
    final case class Video(w: Int, h: Int, frames: Array[Array[Byte]])

    def fileSize(w: Int, h: Int, nFrames: Int): Int = {
      val frameBytes = Bmp.stride(w) * h
      // RIFF(12) + LIST hdrl(12 + avih 64 + LIST strl(12 + strh 64 +
      // strf 48)) + LIST movi(12 + n*(8 + frame))
      12 + 12 + 64 + 12 + 64 + 48 + 12 +
        nFrames * (8 + frameBytes + (frameBytes & 1))
    }

    /** Encode top-down row-major frames (each `3*w*h` bytes) as an
      * uncompressed AVI at `fps` frames/second.
      */
    def encode(w: Int, h: Int, frames: Seq[Array[Byte]],
        fps: Int = 10): Array[Byte] = {
      require(frames.forall(_.length == 3 * w * h),
        s"every frame needs ${3 * w * h} pixel bytes")
      val st = Bmp.stride(w)
      val frameBytes = st * h
      val out = new Array[Byte](fileSize(w, h, frames.length))
      var p = 0
      def tag4(t: String): Unit = { putTag(out, p, t); p += 4 }
      def le32w(v: Int): Unit = { putLe32(out, p, v); p += 4 }
      def le16w(v: Int): Unit = { putLe16(out, p, v); p += 2 }
      tag4("RIFF"); le32w(out.length - 8); tag4("AVI ")
      // LIST hdrl
      tag4("LIST"); le32w(4 + 64 + 12 + 64 + 48); tag4("hdrl")
      tag4("avih"); le32w(56)
      le32w(1000000 / fps) // dwMicroSecPerFrame
      le32w(frameBytes * fps) // dwMaxBytesPerSec
      le32w(0) // dwPaddingGranularity
      le32w(0x10) // AVIF_HASINDEX off; 0x10=AVIF_WASCAPTUREFILE-ish flags
      le32w(frames.length) // dwTotalFrames
      le32w(0); le32w(1) // dwInitialFrames, dwStreams
      le32w(frameBytes) // dwSuggestedBufferSize
      le32w(w); le32w(h)
      le32w(0); le32w(0); le32w(0); le32w(0) // dwReserved[4]
      // LIST strl
      tag4("LIST"); le32w(4 + 64 + 48); tag4("strl")
      tag4("strh"); le32w(56)
      tag4("vids"); tag4("DIB ")
      le32w(0); le16w(0); le16w(0) // flags, priority, language
      le32w(0) // initial frames
      le32w(1); le32w(fps) // scale, rate → fps
      le32w(0); le32w(frames.length) // start, length
      le32w(frameBytes); le32w(-1) // bufSize, quality
      le32w(0) // sampleSize
      le16w(0); le16w(0); le16w(w); le16w(h) // rcFrame
      // strf = BITMAPINFOHEADER
      tag4("strf"); le32w(40)
      le32w(40); le32w(w); le32w(h)
      le16w(1); le16w(24)
      le32w(0) // BI_RGB
      le32w(frameBytes)
      le32w(0); le32w(0); le32w(0); le32w(0)
      // LIST movi
      tag4("LIST")
      le32w(4 + frames.map(_ => 8 + frameBytes + (frameBytes & 1)).sum)
      tag4("movi")
      frames.foreach { fr =>
        tag4("00db"); le32w(frameBytes)
        var y = 0
        while (y < h) {
          System.arraycopy(fr, y * 3 * w, out, p + (h - 1 - y) * st, 3 * w)
          y += 1
        }
        p += frameBytes + (frameBytes & 1)
      }
      out
    }

    def decode(data: Array[Byte]): Video = {
      require(data.length >= 12 && tag(data, 0) == "RIFF" &&
        tag(data, 8) == "AVI ", "not an AVI payload")
      var w = -1
      var h = -1
      val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()

      def walkList(from: Int, until: Int): Unit = {
        var pos = from
        while (pos + 8 <= until) {
          val id = tag(data, pos)
          val len = le32(data, pos + 4)
          id match {
            case "LIST" =>
              // list type occupies the first 4 payload bytes
              walkList(pos + 12, pos + 8 + len)
            case "strf" =>
              // BITMAPINFOHEADER: authoritative for the raster layout
              val bpp = le16(data, pos + 8 + 14)
              val comp = le32(data, pos + 8 + 16)
              require(bpp == 24 && comp == 0,
                s"only 24bpp uncompressed AVI supported (bpp=$bpp comp=$comp)")
              w = le32(data, pos + 8 + 4)
              h = le32(data, pos + 8 + 8)
            case "00db" | "00dd" =>
              require(w > 0 && h > 0, "AVI frame chunk before strf header")
              val st = Bmp.stride(w)
              require(len >= st * h, "truncated AVI frame chunk")
              val px = new Array[Byte](3 * w * h)
              var y = 0
              while (y < h) {
                // frames are bottom-up like BMP rasters
                System.arraycopy(data, pos + 8 + (h - 1 - y) * st,
                  px, y * 3 * w, 3 * w)
                y += 1
              }
              frames += px
            case _ => // skip avih/strh/JUNK/idx1/...
          }
          pos += 8 + len + (len & 1)
        }
      }
      walkList(12, data.length)
      require(frames.nonEmpty, "AVI has no frame chunks")
      Video(w, h, frames.toArray)
    }
  }

  /** 60-bit temporal-spatial perceptual video hash over the DECODED
    * frames: grid row r ∈ [0,6) samples frame `r*F/6` at raster row
    * `r*h/6`, contributing 10 horizontal luminance-gradient bits (the
    * [[ImageDHash]] comparison on that frame's sampled row) — so the 6
    * rows of the hash sweep the TIME axis while each row's bits sweep
    * space. Sized to reuse the 4×15-bit SimHash banding
    * (recall-exact for Hamming ≤ 3), like the image and audio hashes.
    *
    * Gradient bits make the hash exactly invariant to uniform
    * brightness shifts across the clip, and a frame-local edit only
    * touches the grid rows that sample that frame.
    */
  object VideoTemporalHash {
    val TimeRows = 6
    val Cols = 11 // Cols-1 = 10 comparisons per sampled frame

    def hash(v: Avi.Video): Long = {
      val f = v.frames.length
      var out = 0L
      var r = 0
      while (r < TimeRows) {
        val frame = v.frames(r * f / TimeRows)
        val sy = r * v.h / TimeRows
        def lum(sx: Int): Int = {
          val p = (sy * v.w + sx) * 3
          (frame(p) & 0xff) + (frame(p + 1) & 0xff) + (frame(p + 2) & 0xff)
        }
        var x = 0
        while (x < Cols - 1) {
          val l = lum(x * v.w / Cols)
          val rt = lum((x + 1) * v.w / Cols)
          if (rt > l) out |= 1L << (r * (Cols - 1) + x)
          x += 1
        }
        r += 1
      }
      out
    }
  }

  // ------------------------------------------------- feature kernels

  /** BMP pixel statistics over the DECODED raster:
    * [width, height, meanB, meanG, meanR, topHalfMean], means in [0,1].
    * Width/height come from the parsed header and the top-half mean is
    * deliberately ROW-ORDER SENSITIVE — a decoder that mishandled the
    * bottom-up raster or the row stride would still get the channel
    * sums right, but not this. Sums are exact integers; the only
    * doubles are the final divisions (engine-identical).
    */
  object BmpStatsKernel extends Multimodal.Kernel {
    def features(data: Array[Byte]): Array[Double] = {
      val img = Bmp.decode(data)
      val n = img.w * img.h
      if (n == 0) return Array(img.w, img.h, 0.0, 0.0, 0.0, 0.0)
      val sums = new Array[Long](3)
      var i = 0
      while (i < img.pixels.length) {
        sums(i % 3) += img.pixels(i) & 0xff
        i += 1
      }
      val topRows = img.h / 2
      var topSum = 0L
      i = 0
      while (i < 3 * img.w * topRows) {
        topSum += img.pixels(i) & 0xff
        i += 1
      }
      val topN = 3 * img.w * topRows
      Array(
        img.w.toDouble, img.h.toDouble,
        sums(0).toDouble / (n * 255L).toDouble,
        sums(1).toDouble / (n * 255L).toDouble,
        sums(2).toDouble / (n * 255L).toDouble,
        if (topN == 0) 0.0 else topSum.toDouble / (topN * 255L).toDouble)
    }
  }

  /** WAV band energy: RMS of 4 equal contiguous time bands (the last
    * band takes the remainder), normalised by the int16 full scale.
    * Square sums are exact longs; sqrt of a correctly-rounded division
    * is engine-identical.
    */
  object WavEnergyKernel extends Multimodal.Kernel {
    val Bands = 4
    def features(data: Array[Byte]): Array[Double] = {
      val au = Wav.decode(data)
      val n = au.samples.length
      if (n == 0) return Array.fill(Bands)(0.0)
      val base = n / Bands
      (0 until Bands).map { b =>
        val from = b * base
        val until = if (b == Bands - 1) n else (b + 1) * base
        var ssq = 0L
        var i = from
        while (i < until) {
          val s = au.samples(i).toLong
          ssq += s * s
          i += 1
        }
        val cnt = until - from
        if (cnt == 0) 0.0
        else math.sqrt(ssq.toDouble / cnt.toDouble) / 32768.0
      }.toArray
    }
  }

  /** 60-bit perceptual difference hash (dHash) over the DECODED raster:
    * a 6-row × 11-column nearest-neighbour luminance grid, one bit per
    * horizontal gradient (10 comparisons × 6 rows = 60 bits — sized to
    * reuse [[graft.dedup.Dedup]]'s 4×15-bit SimHash banding, which is
    * recall-exact for Hamming ≤ 3).
    *
    * Gradient bits make the hash exactly invariant to uniform
    * brightness shifts (both samples move together) and robust to
    * small local edits (only the gradients crossing the edit flip) —
    * the classic dHash properties, computed here on the genuinely
    * decoded raster (header, stride, bottom-up order), not on raw file
    * bytes. Luminance is the exact integer B+G+R sum: no division, no
    * rounding, bit-identical in any engine.
    */
  object ImageDHash {
    val Rows = 6
    val Cols = 11 // Cols-1 = 10 comparisons per row

    def hash(img: Bmp.Image): Long = {
      // nearest-neighbour sample: grid (x, y) reads pixel
      // (x*w/Cols, y*h/Rows) — duplicate samples on narrow images
      // compare equal and contribute 0 bits, like any upscaled dHash
      def lum(sx: Int, sy: Int): Int = {
        val p = (sy * img.w + sx) * 3
        (img.pixels(p) & 0xff) + (img.pixels(p + 1) & 0xff) +
          (img.pixels(p + 2) & 0xff)
      }
      var out = 0L
      var y = 0
      while (y < Rows) {
        val sy = y * img.h / Rows
        var x = 0
        while (x < Cols - 1) {
          val l = lum(x * img.w / Cols, sy)
          val r = lum((x + 1) * img.w / Cols, sy)
          if (r > l) out |= 1L << (y * (Cols - 1) + x)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** 60-bit perceptual audio hash over DECODED PCM: the sample stream
    * splits into 61 equal time frames, each frame's energy is the exact
    * integer sum of squared samples, and each of the 60 bits records one
    * temporal energy GRADIENT (E(f+1) > E(f)) — the audio sibling of
    * [[ImageDHash]], sized for the same 4×15-bit banding.
    *
    * Gradient bits make the hash exactly invariant to uniform gain
    * (energies scale together by g², order preserved) and robust to
    * small local edits — the shape of real audio fingerprints
    * (spectral-band energy differences), computed here on the time
    * axis so it stays dependency-free and integer-exact.
    */
  object AudioEnergyHash {
    val Frames = 61 // 60 gradient comparisons

    def hash(au: Wav.Audio): Long = {
      val n = au.samples.length
      val e = new Array[Long](Frames)
      var f = 0
      while (f < Frames) {
        var i = f * n / Frames
        val until = (f + 1) * n / Frames
        var ssq = 0L
        while (i < until) {
          val s = au.samples(i).toLong
          ssq += s * s
          i += 1
        }
        e(f) = ssq
        f += 1
      }
      var out = 0L
      var b = 0
      while (b < Frames - 1) {
        if (e(b + 1) > e(b)) out |= 1L << b
        b += 1
      }
      out
    }
  }

  // ------------------------------------------------- synthetic media

  /** Deterministic synthetic media payloads: VALID BMP/WAV files whose
    * pixel/sample values are a closed-form function of the row id, so a
    * SQL oracle can replay the decoded statistics exactly without
    * parsing the container — while the Spark side must genuinely
    * decode (header, stride, raster order, chunk walk) to reproduce
    * them. The corpus ships no binary tables (TESTDATA.md), so this is
    * the media source the multimodal queries pack.
    */
  object Synthetic {

    def bmpWidth(docId: Long): Int = (8 + docId % 9).toInt
    def bmpHeight(docId: Long): Int = (4 + docId % 7).toInt

    /** Pixel byte j (top-down row-major, B,G,R interleaved):
      * (docId*131 + j*31 + 7) mod 256.
      */
    def bmpFor(docId: Long): Array[Byte] = {
      val w = bmpWidth(docId)
      val h = bmpHeight(docId)
      val px = new Array[Byte](3 * w * h)
      var j = 0
      while (j < px.length) {
        px(j) = ((docId * 131 + j * 31 + 7) % 256).toByte
        j += 1
      }
      Bmp.encode(w, h, px)
    }

    /** Textured raster for the image-dedup queries: [[bmpFor]]'s linear
      * formula plus an id-dependent QUADRATIC term. The linear generator
      * makes any two same-size images differ by a CONSTANT mod-256
      * shift — which a gradient hash is (by design!) invariant to, so
      * unrelated images would pair. The `((id%13)+1)·j²` term makes
      * inter-id differences vary with position (measured: 0 cross-id
      * pairs at Hamming ≤ 3 over 500 ids, vs 322 for the linear form),
      * while staying closed-form for the SQL oracle:
      * byte j = (id·131 + j·31 + ((id%13)+1)·j² + 7) mod 256.
      */
    def bmpTexturedFor(docId: Long): Array[Byte] =
      texturedBytes(docId, perturb = false)

    /** A NEAR-DUPLICATE of [[bmpTexturedFor]]'s image: every byte
      * brightened by +1 and the top-left pixel's three bytes by a
      * further +3, all clamped at 255 (a real editor's clamp, not a
      * wrap): byte j = min(orig(j) + (j<3 ? 4 : 1), 255).
      */
    def bmpTexturedPerturbedFor(docId: Long): Array[Byte] =
      texturedBytes(docId, perturb = true)

    private def texturedBytes(docId: Long, perturb: Boolean): Array[Byte] = {
      val w = bmpWidth(docId)
      val h = bmpHeight(docId)
      val px = new Array[Byte](3 * w * h)
      var j = 0
      while (j < px.length) {
        val orig =
          (docId * 131 + j * 31 + (docId % 13 + 1) * j * j + 7) % 256
        px(j) =
          if (perturb) math.min(orig + (if (j < 3) 4 else 1), 255).toByte
          else orig.toByte
        j += 1
      }
      Bmp.encode(w, h, px)
    }

    def aviFrames(docId: Long): Int = (6 + docId % 5).toInt

    /** Textured video frames for the video-dedup queries — the video
      * sibling of [[bmpTexturedFor]]. A per-frame CONSTANT term (t·37)
      * would cancel inside the same-frame gradients, so the frame index
      * also rides a position-interacting term ((id%7+1)·t·j): each
      * sampled frame's gradients differ, and inter-id differences vary
      * with position (the quadratic j² term, as for images). Closed
      * form for the SQL oracle: frame t, byte j =
      * (id·131 + t·37 + j·31 + (id%13+1)·j² + (id%7+1)·t·j + 7) mod 256.
      */
    def aviTexturedFor(docId: Long): Array[Byte] =
      texturedFrames(docId, perturb = false)

    /** NEAR-DUPLICATE of [[aviTexturedFor]]'s clip: every byte of every
      * frame brightened by +1, the first frame's top-left pixel by a
      * further +3, clamped at 255 — frame t, byte j =
      * min(orig(t,j) + (t=0 AND j<3 ? 4 : 1), 255).
      */
    def aviTexturedPerturbedFor(docId: Long): Array[Byte] =
      texturedFrames(docId, perturb = true)

    private def texturedFrames(docId: Long, perturb: Boolean): Array[Byte] = {
      val w = bmpWidth(docId)
      val h = bmpHeight(docId)
      val frames = (0 until aviFrames(docId)).map { t =>
        val px = new Array[Byte](3 * w * h)
        var j = 0
        while (j < px.length) {
          val orig = (docId * 131 + t * 37 + j * 31 +
            (docId % 13 + 1) * j * j + (docId % 7 + 1) * t * j + 7) % 256
          px(j) =
            if (perturb)
              math.min(orig + (if (t == 0 && j < 3) 4 else 1), 255).toByte
            else orig.toByte
          j += 1
        }
        px
      }
      Avi.encode(w, h, frames)
    }

    def wavSamples(docId: Long): Int = (64 + docId % 64).toInt

    /** Sample i: ((docId*7919 + i*104729 + 13) mod 65536) - 32768. */
    def wavFor(docId: Long): Array[Byte] = {
      val n = wavSamples(docId)
      val s = new Array[Short](n)
      var i = 0
      while (i < n) {
        s(i) = ((docId * 7919 + i * 104729 + 13) % 65536 - 32768).toShort
        i += 1
      }
      Wav.encode(8000, s)
    }

    /** Textured samples for the audio-dedup queries — same lesson as
      * [[bmpTexturedFor]]: the linear stream leaves small-Δ ids with
      * correlated energies (measured: 9 spurious cross-id pairs at 500
      * ids), the `(id%13+1)·i²·97` term measures 0 with all 50 copies
      * still at Hamming 0. Closed form for the SQL oracle:
      * sample i = (id·7919 + i·104729 + (id%13+1)·i²·97 + 13) mod
      * 65536 − 32768.
      */
    def wavTexturedFor(docId: Long): Array[Byte] =
      texturedSamples(docId, perturb = false)

    /** NEAR-DUPLICATE of [[wavTexturedFor]]: a +16 DC offset clamped at
      * the int16 ceiling — sample i = min(orig(i) + 16, 32767).
      */
    def wavTexturedPerturbedFor(docId: Long): Array[Byte] =
      texturedSamples(docId, perturb = true)

    private def texturedSamples(docId: Long, perturb: Boolean): Array[Byte] = {
      val n = wavSamples(docId)
      val s = new Array[Short](n)
      var i = 0
      while (i < n) {
        val orig = (docId * 7919 + i * 104729 +
          (docId % 13 + 1) * i * i * 97 + 13) % 65536 - 32768
        s(i) = (if (perturb) math.min(orig + 16, 32767) else orig).toShort
        i += 1
      }
      Wav.encode(8000, s)
    }
  }

  // ------------------------------------------------- LE byte helpers

  private def putLe16(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v & 0xff).toByte
    a(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putLe32(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v & 0xff).toByte
    a(off + 1) = ((v >> 8) & 0xff).toByte
    a(off + 2) = ((v >> 16) & 0xff).toByte
    a(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def putTag(a: Array[Byte], off: Int, t: String): Unit = {
    var i = 0
    while (i < 4) { a(off + i) = t.charAt(i).toByte; i += 1 }
  }

  private def le16(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8)

  private def le32(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
      ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)

  private def tag(a: Array[Byte], off: Int): String =
    new String(a, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
}
