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
