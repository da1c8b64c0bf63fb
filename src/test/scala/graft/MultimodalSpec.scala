package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: the imperative mapPartitions decode path must agree
  * exactly with the Column-expression stub (same schema, same values), so a
  * real codec can be dropped into either without downstream changes.
  */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("mapPartitions decode == Column-expression decode, element-exact") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val exprSide = Multimodal.decodeFeatures(media, dim = 8)
      .select(col("media_id"), col("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    val partSide = Multimodal.decodeFeaturesPartitioned(media, dim = 8, batchSize = 37)
      .collect().map(m => m.media_id -> m.features.toVector).toMap
    assert(exprSide.keySet == partSide.keySet)
    val mismatches = exprSide.count { case (k, v) => partSide(k) != v }
    assert(mismatches == 0, s"$mismatches media rows differ between decode paths")
  }

  test("extension point: an EXTERNAL decoder plugs into decodeFeaturesWith; batch contract proven clause by clause") {
    // r12 verdict task 6 — the worked example for the MP3/AAC/H.264 class:
    // a third-party decoder (faked here) rides the batch extension point;
    // the test pins (a) executor-side partition locality, (b) the
    // ≤ batchSize grouping, (c) strict None-on-corrupt (absence, never
    // garbage), (d) the fixed output schema, (e) loud failure on a
    // decoder that violates one-answer-per-row.
    val media = spark.range(0, 40).repartition(4)
      .select(col("id").as("media_id"),
        when(col("id") % 10 === 0, lit(Array.empty[Byte]))
          .otherwise(col("id").cast("string").cast("binary")).as("content"),
        spark_partition_id().as("pid"))
    val expectPid = media.select("media_id", "pid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Multimodal.decodeFeaturesWith(media, batchSize = 8) { batch =>
      require(batch.length <= 8, s"batch of ${batch.length} exceeds batchSize")
      // an external decoder would hand `batch` to native code here; the
      // fake records WHERE it ran and refuses corrupt (empty) payloads
      val pid = org.apache.spark.TaskContext.get.partitionId().toDouble
      batch.map { case (id, bytes) =>
        if (bytes.isEmpty) None
        else Some(Multimodal.MediaFeatures(id,
          Array(pid, bytes.length.toDouble)))
      }
    }
    assert(out.toDF().schema.map(f => f.name -> f.dataType.simpleString) ==
      Seq("media_id" -> "bigint", "features" -> "array<double>"),
      "engine-fixed output schema")
    val rows = out.collect()
    assert(rows.map(_.media_id).sorted.toSeq ==
      (0L until 40L).filterNot(_ % 10 == 0),
      "corrupt rows are ABSENT; every decodable row survives exactly once")
    rows.foreach { mf =>
      assert(mf.features(0) == expectPid(mf.media_id).toDouble,
        s"media ${mf.media_id} decoded off its own partition")
    }
    // wrong answer cardinality must fail the job, not silently drop rows
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeaturesWith(media, batchSize = 8)(_ => Seq.empty)
        .collect()
    }
  }

  test("frame sampling covers the content without overlap") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val frames = Multimodal.sampleFrames(media, 4)
    val perDoc = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n"), sum(col("frame_bytes")).as("bytes"))
      .collect()
    assert(perDoc.forall(_.getLong(1) == 4L))
    // 4 equal slices cover >= 4*(len/4) - 3 bytes of every doc
    assert(perDoc.forall(_.getLong(2) > 0L))
  }

  test("binary headers round-trip: synthesize → parse recovers every field from bytes") {
    val media = Multimodal.withBinaryHeaders(
      Multimodal.mediaFromDocuments(Tables.documents(spark, sf)))
      .withColumn("p", Multimodal.parseMeta(col("content")))
    // every parsed field equals the generation-side meta it was encoded
    // from — wrong magic, offset, or endianness fails here row-by-row
    val bad = media.filter(
      col("p.kind") =!= col("kind") ||
        (col("kind") === "image" &&
          (col("p.width") =!= col("meta.width") ||
            col("p.height") =!= col("meta.height"))) ||
        (col("kind") === "audio" &&
          col("p.sample_rate") =!= col("meta.sample_rate")) ||
        (col("kind") === "video" &&
          col("p.duration_ms") =!= col("meta.duration_ms").cast("int")))
      .count()
    assert(bad == 0L, s"$bad rows mis-parsed")
    // payload slicing: bytes after the parsed header == the original text
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val payloads = media.select(col("media_id").as("doc_id"),
      Multimodal.payload(col("content"), col("p")).cast("string").as("ptext"))
    val diff = payloads.join(docs, "doc_id")
      .filter(col("ptext") =!= col("text")).count()
    assert(diff == 0L, s"$diff payloads differ from source text")
  }

  test("parser is total: garbage bytes parse to kind=unknown, null fields") {
    val s = spark
    import s.implicits._
    val junk = Seq(Array[Byte](1, 2, 3), Array[Byte](), "hello".getBytes)
      .toDF("content")
      .select(Multimodal.parseMeta(col("content")).as("p"))
      .select("p.kind", "p.width", "p.sample_rate").collect()
    assert(junk.forall(r => r.getString(0) == "unknown" && r.isNullAt(1) &&
      r.isNullAt(2)))
  }

  test("non-WAVE RIFF containers (AVI, WebP) parse as unknown, not audio") {
    // RIFF is a container magic shared by AVI/WebP/WAV; only the 'WAVE'
    // form tag at bytes 9-12 justifies decoding a sample_rate at the
    // canonical fmt-chunk offset — anything else would yield garbage
    val s = spark
    import s.implicits._
    def riff(form: String): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](0x10, 0, 0, 0) ++
        form.getBytes("US-ASCII") ++ Array.fill(20)(0x42.toByte)
    val rows = Seq(riff("AVI "), riff("WEBP"), riff("WAVE")).toDF("content")
      .select(Multimodal.parseMeta(col("content")).as("p"))
      .select("p.kind", "p.sample_rate").collect()
    assert(rows(0).getString(0) == "unknown" && rows(0).isNullAt(1))
    assert(rows(1).getString(0) == "unknown" && rows(1).isNullAt(1))
    assert(rows(2).getString(0) == "audio")
  }

  test("BMP codec: encode/decode round-trips exactly at awkward widths") {
    import graft.multimodal.BmpCodec
    // widths 2..5 cover every row-padding remainder (3w mod 4 = 2,1,0,3)
    for (w <- 2 to 5; h <- 2 to 4) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
      val img = BmpCodec.Bmp(w, h, px)
      val back = BmpCodec.decode(BmpCodec.encode(img))
      assert(back.isDefined, s"${w}x$h failed to decode")
      assert(back.get.width == w && back.get.height == h)
      assert(back.get.pixels.toSeq == px.toSeq,
        s"${w}x$h pixels corrupted through encode/decode")
    }
  }

  test("BMP codec: strict decode rejects foreign and truncated bytes") {
    import graft.multimodal.BmpCodec
    assert(BmpCodec.decode("not a bmp at all".getBytes).isEmpty)
    assert(BmpCodec.decode(Array[Byte]('B', 'M', 1, 2)).isEmpty)
    val ok = BmpCodec.encode(BmpCodec.Bmp(3, 2, new Array[Byte](18)))
    assert(BmpCodec.decode(ok).isDefined)
    assert(BmpCodec.decode(ok.take(ok.length - 5)).isEmpty, "truncated pixel data must be rejected")
    // 8-bit/compressed variants are out of scope -> None, not garbage
    val bpp8 = ok.clone(); bpp8(28) = 8
    assert(BmpCodec.decode(bpp8).isEmpty)
  }

  test("BMP resize: nearest-neighbor mapping is the closed-form one") {
    import graft.multimodal.BmpCodec
    val w = 4; val h = 4
    val px = Array.tabulate(w * h * 3)(i => (i % 256).toByte)
    val img = BmpCodec.Bmp(w, h, px)
    val r = BmpCodec.resizeNearest(img, 2, 2)
    for (y2 <- 0 until 2; x2 <- 0 until 2; c <- 0 until 3) {
      val sx = x2 * w / 2; val sy = y2 * h / 2
      assert(r.pixels((y2 * 2 + x2) * 3 + c) == px((sy * w + sx) * 3 + c))
    }
  }

  test("PNG codec: round-trip exercises all five filters and multi-IDAT") {
    import graft.multimodal.PngCodec
    // h >= 6 guarantees rows filtered with every type 0..4 (y mod 5);
    // pixel buffers large enough to split the zlib stream across IDATs
    for (w <- 2 to 6; h <- Seq(2, 5, 6)) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 53 + 7) % 256).toByte)
      val img = PngCodec.Png(w, h, px)
      val bytes = PngCodec.encode(img)
      val back = PngCodec.decode(bytes)
      assert(back.isDefined, s"${w}x$h failed to decode")
      assert(back.get.width == w && back.get.height == h)
      assert(back.get.pixels.toSeq == px.toSeq,
        s"${w}x$h pixels corrupted through encode/decode")
    }
    // a 40x40 image deflates past 96 bytes → multiple IDAT chunks for real
    val big = PngCodec.Png(40, 40,
      Array.tabulate(40 * 40 * 3)(i => ((i * 131) % 256).toByte))
    val bytes = PngCodec.encode(big)
    val idats = "IDAT".r.findAllIn(new String(bytes, "ISO-8859-1")).size
    assert(idats >= 2, s"expected multi-IDAT, got $idats chunk(s)")
    assert(PngCodec.decode(bytes).get.pixels.toSeq == big.pixels.toSeq)
  }

  test("PNG codec: strict decode rejects garbage, truncation, and hostile lengths") {
    import graft.multimodal.PngCodec
    val ok = PngCodec.encode(PngCodec.Png(5, 6,
      Array.tabulate(5 * 6 * 3)(i => (i % 256).toByte)))
    assert(PngCodec.decode(ok).isDefined)
    // foreign bytes / wrong signature
    assert(PngCodec.decode("definitely not a png".getBytes).isEmpty)
    assert(PngCodec.decode(Array[Byte](0x89.toByte, 'P', 'N', 'G')).isEmpty)
    // truncated stream: every prefix must fail closed, never throw
    for (cut <- Seq(10, 20, 33, ok.length / 2, ok.length - 1))
      assert(PngCodec.decode(ok.take(cut)).isEmpty, s"prefix $cut accepted")
    // overflow chunk length: huge declared length must not read OOB
    val hostile = ok.clone()
    hostile(8) = 0x7f; hostile(9) = 0xff.toByte // IHDR length -> ~2^31
    assert(PngCodec.decode(hostile).isEmpty)
    // corrupt CRC on IHDR
    val badCrc = ok.clone(); badCrc(29) = (badCrc(29) ^ 0x5a).toByte
    assert(PngCodec.decode(badCrc).isEmpty)
    // corrupt zlib payload: flip a byte inside the first IDAT's data
    val idatPos = new String(ok, "ISO-8859-1").indexOf("IDAT")
    val badZ = ok.clone(); badZ(idatPos + 6) = (badZ(idatPos + 6) ^ 0xff).toByte
    assert(PngCodec.decode(badZ).isEmpty, "corrupt IDAT accepted")
    // unsupported variants: bit depth 16, palette color, interlaced
    for ((off, v) <- Seq((24, 16.toByte), (25, 3.toByte), (28, 1.toByte))) {
      val variant = ok.clone(); variant(off) = v
      // CRC now mismatches too, but the decoder must reject either way
      assert(PngCodec.decode(variant).isEmpty, s"variant at $off accepted")
    }
    // hostile dimensions: width 2^20 with CRC recomputed — dimension bound
    // must reject before any allocation
    val wide = ok.clone()
    val bb = java.nio.ByteBuffer.wrap(wide)
    bb.putInt(16, 1 << 20)
    val crc = new java.util.zip.CRC32
    crc.update(wide, 12, 17)
    bb.putInt(29, crc.getValue.toInt)
    assert(PngCodec.decode(wide).isEmpty, "hostile width accepted")
  }

  test("PNG codec: grayscale and RGBA round-trip with per-type left offsets") {
    import graft.multimodal.PngCodec
    // h >= 6 cycles through every filter; the bpp-aware "left" neighbor
    // (1 byte for gray, 4 for RGBA) is what each unfilter must get right
    for (ct <- Seq(0, 6); w <- 2 to 6; h <- Seq(2, 5, 6)) {
      val nch = PngCodec.channelsOf(ct)
      val px = Array.tabulate(w * h * nch)(i => ((i * 89 + 3) % 256).toByte)
      val img = PngCodec.Png(w, h, px, ct)
      val back = PngCodec.decode(PngCodec.encode(img))
      assert(back.isDefined, s"ct=$ct ${w}x$h failed to decode")
      assert(back.get.colorType == ct && back.get.channels == nch)
      assert(back.get.pixels.toSeq == px.toSeq,
        s"ct=$ct ${w}x$h pixels corrupted through encode/decode")
    }
    // channel sums: gray 1 entry, RGBA 4 (alpha last)
    val g = PngCodec.Png(2, 1, Array[Byte](10, 20), 0)
    assert(PngCodec.channelSumsN(g).toSeq == Seq(30L))
    val a = PngCodec.Png(1, 2, Array[Byte](1, 2, 3, 4, 10, 20, 30, 40), 6)
    assert(PngCodec.channelSumsN(a).toSeq == Seq(11L, 22L, 33L, 44L))
    // palette (3) and gray+alpha (4) stay rejected even with a valid CRC
    val okRgb = PngCodec.encode(PngCodec.Png(3, 3,
      Array.tabulate(27)(i => i.toByte)))
    for (ctBad <- Seq(3.toByte, 4.toByte)) {
      val v = okRgb.clone()
      v(25) = ctBad
      val crc = new java.util.zip.CRC32
      crc.update(v, 12, 17)
      java.nio.ByteBuffer.wrap(v).putInt(29, crc.getValue.toInt)
      assert(PngCodec.decode(v).isEmpty, s"color type $ctBad accepted")
    }
  }

  test("PNG codec: zlib stream with truncated Adler-32 trailer is rejected") {
    import graft.multimodal.PngCodec
    import java.nio.ByteBuffer
    // Build a PNG whose zlib stream decompresses to EXACTLY the expected
    // scanline bytes but is cut before its Adler-32 trailer — the r5
    // advice case: byte count alone used to accept it.
    val img = PngCodec.Png(4, 3, Array.tabulate(4 * 3 * 3)(i => (i * 7).toByte))
    val good = PngCodec.encode(img)
    // reassemble the single zlib stream from the IDAT chunks
    val s = new String(good, "ISO-8859-1")
    val z = new java.io.ByteArrayOutputStream
    var at = s.indexOf("IDAT")
    val idatSpans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    while (at >= 0) {
      val len = ByteBuffer.wrap(good).getInt(at - 4)
      idatSpans += ((at - 4, len))
      z.write(good, at + 4, len)
      at = s.indexOf("IDAT", at + 4)
    }
    val zbytes = z.toByteArray
    assert(zbytes.length > 4)
    val cut = java.util.Arrays.copyOfRange(zbytes, 0, zbytes.length - 4)
    // sanity: the cut stream still yields every scanline byte
    val inf = new java.util.zip.Inflater(false)
    inf.setInput(cut)
    val raw = new Array[Byte](3 * (1 + 4 * 3))
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      if (n == 0 && inf.needsInput()) got = raw.length + 1 else got += n
    }
    assert(got == raw.length, "fixture broken: cut stream must still inflate fully")
    assert(!inf.finished(), "fixture broken: stream must NOT be finished")
    inf.end()
    // rebuild the PNG: IHDR verbatim, ONE IDAT carrying the cut stream
    val out = new java.io.ByteArrayOutputStream
    out.write(good, 0, idatSpans.head._1) // signature + IHDR
    val lenB = ByteBuffer.allocate(4).putInt(cut.length).array()
    out.write(lenB)
    out.write("IDAT".getBytes("US-ASCII"))
    out.write(cut)
    val crc = new java.util.zip.CRC32
    crc.update("IDAT".getBytes("US-ASCII")); crc.update(cut)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    val iend = s.indexOf("IEND")
    out.write(good, iend - 4, good.length - (iend - 4))
    assert(PngCodec.decode(out.toByteArray).isEmpty,
      "truncated Adler-32 trailer must be rejected")
    // and the unmodified original still decodes
    assert(PngCodec.decode(good).exists(_.pixels.toSeq == img.pixels.toSeq))
  }

  test("JPEG codec: exact recovery of block-constant images (gray + color), incl. cropped odd dims") {
    import graft.multimodal.JpegCodec
    // constant 8x8 blocks survive the DCT round trip bit-exactly under
    // the flat quant table (only the DC coefficient is nonzero, and
    // DC = 8c is exact in double) — the q136/q137 exact-recovery regime.
    // Per-block-DIFFERENT constants exercise DC prediction across MCUs.
    for (wb <- 1 to 2; hb <- 1 to 3; color <- Seq(false, true)) {
      val w = wb * 8; val h = hb * 8; val nc = if (color) 3 else 1
      val px = new Array[Byte](w * h * nc)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until nc) {
        val v = ((x / 8 + (y / 8) * wb) * 29 + wb * 7 + hb * 3) % 256
        px((y * w + x) * nc + c) = v.toByte // gray-valued: exact YCbCr
      }
      val back = JpegCodec.decode(JpegCodec.encode(JpegCodec.Jpeg(w, h, nc, px)))
      assert(back.isDefined, s"${w}x$h nc=$nc failed to decode")
      assert(back.get.width == w && back.get.height == h && back.get.nComp == nc)
      assert(back.get.pixels.toSeq == px.toSeq,
        s"${w}x$h nc=$nc pixels corrupted through encode/decode")
    }
    // non-multiple-of-8 dims: edge-clamp padding keeps an all-constant
    // image block-constant, and the decoder must CROP back exactly
    for ((w, h) <- Seq((10, 5), (7, 9), (1, 1))) {
      val px = Array.fill(w * h)(77.toByte)
      val back = JpegCodec.decode(JpegCodec.encode(JpegCodec.Jpeg(w, h, 1, px)))
      assert(back.exists(b => b.width == w && b.height == h &&
        b.pixels.toSeq == px.toSeq), s"${w}x$h crop path failed")
    }
  }

  test("JPEG entropy layer: arbitrary coefficient blocks round-trip bit-exact") {
    import graft.multimodal.JpegCodec
    // the lossy DCT can mask entropy bugs; this pins Huffman coding, DC
    // prediction, run-length/ZRL/EOB, magnitude extend, byte stuffing,
    // and 1-padding EXACTLY on random coefficients across both channels
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 50) {
      val nComp = if (trial % 2 == 0) 1 else 3
      val nBlocks = (1 + rnd.nextInt(6)) * nComp
      val blocks = Array.fill(nBlocks) {
        val b = new Array[Int](64)
        // sparse: realistic run-lengths incl. >16-zero ZRL runs
        for (_ <- 0 until rnd.nextInt(12))
          b(rnd.nextInt(64)) = rnd.nextInt(2047) - 1023
        b(0) = rnd.nextInt(256) - 128 // bounded DC so diffs stay in range
        b
      }
      val scan = JpegCodec.entropyEncode(blocks, nComp)
      val back = JpegCodec.entropyDecode(scan, nBlocks, nComp)
      assert(back.isDefined, s"trial $trial failed to decode")
      assert(back.get.map(_.toSeq).toSeq == blocks.map(_.toSeq).toSeq,
        s"trial $trial coefficients corrupted")
    }
  }

  test("JPEG restart markers: DRI intervals round-trip exactly, bad RST sequences rejected") {
    import graft.multimodal.JpegCodec
    // restart segments byte-align, cycle RST0..7, and RESET the DC
    // predictors — block-constant media with per-block-different DCs
    // break if any of that is off by one
    for (wb <- Seq(2, 3); hb <- Seq(2, 4); nc <- Seq(1, 3);
         ri <- Seq(1, 2, 5)) {
      val w = wb * 8; val h = hb * 8
      val px = new Array[Byte](w * h * nc)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until nc)
        px((y * w + x) * nc + c) =
          (((x / 8 + (y / 8) * wb) * 41 + 13) % 256).toByte
      val enc = JpegCodec.encode(JpegCodec.Jpeg(w, h, nc, px),
        restartInterval = ri)
      val back = JpegCodec.decode(enc)
      assert(back.exists(_.pixels.toSeq == px.toSeq),
        s"${w}x$h nc=$nc ri=$ri corrupted through restart round-trip")
      // > 8 MCUs at ri=1 exercises the modulo-8 marker wrap
      if (ri == 1 && wb * hb > 8) {
        val rsts = (0 until enc.length - 1).count(i =>
          (enc(i) & 0xff) == 0xFF && (enc(i + 1) & 0xff) >= 0xD0 &&
            (enc(i + 1) & 0xff) <= 0xD7)
        assert(rsts == wb * hb - 1, s"expected ${wb * hb - 1} RSTs, got $rsts")
      }
    }
    // an out-of-cycle RST marker must fail closed
    val px = Array.fill(16 * 16)(55.toByte)
    val ok = JpegCodec.encode(JpegCodec.Jpeg(16, 16, 1, px), restartInterval = 1)
    val firstRst = (0 until ok.length - 1).find(i =>
      (ok(i) & 0xff) == 0xFF && (ok(i + 1) & 0xff) == 0xD0).get
    val mut = ok.clone(); mut(firstRst + 1) = 0xD5.toByte
    assert(JpegCodec.decode(mut).isEmpty, "out-of-cycle RST must be rejected")
    // an RST with no DRI declared must fail closed (already covered by
    // the stray-RST marker branch, pinned here against regressions)
    val noDri = JpegCodec.encode(JpegCodec.Jpeg(16, 16, 1, px))
    assert(JpegCodec.decode(noDri).isDefined)
  }

  test("JPEG lossy path: noise round-trips within the quantization error bound") {
    import graft.multimodal.JpegCodec
    // real AC content through the full pipeline: per-coefficient rounding
    // error <= 0.5 under flat quant, so spatial error is small and, with
    // StrictMath transforms, deterministic — pin a conservative bound
    val rnd = new scala.util.Random(20260814L)
    for (nc <- Seq(1, 3)) {
      val w = 16; val h = 16
      val px = Array.fill(w * h * nc)((rnd.nextInt(256)).toByte)
      val back = JpegCodec.decode(JpegCodec.encode(JpegCodec.Jpeg(w, h, nc, px)))
      assert(back.isDefined)
      val maxErr = px.zip(back.get.pixels)
        .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
      // gray is DCT-roundtrip only; color adds YCbCr forward/back rounding
      val bound = if (nc == 1) 4 else 8
      assert(maxErr <= bound, s"nc=$nc max pixel error $maxErr > $bound")
    }
  }

  test("JPEG codec: strict decode rejects garbage, truncation, and unsupported variants") {
    import graft.multimodal.JpegCodec
    assert(JpegCodec.decode("definitely not a jpeg".getBytes).isEmpty)
    assert(JpegCodec.decode(Array[Byte](-1, -40)).isEmpty) // bare SOI
    val px = Array.fill(8 * 8)(99.toByte)
    val ok = JpegCodec.encode(JpegCodec.Jpeg(8, 8, 1, px))
    assert(JpegCodec.decode(ok).isDefined)
    // every truncation must fail closed, never throw
    for (n <- 0 until ok.length)
      assert(JpegCodec.decode(ok.take(n)).isEmpty, s"truncation at $n decoded")
    // single-byte corruptions must never throw (None or a valid decode)
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 300) {
      val mut = ok.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      JpegCodec.decode(mut) // must not crash
    }
    // targeted unsupported variants, patched at their marker positions
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val m = ok.clone(); f(m); m
    }
    // SOF0 -> SOF2 (progressive)
    val sofAt = (0 until ok.length - 1)
      .find(i => (ok(i) & 0xff) == 0xFF && (ok(i + 1) & 0xff) == 0xC0).get
    assert(JpegCodec.decode(patched(_(sofAt + 1) = 0xC2.toByte)).isEmpty,
      "progressive must be rejected")
    // sampling factor 2x2 at the first component (subsampled: unsupported)
    assert(JpegCodec.decode(patched(_(sofAt + 11) = 0x22.toByte)).isEmpty,
      "subsampling must be rejected")
    // missing EOI
    assert(JpegCodec.decode(ok.dropRight(2)).isEmpty, "missing EOI")
  }

  test("WAV codec: round-trip, foreign-chunk skipping, strict rejection") {
    import graft.multimodal.WavCodec
    val w = WavCodec.Wav(16000, Array[Short](0, 100, -100, 32767, -32768, 7))
    val bytes = WavCodec.encode(w)
    val back = WavCodec.decode(bytes)
    assert(back.exists(b => b.sampleRate == 16000 &&
      b.samples.toSeq == w.samples.toSeq))
    // real-world files interleave foreign chunks (LIST/INFO): splice one
    // between fmt and data — the chunk walk must skip it and still decode
    val bb = java.nio.ByteBuffer.allocate(bytes.length + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(bytes, 0, 36)                        // RIFF..WAVE + fmt chunk
    bb.put("LIST".getBytes("US-ASCII")).putInt(7)
      .put("INFOxyz".getBytes("US-ASCII"))      // 7-byte payload…
    bb.put(Array[Byte](0))                      // …plus its word-align pad
    bb.put(bytes, 36, bytes.length - 36)        // data chunk
    val withList = java.util.Arrays.copyOf(bb.array(), bb.position())
    // fix the RIFF size field for the larger file
    java.nio.ByteBuffer.wrap(withList).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, withList.length - 8)
    val back2 = WavCodec.decode(withList)
    assert(back2.exists(_.samples.toSeq == w.samples.toSeq),
      "decoder must skip foreign chunks")
    // strict rejections: wrong magic, stereo, truncated data
    assert(WavCodec.decode("RIFFxxxxNOPE".getBytes).isEmpty)
    val stereo = bytes.clone(); stereo(22) = 2
    assert(WavCodec.decode(stereo).isEmpty)
    assert(WavCodec.decode(bytes.take(bytes.length - 3)).isEmpty)
  }

  test("WAV resample: nearest-neighbor mapping is the closed-form one") {
    import graft.multimodal.WavCodec
    val in = WavCodec.Wav(8000, Array.tabulate[Short](10)(i => (i * 11).toShort))
    val out = WavCodec.resampleNearest(in, 4, 16000)
    assert(out.sampleRate == 16000)
    assert(out.samples.toSeq == Seq(0, 2, 5, 7).map(i => (i * 11).toShort))
  }

  test("AVI container: round-trip, header fields, corrupt-frame rejection") {
    import graft.multimodal.{AviCodec, BmpCodec}
    val frames = (0 until 3).map { f =>
      BmpCodec.Bmp(3, 2, Array.tabulate(18)(i => ((i * 13 + f * 7) % 256).toByte))
    }
    val bytes = AviCodec.encode(AviCodec.Avi(40000, frames))
    val back = AviCodec.decode(bytes)
    assert(back.isDefined)
    assert(back.get.microsPerFrame == 40000)
    assert(back.get.frames.length == 3)
    for (f <- 0 until 3)
      assert(back.get.frames(f).pixels.toSeq == frames(f).pixels.toSeq,
        s"frame $f corrupted")
    // not an AVI
    assert(AviCodec.decode("RIFFxxxxWAVE".getBytes).isEmpty)
    // corrupt one frame's DIB header -> whole file rejected, not shrunk
    val moviAt = bytes.indexOfSlice("movi".getBytes)
    val firstDib = bytes.indexOfSlice("00db".getBytes, moviAt) + 8
    val corrupt = bytes.clone(); corrupt(firstDib) = 99 // info-header size != 40
    assert(AviCodec.decode(corrupt).isEmpty,
      "corrupt frame must fail the file, not silently drop")
  }

  test("MJPEG-in-AVI: exact recovery round-trip, flavor isolation, strict rejection") {
    import graft.multimodal.{AviCodec, BmpCodec, JpegCodec}
    // block-constant frames → exact recovery through the LOSSY pipeline
    // (flat quant: only DC survives — q179's regime)
    val frames = (0 until 3).map { f =>
      val px = Array.tabulate(16 * 16) { i =>
        val y = i / 16; val x = i % 16
        (((f * 37 + (y / 8) * 2 + x / 8) * 31 + 5) % 256).toByte
      }
      JpegCodec.Jpeg(16, 16, 1, px)
    }
    val bytes = AviCodec.encodeMjpeg(AviCodec.Mjpeg(40000, frames))
    val back = AviCodec.decodeMjpeg(bytes)
    assert(back.isDefined)
    assert(back.get.microsPerFrame == 40000 && back.get.frames.length == 3)
    for (f <- 0 until 3)
      assert(back.get.frames(f).pixels.toSeq == frames(f).pixels.toSeq,
        s"frame $f not exactly recovered")
    // flavor isolation: the MJPEG file has no '00db' (DIB) frames and a
    // DIB AVI has no '00dc' (JPEG) frames — each walk sees an empty
    // stream, not the other flavor's bytes
    assert(AviCodec.decode(bytes).exists(_.frames.isEmpty))
    val dib = AviCodec.encode(AviCodec.Avi(40000,
      Seq(BmpCodec.Bmp(2, 2, Array.fill(12)(3: Byte)))))
    assert(AviCodec.decodeMjpeg(dib).exists(_.frames.isEmpty))
    // strict rejection: garbage, truncation, corrupt frame
    assert(AviCodec.decodeMjpeg("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(AviCodec.decodeMjpeg(bytes.take(bytes.length - 3)).isEmpty,
      "torn container must fail, not shrink")
    val moviAt = bytes.indexOfSlice("movi".getBytes)
    val firstJpg = bytes.indexOfSlice("00dc".getBytes, moviAt) + 8
    val corrupt = bytes.clone(); corrupt(firstJpg) = 0 // break SOI marker
    assert(AviCodec.decodeMjpeg(corrupt).isEmpty,
      "corrupt frame must fail the file, not silently drop")
  }

  test("WAV frame energies: exact per-frame Σs² including the partial tail frame") {
    import graft.multimodal.{Multimodal, WavCodec}
    val s = spark
    import s.implicits._
    // 20 samples in frames of 8 -> [8, 8, 4]; energies hand-computable
    val samples = Array.tabulate[Short](20)(i => (i - 10).toShort)
    val media = Seq(7L -> WavCodec.encode(WavCodec.Wav(8000, samples))).toDS()
    val fr = Multimodal.wavFrameEnergies(media, 8).collect()
      .map(f => f.frame_idx -> ((f.n, f.sum_sq))).toMap
    def e(lo: Int, hi: Int): Long =
      (lo until hi).map(i => (i - 10L) * (i - 10L)).sum
    assert(fr == Map(0L -> ((8L, e(0, 8))), 1L -> ((8L, e(8, 16))),
      2L -> ((4L, e(16, 20)))), fr)
  }

  test("AVI frame diffs: exact SAD between consecutive decoded frames") {
    import graft.multimodal.{AviCodec, BmpCodec, Multimodal}
    val s = spark
    import s.implicits._
    val f0 = BmpCodec.Bmp(2, 2, Array.tabulate(12)(i => (i * 10).toByte))
    val f1 = BmpCodec.Bmp(2, 2, Array.tabulate(12)(i => (i * 10 + 3).toByte))
    val f2 = BmpCodec.Bmp(2, 2, Array.tabulate(12)(i => (i * 10 + 250).toByte))
    val media = Seq(3L -> AviCodec.encode(AviCodec.Avi(40000, Seq(f0, f1, f2)))).toDS()
    val sads = Multimodal.aviFrameDiffs(media).collect()
      .map(d => d.frame_idx -> d.sad).toMap
    def sad(a: BmpCodec.Bmp, b: BmpCodec.Bmp): Long =
      a.pixels.zip(b.pixels).map { case (x, y) =>
        math.abs((x & 0xff) - (y & 0xff)).toLong }.sum
    assert(sads == Map(1L -> sad(f0, f1), 2L -> sad(f1, f2)), sads)
  }

  test("GIF codec: LZW round-trips across width bumps, repeats, and KwKwK") {
    import graft.multimodal.GifCodec
    // palettes of 2..16 colors x rasters big enough to force several LZW
    // width bumps; three content regimes: pseudo-random (dictionary
    // churn), constant runs (KwKwK chains), short period-2 (dense reuse)
    for (nc <- Seq(2, 3, 4, 16); (w, h) <- Seq((7, 5), (40, 30), (64, 48))) {
      val palette = Array.tabulate(nc * 3)(i => ((i * 37 + 11) % 256).toByte)
      val rasters = Seq(
        Array.tabulate[Byte](w * h)(p => ((p * 31 + 7) % nc).toByte),
        Array.fill[Byte](w * h)((nc - 1).toByte),
        Array.tabulate[Byte](w * h)(p => (p % 2 % nc).toByte))
      for ((idx, ri) <- rasters.zipWithIndex) {
        val bytes = GifCodec.encode(GifCodec.Gif(w, h, palette, idx))
        val back = GifCodec.decode(bytes)
        assert(back.isDefined, s"nc=$nc ${w}x$h raster $ri undecodable")
        assert(back.get.width == w && back.get.height == h)
        assert(back.get.indices.toSeq == idx.toSeq,
          s"nc=$nc ${w}x$h raster $ri corrupted")
      }
    }
  }

  test("GIF codec: strict decode rejects garbage, truncation, and hostile variants") {
    import graft.multimodal.GifCodec
    val palette = Array.tabulate(12)(i => (i * 19).toByte)
    val ok = GifCodec.encode(GifCodec.Gif(6, 5,
      palette, Array.tabulate[Byte](30)(p => (p % 4).toByte)))
    assert(GifCodec.decode(ok).isDefined)
    // foreign bytes / wrong signature
    assert(GifCodec.decode("definitely not a gif".getBytes).isEmpty)
    assert(GifCodec.decode("GIF89".getBytes).isEmpty)
    // truncated stream: every prefix must fail closed, never throw
    for (cut <- Seq(5, 12, 13 + 6, ok.length / 2, ok.length - 2))
      assert(GifCodec.decode(ok.take(cut)).isEmpty, s"prefix $cut accepted")
    // global color table flag cleared -> required table missing
    val noGct = ok.clone(); noGct(10) = (noGct(10) & 0x7f).toByte
    assert(GifCodec.decode(noGct).isEmpty)
    // interlace and local-color-table flags on the image descriptor
    val descAt = 13 + 4 * 3 // header + 4-slot GCT
    assert(ok(descAt) == 0x2c)
    for (flag <- Seq(0x40, 0x80)) {
      val v = ok.clone(); v(descAt + 9) = (v(descAt + 9) | flag).toByte
      assert(GifCodec.decode(v).isEmpty, s"descriptor flag $flag accepted")
    }
    // hand-built stream whose single literal indexes a padded palette
    // slot (code 2 with a 2-color table): structurally valid, must reject
    val hostile = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF87a".getBytes("US-ASCII"))
      out.write(Array[Byte](1, 0, 1, 0)) // 1x1
      out.write(0x80); out.write(0); out.write(0) // GCT, 2 slots
      out.write(Array[Byte](1, 2, 3, 4, 5, 6)) // 2 RGB entries
      out.write(0x2c)
      out.write(Array[Byte](0, 0, 0, 0, 1, 0, 1, 0, 0))
      out.write(2) // min code size -> clear=4, eoi=5, 3-bit codes
      // codes [4, 2, 5] LSB-first = bytes 0x54, 0x01
      out.write(2); out.write(0x54); out.write(0x01)
      out.write(0); out.write(0x3b)
      out.toByteArray
    }
    assert(GifCodec.decode(hostile).isEmpty, "padded-slot literal accepted")
    // 89a extension block before the image still decodes (skip path)
    val ext = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(ok, 0, descAt)
      out.write(0x21); out.write(0xf9) // graphics control extension
      out.write(4); out.write(Array[Byte](0, 0, 0, 0))
      out.write(0) // extension terminator
      out.write(ok, descAt, ok.length - descAt)
      out.toByteArray
    }
    assert(GifCodec.decode(ext).isDefined, "extension skip path broken")
    assert(GifCodec.decode(ext).get.indices.toSeq ==
      GifCodec.decode(ok).get.indices.toSeq)
  }

  test("μ-law codec laws over the full 16-bit range") {
    import graft.multimodal.MuLawCodec._
    // G.711 invariants, swept exhaustively:
    //  - value idempotence: decoded samples are FIXED POINTS of the
    //    quantizer (re-encoding may flip between the two zero bytes
    //    0x7F/0xFF — μ-law's signed zero — but the VALUE is stable);
    //  - sign preservation and segment-bounded quantization error
    //    (< 8·2^e where e is the segment of |s|+132, max 8·2^7 = 1024);
    //  - monotone non-decreasing decode over the encode order.
    var s = -32768
    while (s <= 32767) {
      val b = encodeSample(s)
      val d = decodeSample(b)
      assert(decodeSample(encodeSample(d)) == d, s"not a fixed point at $s")
      assert(d == 0 || (d < 0) == (s < 0) || s == 0,
        s"sign flipped at $s -> $d")
      val a = math.min(math.abs(s), 32635) + 132
      val e = (31 - Integer.numberOfLeadingZeros(a)) - 7
      assert(math.abs(math.min(math.abs(s), 32635) - math.abs(d)) < (8 << e),
        s"error bound broken at $s (d=$d, e=$e)")
      s += 1
    }
    // monotone: larger sample never decodes strictly smaller
    var x = -32768
    while (x < 32767) {
      val d1 = decodeSample(encodeSample(x))
      val d2 = decodeSample(encodeSample(x + 1))
      assert(d2 >= d1, s"non-monotone at $x")
      x += 1
    }
  }

  test("IMA ADPCM: hand-computed trajectory, packing, convergence, error bound") {
    import graft.multimodal.AdpcmCodec._
    // hand-run of the spec for [100, 100] from the zero state:
    //   s=100: step=7, nib=7, vpdiff=0+7+3+1=11 → pred=11, idx=0+8=8
    //   s=100: step=16, nib=7, vpdiff=2+16+8+4=30 → pred=41, idx=16
    assert(decode(encode(Array(100, 100)), 2).toSeq == Seq(11, 41))
    // nibble packing: low nibble first (IMA convention) — [100,100] is
    // nibble 7 twice → one byte 0x77
    assert(encode(Array(100, 100)).toSeq == Seq(0x77.toByte))
    // constant signal: the adaptive step shrinks and the predictor
    // converges onto the value (within the smallest step)
    val const = Array.fill(64)(5000)
    val dec = decode(encode(const), 64)
    assert(math.abs(dec.last - 5000) <= 16, s"no convergence: ${dec.last}")
    // per-sample error bound: |err| ≤ step used at that sample (replay
    // states to know the step) — the quantizer's contract
    val rnd = new scala.util.Random(7)
    val sig = Array.fill(200)(rnd.nextInt(60000) - 30000)
    val out = decode(encode(sig), 200)
    var pred = 0; var idx = 0
    for (i <- sig.indices) {
      val step = StepTable(idx)
      val (p2, i2, _) = encodeStep(pred, idx, sig(i))
      assert(out(i) == p2, s"decode desync at $i")
      // the quantizer's real contract: one step moves the predictor at
      // most vpdiff_max = step + step/2 + step/4 + step/8 < 2·step
      // (input-vs-output error is NOT bounded during attack transients —
      // the adaptive step must catch up; that's ADPCM, not a bug)
      assert(math.abs(p2.toLong - pred) < 2L * step,
        s"movement ${p2 - pred} vs step $step at $i")
      pred = p2; idx = i2
    }
  }
}
