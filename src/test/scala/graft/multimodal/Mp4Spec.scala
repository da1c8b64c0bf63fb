package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF container proofs: bit-exact JPEG round trip through the box
  * walk + sample tables, REAL multi-run stsc expansion, the motion-track
  * composition, and the fail-closed discipline on hostile bytes (torn
  * boxes, insane table counts, offsets outside the file, 64-bit sizes).
  */
class Mp4Spec extends AnyFunSuite {

  private def frame(seed: Int): JpegCodec.Jpeg = {
    // block-constant 32x32 grayscale: the exact-recovery regime, so the
    // round trip must be BIT-exact and any walk defect breaks equality
    val px = new Array[Byte](32 * 32)
    for (y <- 0 until 32; x <- 0 until 32)
      px(y * 32 + x) =
        Multimodal.mjpegBlockValue(seed.toLong, 0, (y / 8) * 4 + x / 8).toByte
    JpegCodec.Jpeg(32, 32, 1, px)
  }

  test("JPEG track round-trips bit-exact through ftyp/mdat/moov and the " +
      "stsd/stts/stsc/stsz/stco tables (7 samples -> 3 chunks, 2 stsc runs)") {
    val frames = (0 until 7).map(frame)
    val bytes = Mp4Codec.encode(Mp4Codec.Mp4(1000000, 40000, frames))
    val st = Mp4Codec.sampleTable(bytes).get
    assert(st.entry == "jpeg" && st.timescale == 1000000 &&
      st.sampleDelta == 40000)
    assert(st.width == 32 && st.height == 32)
    assert(st.spans.length == 7)
    // chunking policy: 3 + 2 + 2 -> chunk sample counts [3, 2, 2], which
    // run-length encodes to TWO stsc runs — the expansion is load-bearing
    assert(Mp4Codec.chunkSizes(7) == Seq(3, 2, 2))
    val dec = Mp4Codec.decode(bytes).get
    assert(dec.frames.length == 7)
    dec.frames.zip(frames).foreach { case (d, o) =>
      assert(d.width == o.width && d.height == o.height)
      assert(java.util.Arrays.equals(d.pixels, o.pixels),
        "decoded frame must be bit-exact in the exact-recovery regime")
    }
  }

  test("chunking policy covers every count, remainder chunk included") {
    assert(Mp4Codec.chunkSizes(0) == Seq.empty)
    assert(Mp4Codec.chunkSizes(1) == Seq(1))
    assert(Mp4Codec.chunkSizes(3) == Seq(3))
    assert(Mp4Codec.chunkSizes(4) == Seq(3, 1))
    assert(Mp4Codec.chunkSizes(6) == Seq(3, 2, 1))
    assert(Mp4Codec.chunkSizes(8) == Seq(3, 2, 2, 1))
    (0 to 40).foreach(n => assert(Mp4Codec.chunkSizes(n).sum == n))
  }

  test("motion track: one mcv1 sample carries a whole MotionCodec stream " +
      "through the same walk, decoded bit-exact") {
    val v = MotionCodec.Video(16, 16, Array.tabulate(2) { fi =>
      Array.tabulate[Byte](256)(i => ((i * 7 + fi * 31 + 13) % 256).toByte)
    })
    val bytes = Mp4Codec.encodeMotion(1000000, 40000, v)
    val st = Mp4Codec.sampleTable(bytes).get
    assert(st.entry == "mcv1" && st.spans.length == 1)
    val dec = Mp4Codec.decodeMotion(bytes).get
    assert(dec.frames.length == 2)
    dec.frames.zip(v.frames).foreach { case (d, o) =>
      assert(java.util.Arrays.equals(d, o)) }
    // the jpeg-track reader must refuse the motion track (entry gate)
    assert(Mp4Codec.decode(bytes).isEmpty)
  }

  test("decode fails closed: bad magic, torn boxes, 64-bit sizes, insane " +
      "tables, offsets outside the file, corrupt samples") {
    val good = Mp4Codec.encode(
      Mp4Codec.Mp4(1000000, 40000, (0 until 4).map(frame)))
    assert(Mp4Codec.decode(Array[Byte](1, 2, 3)).isEmpty)
    // not an ftyp-led file
    val noFtyp = good.clone(); noFtyp(4) = 'X'
    assert(Mp4Codec.decode(noFtyp).isEmpty)
    // torn: truncate inside moov
    assert(Mp4Codec.decode(good.take(good.length - 12)).isEmpty)
    // 64-bit largesize box: fail closed, never a wild 64-bit read
    val big = good.clone()
    big(0) = 0; big(1) = 0; big(2) = 0; big(3) = 1
    assert(Mp4Codec.decode(big).isEmpty)
    // kill the FIRST sample's SOI marker: that sample cannot decode, so
    // the FILE must fail — never a silently 3-frame video
    val mdatPay = good.clone()
    val ftypSize = java.nio.ByteBuffer.wrap(good).getInt(0)
    mdatPay(ftypSize + 8) = 0     // first sample = first mdat byte (FF…
    mdatPay(ftypSize + 9) = 0     // …D8) — zeroed, no longer a JPEG
    assert(Mp4Codec.decode(mdatPay).isEmpty,
      "an undecodable sample must fail the file")
    // hostile stco: point a chunk offset past EOF
    val stcoIdx = {
      // find the 'stco' fourcc
      val s = new String(good.map(_.toChar))
      s.indexOf("stco")
    }
    assert(stcoIdx > 0)
    val badOff = good.clone()
    // first offset entry: stco fourcc + version/flags(4) + count(4)
    val offPos = stcoIdx + 4 + 4 + 4
    badOff(offPos) = 0x7f.toByte
    assert(Mp4Codec.decode(badOff).isEmpty,
      "an offset outside the file must fail the walk")
    // hostile stsz: blow up the sample count without growing the box
    val stszIdx = new String(good.map(_.toChar)).indexOf("stsz")
    val badN = good.clone()
    badN(stszIdx + 4 + 4) = 0x7f.toByte // count high byte
    assert(Mp4Codec.decode(badN).isEmpty,
      "a sample count exceeding the table bytes must fail the walk")
  }

  private def avFile(nf: Int, na: Int): Array[Byte] = {
    val frames = (0 until nf).map(i => JpegCodec.encode(frame(i)))
    val audio = (0 until na).map(i =>
      Array(MuLawCodec.encodeSample(((7 * i) % 2003) - 1001)))
    val video = Mp4Codec.Track("jpeg", "vide", 1000000, 40000, 32, 32,
      frames, Mp4Codec.chunkSizes(nf))
    val aChunks =
      Seq.fill(na / 16)(16) ++ (if (na % 16 > 0) Seq(na % 16) else Nil)
    val at = Mp4Codec.Track("ulaw", "soun", 8000, 1, 0, 0, audio, aChunks,
      uniformStsz = true)
    Mp4Codec.encodeMux(Seq(video, at))
  }

  test("multi-track mux: two traks surface independently (vide JPEG " +
      "round-trip + soun ulaw uniform-stsz), chunks interleaved in mdat") {
    val bytes = avFile(nf = 7, na = 37)
    val sts = Mp4Codec.sampleTables(bytes).get
    assert(sts.length == 2)
    val vt = sts.find(_.handler == "vide").get
    val at = sts.find(_.handler == "soun").get
    assert(vt.entry == "jpeg" && vt.timescale == 1000000 &&
      vt.sampleDelta == 40000 && vt.width == 32 && vt.height == 32)
    assert(at.entry == "ulaw" && at.timescale == 8000 && at.sampleDelta == 1)
    // video: every sample bit-exact through the interleaved layout
    assert(vt.spans.length == 7 && vt.nChunks == 3)
    vt.spans.zipWithIndex.foreach { case ((off, sz), i) =>
      val d = JpegCodec.decode(
        java.util.Arrays.copyOfRange(bytes, off, off + sz)).get
      assert(java.util.Arrays.equals(d.pixels, frame(i).pixels))
    }
    // audio: uniform stsz (37 one-byte samples, 16+16+5 chunks), every
    // byte the μ-law encoding of the known ramp
    assert(at.spans.length == 37 && at.nChunks == 3)
    assert(at.spans.forall(_._2 == 1))
    at.spans.zipWithIndex.foreach { case ((off, _), i) =>
      assert(bytes(off) == MuLawCodec.encodeSample(((7 * i) % 2003) - 1001))
    }
    // interleaving: the mdat payload alternates v-chunk, a-chunk — each
    // track's chunk offsets INTERLEAVE rather than form two contiguous
    // runs (per-trak stco is genuinely load-bearing)
    val vOffs = vt.spans.map(_._1)
    val aOffs = at.spans.map(_._1)
    assert(aOffs.head < vOffs.last && vOffs.head < aOffs.head,
      "first audio chunk must sit between video chunks")
    // the single-trak reader must refuse a two-trak file (strict contract)
    assert(Mp4Codec.sampleTable(bytes).isEmpty)
    assert(Mp4Codec.decode(bytes).isEmpty)
  }

  test("multi-track strictness: a torn table in EITHER trak fails the " +
      "whole file — never a silently single-track decode") {
    val bytes = avFile(nf = 4, na = 20)
    // find the SECOND stco (the audio trak's) and point a chunk past EOF
    val s = new String(bytes.map(_.toChar))
    val first = s.indexOf("stco")
    val second = s.indexOf("stco", first + 4)
    assert(second > first)
    val bad = bytes.clone()
    bad(second + 4 + 4 + 4) = 0x7f.toByte
    assert(Mp4Codec.sampleTables(bad).isEmpty,
      "a torn audio trak must fail the file, video trak included")
  }

  test("encodeMux enforces the chunk-schedule and uniform-stsz contracts") {
    val frames = (0 until 3).map(i => JpegCodec.encode(frame(i)))
    intercept[IllegalArgumentException] {
      Mp4Codec.encodeMux(Seq(Mp4Codec.Track("jpeg", "vide", 1000000, 40000,
        32, 32, frames, Seq(2, 2)))) // covers 4 ≠ 3 samples
    }
    intercept[IllegalArgumentException] {
      Mp4Codec.encodeMux(Seq(Mp4Codec.Track("jpeg", "vide", 1000000, 40000,
        32, 32, frames :+ Array[Byte](1, 2), Seq(4), uniformStsz = true)))
    }
  }

  private def fragFile(nf: Int, sched: Seq[Int]): Array[Byte] = {
    val samples = (0 until nf).map(i => JpegCodec.encode(frame(i)))
    Mp4Codec.encodeFragmented(
      Mp4Codec.Track("jpeg", "vide", 1000000, 40000, 32, 32, samples,
        Mp4Codec.chunkSizes(nf)),
      sched)
  }

  test("fragmented round trip: empty-table moov + mvex/trex, then every " +
      "moof's tfhd/trun expands to bit-exact JPEG samples (schedule 2+2+1)") {
    val bytes = fragFile(5, Seq(2, 2, 1))
    val ft = Mp4Codec.fragmentTable(bytes).get
    assert(ft.entry == "jpeg" && ft.timescale == 1000000 &&
      ft.sampleDelta == 40000)
    assert(ft.width == 32 && ft.height == 32)
    assert(ft.frags.map(_.length) == Seq(2, 2, 1))
    ft.frags.flatten.zipWithIndex.foreach { case ((off, sz), i) =>
      val d = JpegCodec.decode(
        java.util.Arrays.copyOfRange(bytes, off, off + sz)).get
      assert(java.util.Arrays.equals(d.pixels, frame(i).pixels),
        s"fragment sample $i must round-trip bit-exact")
    }
    // the two layouts are mutually exclusive, both directions strict:
    // the tabled reader must refuse a fragmented file (its stbl is
    // empty), and the fragment reader must refuse a tabled file (no
    // trex, non-empty stsz)
    assert(Mp4Codec.sampleTables(bytes).isEmpty)
    assert(Mp4Codec.decode(bytes).isEmpty)
    val tabled = Mp4Codec.encode(
      Mp4Codec.Mp4(1000000, 40000, (0 until 3).map(frame)))
    assert(Mp4Codec.fragmentTable(tabled).isEmpty)
  }

  test("fragment walk fails closed: out-of-order mfhd sequence, missing " +
      "default-base-is-moof, span past EOF, inflated trun count") {
    val bytes = fragFile(4, Seq(2, 1, 1))
    assert(Mp4Codec.fragmentTable(bytes).isDefined)
    val s = new String(bytes.map(_.toChar))
    // live-stream integrity: the SECOND moof's sequence number must be 2
    val m2 = s.indexOf("mfhd", s.indexOf("mfhd") + 4)
    assert(m2 > 0)
    val seqBad = bytes.clone()
    seqBad(m2 + 11) = 9 // payload verflags(4) + seq big-endian low byte
    assert(Mp4Codec.fragmentTable(seqBad).isEmpty,
      "fragments must arrive exactly in order")
    // tfhd without default-base-is-moof: the only base this walk speaks
    val t1 = s.indexOf("tfhd")
    val baseBad = bytes.clone()
    baseBad(t1 + 5) = 0 // clears the 0x020000 flag byte
    assert(Mp4Codec.fragmentTable(baseBad).isEmpty)
    // first trun sample size → past EOF
    val tr = s.indexOf("trun")
    val spanBad = bytes.clone()
    spanBad(tr + 16) = 0x7f.toByte // first per-sample size, high byte
    assert(Mp4Codec.fragmentTable(spanBad).isEmpty,
      "a span outside the file must fail the walk")
    // sample_count inflated beyond the trun's own bytes
    val cntBad = bytes.clone()
    cntBad(tr + 9) = 0x7f.toByte // count high-ish byte → ~8.3M samples
    assert(Mp4Codec.fragmentTable(cntBad).isEmpty,
      "a count exceeding the table bytes must fail the walk")
    // torn: truncate inside the last mdat
    assert(Mp4Codec.fragmentTable(bytes.take(bytes.length - 10)).isEmpty)
  }

  test("dashSegments splits at the shipping grain: init = ftyp+moov, one " +
      "segment per moof/mdat pair, concatenation reproduces the file") {
    val bytes = fragFile(5, Seq(2, 2, 1))
    val segs = Mp4Codec.dashSegments(bytes).get
    assert(segs.length == 4) // init + 3 media segments
    // init segment ends exactly at moov's end and leads the file
    assert(java.util.Arrays.equals(segs.head,
      bytes.take(segs.head.length)))
    assert(new String(segs.head.map(_.toChar)).contains("moov"))
    assert(segs.tail.forall(s => new String(s.take(8).map(_.toChar))
      .endsWith("moof")))
    // the reassembly contract: concat ≡ original, byte for byte
    assert(java.util.Arrays.equals(segs.flatten.toArray, bytes))
    // a tabled (non-fragmented) file has no shipping grain
    val tabled = Mp4Codec.encode(
      Mp4Codec.Mp4(1000000, 40000, (0 until 3).map(frame)))
    assert(Mp4Codec.dashSegments(tabled).isEmpty)
    // a dangling moof (complete box, but no mdat after it) must fail
    // the PAIRING rule, not just the bounds walk
    val lastSeg = segs.last
    val moofLen = java.nio.ByteBuffer.wrap(lastSeg).getInt(0)
    val dangling = segs.init.flatten.toArray ++ lastSeg.take(moofLen)
    assert(Mp4Codec.dashSegments(dangling).isEmpty)
    // torn mid-box fails the bounds walk too
    assert(Mp4Codec.dashSegments(bytes.take(bytes.length - 9)).isEmpty)
  }

  test("encodeFragmented enforces the fragment-schedule contract") {
    val samples = (0 until 3).map(i => JpegCodec.encode(frame(i)))
    val t = Mp4Codec.Track("jpeg", "vide", 1000000, 40000, 32, 32,
      samples, Mp4Codec.chunkSizes(3))
    intercept[IllegalArgumentException] {
      Mp4Codec.encodeFragmented(t, Seq(2, 2)) // covers 4 ≠ 3 samples
    }
    intercept[IllegalArgumentException] {
      Mp4Codec.encodeFragmented(t, Seq(3, 0)) // empty fragment
    }
  }

  test("unknown boxes skip cleanly at top level (free box between mdat " +
      "and moov shifts nothing — stco offsets stay valid)") {
    val frames = (0 until 2).map(frame)
    val bytes = Mp4Codec.encode(Mp4Codec.Mp4(1000000, 40000, frames))
    // splice a 'free' box in FRONT of moov (after mdat): sample offsets
    // point into ftyp+mdat which do not move
    val ftypSize = java.nio.ByteBuffer.wrap(bytes).getInt(0)
    val mdatSize = java.nio.ByteBuffer.wrap(bytes).getInt(ftypSize)
    val cut = ftypSize + mdatSize
    val free = java.nio.ByteBuffer.allocate(16)
    free.putInt(16).put("free".getBytes("US-ASCII")).putLong(0L)
    val spliced = bytes.take(cut) ++ free.array() ++ bytes.drop(cut)
    val dec = Mp4Codec.decode(spliced)
    assert(dec.isDefined && dec.get.frames.length == 2,
      "a foreign top-level box must not break the walk")
  }
}
