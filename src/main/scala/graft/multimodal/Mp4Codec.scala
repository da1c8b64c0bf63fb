package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** A REAL ISO-BMFF (MP4) container, dependency-free — the container
  * family modern corpora actually carry (ISO/IEC 14496-12). Writing and
  * walking are genuine box work, big-endian size+fourcc with nesting:
  * `ftyp` + `mdat` (sample payloads) + `moov{mvhd, trak{tkhd,
  * mdia{mdhd, hdlr, minf{vmhd, dinf{dref}, stbl{stsd, stts, stsc,
  * stsz, stco}}}}}`. Sample extraction is the real stbl dance: stsc's
  * run-length (first_chunk, samples_per_chunk) table expands against
  * stco's chunk offsets and stsz's per-sample sizes to per-sample byte
  * spans inside mdat — so chunking, offset math, and table consistency
  * are all load-bearing. Frame payload decode composes the
  * already-verified codecs, the way AVI feeds MJPEG: `jpeg` sample
  * entries decode through the full [[JpegCodec]] baseline pipeline;
  * `mcv1` entries carry one [[MotionCodec]] stream per sample
  * (inter-coded video through the same walk). Strict decode: fails
  * closed (None) on bad magic, torn boxes, oversize/insane tables,
  * offsets outside the file, or any undecodable sample — a corrupt file
  * must never silently shrink to fewer frames.
  */
object Mp4Codec {

  /** one video track of JPEG samples: `sampleDelta` ticks per sample at
    * `timescale` ticks/second (40000 @ 1e6 = 25 fps)
    */
  final case class Mp4(timescale: Int, sampleDelta: Int,
      frames: Seq[JpegCodec.Jpeg])

  /** one mux-ready track: `entry` is the stsd sample-entry fourcc,
    * `handler` the hdlr type (`vide` → vmhd + VisualSampleEntry, `soun`
    * → smhd + AudioSampleEntry with 1 channel at `timescale` Hz),
    * `chunks` the samples-per-chunk schedule (must sum to the sample
    * count — the mux interleaves at this grain), and `uniformStsz`
    * selects the constant-sample-size stsz form (sample_size ≠ 0, no
    * table — the layout real PCM-family audio tracks carry)
    */
  final case class Track(entry: String, handler: String, timescale: Int,
      sampleDelta: Int, w: Int, h: Int, samples: Seq[Array[Byte]],
      chunks: Seq[Int], uniformStsz: Boolean = false)

  /** sample-count / chunk-count / table-size ceiling: keeps a hostile
    * header from driving allocation (the MotionCodec clamp discipline)
    */
  private final val MaxSamples = 1 << 16
  private final val MaxBoxDepth = 16

  /** encoder chunking policy: first chunk 3 samples, then 2 per chunk,
    * remainder in the last — deliberately NON-uniform so stsc carries a
    * real multi-run table (a single-run stsc would let a broken run
    * expansion pass undetected)
    */
  private[multimodal] def chunkSizes(n: Int): Seq[Int] = {
    if (n <= 0) Seq.empty
    else {
      val first = math.min(3, n)
      (first +: Seq.fill((n - first) / 2)(2)) ++
        (if ((n - first) % 2 == 1) Seq(1) else Seq.empty)
    }
  }

  // ── box writers ──────────────────────────────────────────────────────

  private def box(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + payload.length)
      .order(ByteOrder.BIG_ENDIAN)
    bb.putInt(8 + payload.length).put(fourcc.getBytes("US-ASCII"))
      .put(payload)
    bb.array()
  }

  private def fullBox(fourcc: String, body: ByteBuffer => Unit,
      size: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + size).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0) // version 0, flags 0
    body(bb)
    box(fourcc, bb.array())
  }

  def encode(v: Mp4): Array[Byte] = {
    val samples = v.frames.map(f => JpegCodec.encode(f))
    encodeMux(Seq(Track("jpeg", "vide", v.timescale, v.sampleDelta,
      v.frames.headOption.map(_.width).getOrElse(0),
      v.frames.headOption.map(_.height).getOrElse(0),
      samples, chunkSizes(samples.length))))
  }

  /** an inter-coded track: ONE sample carrying a whole [[MotionCodec]]
    * stream (its frames are internal to the sample — the container sees
    * one sync sample, the codec owns the GOP)
    */
  def encodeMotion(timescale: Int, sampleDelta: Int,
      video: MotionCodec.Video): Array[Byte] =
    encodeMux(Seq(Track("mcv1", "vide", timescale, sampleDelta,
      video.w, video.h, Seq(MotionCodec.encode(video)), Seq(1))))

  /** the general mux: ftyp, ONE mdat holding every track's chunks
    * INTERLEAVED round-robin at the chunk grain (v₀ a₀ v₁ a₁ … — the
    * layout real muxers emit so a progressive reader never seeks far
    * for the other track), moov with one full trak per track. stco
    * offsets are ABSOLUTE file offsets, which is why mdat precedes
    * moov. Track k gets track_ID k+1; the movie timescale is the first
    * track's; tkhd durations are expressed in the movie timescale,
    * mdhd durations in the track's own — the v0 32-bit fields bound
    * both, enforced here so an unencodable input throws at encode time
    * (the MotionCodec header-bounds discipline).
    */
  def encodeMux(tracks: Seq[Track]): Array[Byte] = {
    require(tracks.nonEmpty, "at least one track")
    tracks.foreach { t =>
      require(t.samples.length <= MaxSamples, s"at most $MaxSamples samples")
      require(t.timescale > 0 && t.sampleDelta > 0, "positive timescale/delta")
      require(t.chunks.sum == t.samples.length && t.chunks.forall(_ > 0),
        "chunk schedule must cover exactly the samples")
      require(!t.uniformStsz || t.samples.map(_.length).distinct.size <= 1,
        "uniformStsz requires equal sample sizes")
    }
    val ftyp = box("ftyp", {
      val bb = ByteBuffer.allocate(12)
      bb.put("isom".getBytes("US-ASCII")).putInt(0)
        .put("isom".getBytes("US-ASCII"))
      bb.array()
    })
    // mdat layout: round-robin over tracks at the chunk grain; record
    // each track's absolute chunk offsets as the payload assembles
    val mdatBase = ftyp.length + 8
    val payload = Array.newBuilder[Byte]
    var cursor = mdatBase
    val offs = Array.fill(tracks.length)(Vector.newBuilder[Int])
    val starts = tracks.map(t => t.chunks.scanLeft(0)(_ + _))
    val maxChunks = tracks.map(_.chunks.length).max
    for (ci <- 0 until maxChunks; ti <- tracks.indices) {
      val t = tracks(ti)
      if (ci < t.chunks.length) {
        offs(ti) += cursor
        for (si <- starts(ti)(ci) until starts(ti)(ci + 1)) {
          payload ++= t.samples(si)
          cursor += t.samples(si).length
        }
      }
    }
    val mdat = box("mdat", payload.result())
    val movieTs = tracks.head.timescale
    def trackDur(t: Track): Long = t.samples.length.toLong * t.sampleDelta
    // per-track duration re-expressed in the movie timescale (exact for
    // the ratios used here; rounding up on a remainder is the spec's
    // "longest track" intent)
    def movieDur(t: Track): Long = {
      val d = trackDur(t) * movieTs
      d / t.timescale + (if (d % t.timescale == 0) 0 else 1)
    }
    tracks.foreach { t =>
      require(trackDur(t) <= Int.MaxValue && movieDur(t) <= Int.MaxValue,
        "duration must fit the v0 32-bit field")
    }
    val mvhdDur = tracks.map(movieDur).max
    val mvhd = fullBox("mvhd", bb => {
      bb.putInt(0).putInt(0)                       // creation, modification
      bb.putInt(movieTs).putInt(mvhdDur.toInt)     // timescale, duration
      bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume
      bb.putInt(0).putInt(0)                       // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt)                        // identity matrix
      (0 until 6).foreach(_ => bb.putInt(0))       // pre_defined
      bb.putInt(tracks.length + 1)                 // next_track_ID
    }, 96)
    val traks = tracks.zipWithIndex.map { case (t, ti) =>
      encodeTrak(t, ti + 1, movieDur(t).toInt, offs(ti).result())
    }
    val moov = box("moov", mvhd ++ traks.flatten)
    ftyp ++ mdat ++ moov
  }

  private def encodeTrak(t: Track, trackId: Int, tkhdDur: Int,
      offs: Seq[Int]): Array[Byte] = {
    val dur = (t.samples.length.toLong * t.sampleDelta).toInt
    val sizes = t.samples.map(_.length)
    val tkhd = fullBox("tkhd", bb => {
      bb.putInt(0).putInt(0)                       // creation, modification
      bb.putInt(trackId).putInt(0).putInt(tkhdDur) // track_ID, rsvd, duration
      bb.putInt(0).putInt(0)                       // reserved
      bb.putShort(0).putShort(0)                   // layer, alternate_group
      bb.putShort(if (t.handler == "soun") 0x0100 else 0) // volume
      bb.putShort(0)                               // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt)
      bb.putInt(t.w << 16).putInt(t.h << 16)       // 16.16 fixed width/height
    }, 80)
    val mdhd = fullBox("mdhd", bb => {
      bb.putInt(0).putInt(0)
      bb.putInt(t.timescale).putInt(dur)
      bb.putShort(0x55c4.toShort).putShort(0)      // language 'und', quality
    }, 20)
    val hdlr = fullBox("hdlr", bb => {
      bb.putInt(0).put(t.handler.getBytes("US-ASCII"))
      bb.putInt(0).putInt(0).putInt(0)
      bb.put(0: Byte)                              // empty name
    }, 21)
    val mediaHeader =
      if (t.handler == "soun")
        fullBox("smhd", bb => { bb.putShort(0).putShort(0) }, 4)
      else
        fullBox("vmhd", bb => {
          bb.putShort(0).putShort(0).putShort(0).putShort(0)
        }, 8)
    val dref = fullBox("dref", bb => {
      bb.putInt(1)
      bb.putInt(12).put("url ".getBytes("US-ASCII")).putInt(1) // self-contained
    }, 16)
    val dinf = box("dinf", dref)
    val sampleEntry =
      if (t.handler == "soun") {
        // AudioSampleEntry: 28 bytes of fixed fields; mono, 16-bit,
        // sample rate = track timescale in 16.16 (the PCM convention)
        val bb = ByteBuffer.allocate(28).order(ByteOrder.BIG_ENDIAN)
        bb.putInt(0).putShort(0).putShort(1)       // reserved, data_ref_index
        bb.putInt(0).putInt(0)                     // reserved
        bb.putShort(1).putShort(16)                // channelcount, samplesize
        bb.putShort(0).putShort(0)                 // pre_defined, reserved
        bb.putInt(t.timescale << 16)               // samplerate 16.16
        box(t.entry, bb.array())
      } else {
        // VisualSampleEntry: 78 bytes of fixed fields
        val bb = ByteBuffer.allocate(78).order(ByteOrder.BIG_ENDIAN)
        bb.putInt(0).putShort(0).putShort(1)       // reserved, data_ref_index
        bb.putInt(0).putInt(0).putInt(0).putInt(0) // pre_defined/reserved
        bb.putShort(t.w.toShort).putShort(t.h.toShort) // width, height
        bb.putInt(0x00480000).putInt(0x00480000)   // 72 dpi
        bb.putInt(0).putShort(1)                   // reserved, frame_count
        bb.put(new Array[Byte](32))                // compressorname
        bb.putShort(24).putShort(-1)               // depth, pre_defined
        box(t.entry, bb.array())
      }
    val stsd = fullBox("stsd", bb => {
      bb.putInt(1).put(sampleEntry)
    }, 4 + sampleEntry.length)
    val stts = fullBox("stts", bb => {
      bb.putInt(1).putInt(t.samples.length).putInt(t.sampleDelta)
    }, 12)
    // stsc: run-length encode the chunk sample counts (first_chunk is
    // 1-based; a run covers every chunk until the next run's first)
    val runs = t.chunks.zipWithIndex
      .foldLeft(Vector.empty[(Int, Int)]) { case (acc, (spc, i)) =>
        if (acc.nonEmpty && acc.last._2 == spc) acc
        else acc :+ ((i + 1, spc))
      }
    val stsc = fullBox("stsc", bb => {
      bb.putInt(runs.length)
      runs.foreach { case (first, spc) =>
        bb.putInt(first).putInt(spc).putInt(1) } // sample_description_index
    }, 4 + 12 * runs.length)
    val stsz =
      if (t.uniformStsz && sizes.nonEmpty)
        fullBox("stsz", bb => {
          bb.putInt(sizes.head).putInt(sizes.length) // constant sample_size
        }, 8)
      else
        fullBox("stsz", bb => {
          bb.putInt(0).putInt(sizes.length)          // sample_size=0: per-sample
          sizes.foreach(bb.putInt)
        }, 8 + 4 * sizes.length)
    val stco = fullBox("stco", bb => {
      bb.putInt(offs.length)
      offs.foreach(bb.putInt)
    }, 4 + 4 * offs.length)
    val stbl = box("stbl",
      stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", mediaHeader ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    box("trak", tkhd ++ mdia)
  }

  // ── fragmented form (fMP4 — the DASH/HLS streaming layout) ────────────

  /** the parsed fragment walk: per-fragment absolute sample spans, in
    * mfhd sequence order (strictly 1..n — a missing or reordered
    * fragment fails the file, the live-stream integrity contract)
    */
  final case class FragTable(entry: String, timescale: Int,
      sampleDelta: Int, width: Int, height: Int,
      frags: Seq[Seq[(Int, Int)]])

  /** fragmented encode: ftyp + moov (trak with EMPTY stbl + mvex/trex
    * carrying the sample-duration default) + one moof/mdat pair per
    * fragment — the incremental layout real DASH/HLS muxers emit so a
    * live reader never needs a finalized sample table. Each moof:
    * mfhd (1-based sequence number) + traf(tfhd default-base-is-moof,
    * trun with data-offset + per-sample sizes). `fragSamples` is the
    * samples-per-fragment schedule (must cover exactly the samples).
    */
  def encodeFragmented(t: Track, fragSamples: Seq[Int]): Array[Byte] = {
    require(t.samples.length <= MaxSamples, s"at most $MaxSamples samples")
    require(t.timescale > 0 && t.sampleDelta > 0, "positive timescale/delta")
    require(fragSamples.sum == t.samples.length && fragSamples.forall(_ > 0),
      "fragment schedule must cover exactly the samples")
    val ftyp = box("ftyp", {
      val bb = ByteBuffer.allocate(12)
      bb.put("isom".getBytes("US-ASCII")).putInt(0)
        .put("iso5".getBytes("US-ASCII"))
      bb.array()
    })
    // moov: the trak's stbl tables are EMPTY (fragments own the
    // samples); mvex/trex publishes the per-sample duration default
    // that every trun below inherits
    val emptyTrak = encodeTrak(
      t.copy(samples = Seq.empty, chunks = Seq.empty, uniformStsz = false),
      trackId = 1, tkhdDur = 0, offs = Seq.empty)
    val trex = fullBox("trex", bb => {
      bb.putInt(1)                      // track_ID
      bb.putInt(1)                      // default_sample_description_index
      bb.putInt(t.sampleDelta)          // default_sample_duration
      bb.putInt(0).putInt(0)            // default size, flags
    }, 20)
    val mvex = box("mvex", trex)
    val mvhd = fullBox("mvhd", bb => {
      bb.putInt(0).putInt(0)
      bb.putInt(t.timescale).putInt(0)  // duration unknown (live form)
      bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      bb.putInt(0).putInt(0)
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      (0 until 6).foreach(_ => bb.putInt(0))
      bb.putInt(2)
    }, 96)
    val moov = box("moov", mvhd ++ mvex ++ emptyTrak)
    val out = Array.newBuilder[Byte]
    out ++= ftyp
    out ++= moov
    val starts = fragSamples.scanLeft(0)(_ + _)
    fragSamples.zipWithIndex.foreach { case (n, fi) =>
      val sizes = (starts(fi) until starts(fi + 1)).map(t.samples(_).length)
      val mfhd = fullBox("mfhd", bb => bb.putInt(fi + 1), 4)
      // tfhd: flags 0x020000 (default-base-is-moof) — trun data offsets
      // are relative to the moof's FIRST byte
      val tfhd = {
        val bb = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
        bb.putInt(0x00020000)           // version 0 | flags
        bb.putInt(1)                    // track_ID
        box("tfhd", bb.array())
      }
      // trun flags 0x000201: data-offset present + sample-size present;
      // the data offset lands just past this moof's own header — the
      // moof size is arithmetic in the sample count, computed before
      // the bytes are laid down
      val trunSize = 8 + 4 + 4 + 4 + 4 * n
      val trafSize = 8 + tfhd.length + trunSize
      val moofSize = 8 + mfhd.length + trafSize
      val trun = {
        val bb = ByteBuffer.allocate(trunSize - 8).order(ByteOrder.BIG_ENDIAN)
        bb.putInt(0x00000201)           // version 0 | flags
        bb.putInt(n)                    // sample_count
        bb.putInt(moofSize + 8)         // data_offset → mdat payload
        sizes.foreach(bb.putInt)
        box("trun", bb.array())
      }
      val traf = box("traf", tfhd ++ trun)
      val moof = box("moof", mfhd ++ traf)
      require(moof.length == moofSize, "moof size arithmetic must agree")
      val mdat = box("mdat",
        (starts(fi) until starts(fi + 1)).toArray.flatMap(t.samples(_)))
      out ++= moof
      out ++= mdat
    }
    out.result()
  }

  /** split a fragmented file at its DASH shipping grain: segment 0 is
    * the INIT segment (every top-level box up to and including moov —
    * what an MPD's initialization range points at), then one MEDIA
    * segment per moof/mdat pair. Strict: ftyp must lead, moov must
    * precede any moof, and after moov the stream must be exactly
    * alternating moof, mdat pairs (a dangling moof or an interleaved
    * foreign box fails — this is the reassembly contract, so a torn
    * split must never produce segments that concatenate to a different
    * file). Concatenating the returned segments in order reproduces the
    * input bytes exactly.
    */
  def dashSegments(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes.length < 8) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    def fourcc(pos: Int): String =
      if (pos + 4 <= bytes.length) new String(bytes, pos, 4, "US-ASCII")
      else ""
    if (fourcc(4) != "ftyp") return None
    // collect top-level (id, start, end)
    val boxes = Seq.newBuilder[(String, Int, Int)]
    var pos = 0
    while (pos + 8 <= bytes.length) {
      val rawSize = bb.getInt(pos)
      val size =
        if (rawSize == 0) bytes.length - pos
        else if (rawSize == 1) return None
        else rawSize
      if (size < 8 || pos + size > bytes.length) return None
      boxes += ((fourcc(pos + 4), pos, pos + size))
      pos += size
    }
    if (pos != bytes.length) return None
    val bs = boxes.result()
    val moovIdx = bs.indexWhere(_._1 == "moov")
    if (moovIdx < 0) return None
    if (bs.take(moovIdx).exists(b => b._1 == "moof" || b._1 == "mdat"))
      return None
    val segs = Seq.newBuilder[Array[Byte]]
    segs += java.util.Arrays.copyOfRange(bytes, 0, bs(moovIdx)._3)
    var i = moovIdx + 1
    while (i < bs.length) {
      if (bs(i)._1 != "moof" || i + 1 >= bs.length ||
        bs(i + 1)._1 != "mdat") return None
      segs += java.util.Arrays.copyOfRange(bytes, bs(i)._2, bs(i + 1)._3)
      i += 2
    }
    val out = segs.result()
    if (out.length < 2) None else Some(out)
  }

  /** the fragment walk: moov (trak entry/timing via the ordinary
    * per-trak parse, trex default duration) then every moof's
    * tfhd/trun expanded to absolute spans against its own base.
    * Strict: mfhd sequence numbers must run exactly 1..n, tfhd must
    * use default-base-is-moof, every span must lie inside the file,
    * and the moov trak must carry EMPTY tables (a file that is both
    * fragmented and tabled is malformed here — fail closed).
    */
  def fragmentTable(bytes: Array[Byte]): Option[FragTable] = {
    if (bytes.length < 8) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    def fourcc(pos: Int): String =
      if (pos + 4 <= bytes.length) new String(bytes, pos, 4, "US-ASCII")
      else ""
    def walk(start: Int, end: Int, depth: Int)(
        f: (String, Int, Int) => Option[Unit]): Option[Unit] = {
      if (depth > MaxBoxDepth) return None
      var pos = start
      while (pos + 8 <= end) {
        val rawSize = bb.getInt(pos)
        val id = fourcc(pos + 4)
        val size =
          if (rawSize == 0) end - pos
          else if (rawSize == 1) return None
          else rawSize
        if (size < 8 || pos + size > end) return None
        if (f(id, pos + 8, pos + size).isEmpty) return None
        pos += size
      }
      Some(())
    }
    if (fourcc(4) != "ftyp") return None
    // the moov trak parses through the ordinary walk: entry/timing from
    // the (empty-table) stbl, defaults from trex
    var entry = ""
    var delta = 0
    var timescale = 0
    var w = 0
    var h = 0
    var sawTrex = false
    var moovSeen = false
    val frags = Seq.newBuilder[Seq[(Int, Int)]]
    var nMoof = 0
    def parseMoof(ms: Int, me: Int, moofStart: Int): Option[Unit] = {
      var seq = -1
      var trunSpans: Option[Seq[(Int, Int)]] = None
      val walked = walk(ms, me, 1)((id1, ps, pe) => id1 match {
        case "mfhd" =>
          if (pe - ps < 8) None else { seq = bb.getInt(ps + 4); Some(()) }
        case "traf" =>
          walk(ps, pe, 2)((id2, ts, te) => id2 match {
            case "tfhd" =>
              // default-base-is-moof is the only base this walk speaks
              if (te - ts < 8 || (bb.getInt(ts) & 0x020000) == 0) None
              else Some(())
            case "trun" =>
              if (te - ts < 12) None
              else {
                val flags = bb.getInt(ts)
                val n = bb.getInt(ts + 4)
                // need data-offset + sample-size present
                if ((flags & 0x201) != 0x201 || n < 0 || n > MaxSamples ||
                  ts + 12 + 4L * n > te) None
                else {
                  var off = moofStart + bb.getInt(ts + 8)
                  val spans = (0 until n).map { i =>
                    val sz = bb.getInt(ts + 12 + 4 * i)
                    val sp = (off, sz)
                    off += sz
                    sp
                  }
                  if (spans.exists { case (o, s) =>
                    s < 0 || o < 0 || o.toLong + s > bytes.length }) None
                  else { trunSpans = Some(spans); Some(()) }
                }
              }
            case _ => Some(())
          })
        case _ => Some(())
      })
      if (walked.isEmpty) return None
      nMoof += 1
      // live-stream integrity: fragments must arrive exactly in order
      if (seq != nMoof) return None
      trunSpans.map { sp => frags += sp; () }
    }
    val walked = walk(0, bytes.length, 0)((id, ms, me) => id match {
      case "moov" =>
        moovSeen = true
        walk(ms, me, 1)((id1, ps, pe) => id1 match {
          case "mvhd" =>
            if (pe - ps < 16) None
            else { timescale = bb.getInt(ps + 12); Some(()) }
          case "mvex" =>
            walk(ps, pe, 2)((id2, ts, te) => id2 match {
              case "trex" =>
                if (te - ts < 24) None
                else { delta = bb.getInt(ts + 12); sawTrex = true; Some(()) }
              case _ => Some(())
            })
          case "trak" =>
            walk(ps, pe, 2)((id2, ds, de) => id2 match {
              case "tkhd" =>
                if (de - ds < 84) None
                else {
                  w = bb.getInt(de - 8) >>> 16
                  h = bb.getInt(de - 4) >>> 16
                  Some(())
                }
              case "mdia" =>
                walk(ds, de, 3)((id3, fs, fe) => id3 match {
                  case "minf" =>
                    walk(fs, fe, 4)((id4, ss, se) => id4 match {
                      case "stbl" =>
                        walk(ss, se, 5)((id5, xs, xe) => id5 match {
                          case "stsd" =>
                            if (xe - xs < 16 || bb.getInt(xs + 4) < 1)
                              None
                            else { entry = fourcc(xs + 12); Some(()) }
                          case "stsz" =>
                            // fragmented contract: the static table
                            // must be empty
                            if (xe - xs < 12 || bb.getInt(xs + 8) != 0)
                              None
                            else Some(())
                          case _ => Some(())
                        })
                      case _ => Some(())
                    })
                  case _ => Some(())
                })
              case _ => Some(())
            })
          case _ => Some(())
        })
      case "moof" => parseMoof(ms, me, ms - 8)
      case _ => Some(())
    })
    if (walked.isEmpty || !moovSeen || !sawTrex || entry.isEmpty) None
    else {
      val fr = frags.result()
      if (fr.isEmpty) None
      else Some(FragTable(entry, timescale, delta, w, h, fr))
    }
  }

  // ── decode ───────────────────────────────────────────────────────────

  /** the parsed sample table of ONE trak: entry fourcc, hdlr type,
    * timing (timescale from the trak's own mdhd), chunk count (stco
    * grain), and per-sample absolute (offset, size) spans — the walk's
    * codec-agnostic output
    */
  final case class SampleTable(entry: String, timescale: Int,
      sampleDelta: Int, width: Int, height: Int, nChunks: Int,
      spans: Seq[(Int, Int)], handler: String = "vide")

  /** strict JPEG-track decode: the full walk, then every sample through
    * the baseline JPEG pipeline; any undecodable sample fails the FILE
    */
  def decode(bytes: Array[Byte]): Option[Mp4] =
    sampleTable(bytes).filter(_.entry == "jpeg").flatMap { st =>
      val frames = st.spans.map { case (off, sz) =>
        JpegCodec.decode(java.util.Arrays.copyOfRange(bytes, off, off + sz))
      }
      if (frames.forall(_.isDefined))
        Some(Mp4(st.timescale, st.sampleDelta, frames.map(_.get)))
      else None
    }

  /** strict motion-track decode: `mcv1` single-sample track, the sample
    * through the full [[MotionCodec]] inverse
    */
  def decodeMotion(bytes: Array[Byte]): Option[MotionCodec.Video] =
    sampleTable(bytes).filter(st =>
      st.entry == "mcv1" && st.spans.length == 1).flatMap { st =>
      val (off, sz) = st.spans.head
      MotionCodec.decode(java.util.Arrays.copyOfRange(bytes, off, off + sz))
    }

  /** single-trak convenience over [[sampleTables]]: the walk, strict
    * that the file carries EXACTLY one trak (the q505/q506 contract)
    */
  def sampleTable(bytes: Array[Byte]): Option[SampleTable] =
    sampleTables(bytes).collect { case Seq(one) => one }

  /** the codec-agnostic container walk: boxes to per-trak stbl, tables
    * to spans — one [[SampleTable]] per trak, in moov order. Strict:
    * returns None unless every traversed size is sane, EVERY trak's
    * tables are present and mutually consistent, and every span lies
    * inside the file (a file with one good and one torn trak fails
    * whole — a corrupt file must never silently shrink to fewer
    * tracks). Unknown boxes (free, udta, …) skip cleanly at every
    * level; `size == 0` (box extends to end of file) is honored for
    * top-level boxes as real muxers emit it; 64-bit `size == 1`
    * largesize boxes are rejected (fail-closed, documented).
    */
  def sampleTables(bytes: Array[Byte]): Option[Seq[SampleTable]] = {
    if (bytes.length < 8) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    def fourcc(pos: Int): String =
      if (pos + 4 <= bytes.length) new String(bytes, pos, 4, "US-ASCII")
      else ""
    // walk children of [start, end); invoke f(fourcc, payloadStart,
    // payloadEnd) per box; None on any torn size
    def walk(start: Int, end: Int, depth: Int)(
        f: (String, Int, Int) => Option[Unit]): Option[Unit] = {
      if (depth > MaxBoxDepth) return None
      var pos = start
      while (pos + 8 <= end) {
        // ISO-BMFF box header: 32-bit size FIRST, then the fourcc (the
        // reverse of RIFF's id-then-size)
        val rawSize = bb.getInt(pos)
        val id = fourcc(pos + 4)
        val size =
          if (rawSize == 0) end - pos          // to end of enclosing space
          else if (rawSize == 1) return None   // 64-bit boxes: fail closed
          else rawSize
        if (size < 8 || pos + size > end) return None
        if (f(id, pos + 8, pos + size).isEmpty) return None
        pos += size
      }
      Some(())
    }
    if (fourcc(4) != "ftyp") return None
    // per-trak parse state, reset at each trak box; a trak is committed
    // to `tables` only when all five stbl tables expanded consistently
    final class TrakState {
      var entry = ""
      var handler = ""
      var timescale = 0
      var delta = 0
      var w = 0
      var h = 0
      var sizes: Option[Seq[Int]] = None
      var chunkOffs: Option[Seq[Int]] = None
      var runs: Option[Seq[(Int, Int)]] = None
    }
    val tables = Seq.newBuilder[SampleTable]
    // NOTE: callbacks dispatch on the fourcc with an explicit `match`
    // (a `{ case ("x", a, b) => … }` literal for a Function3 type-checks
    // via tuple adaptation but never matches — it cost a debug session)
    def parseStbl(t: TrakState, s: Int, e: Int): Option[Unit] =
      walk(s, e, 6)((id, ps, pe) => id match {
        case "stsd" =>
          // version/flags + entry_count, then the first sample entry's
          // own size+fourcc header
          if (pe - ps < 16 || bb.getInt(ps + 4) < 1) None
          else { t.entry = fourcc(ps + 12); Some(()) }
        case "stts" =>
          if (pe - ps < 16 || bb.getInt(ps + 4) < 1) None
          else { t.delta = bb.getInt(ps + 12); Some(()) }
        case "stsz" =>
          if (pe - ps < 12) None
          else {
            val uniform = bb.getInt(ps + 4)
            val n = bb.getInt(ps + 8)
            if (n < 0 || n > MaxSamples) None
            else if (uniform != 0) {
              if (uniform < 0) None
              else { t.sizes = Some(Seq.fill(n)(uniform)); Some(()) }
            }
            else if (ps + 12 + 4L * n > pe) None
            else {
              t.sizes = Some((0 until n).map(i => bb.getInt(ps + 12 + 4 * i)))
              Some(())
            }
          }
        case "stsc" =>
          if (pe - ps < 8) None
          else {
            val n = bb.getInt(ps + 4)
            if (n < 0 || n > MaxSamples || ps + 8 + 12L * n > pe) None
            else {
              t.runs = Some((0 until n).map(i =>
                (bb.getInt(ps + 8 + 12 * i), bb.getInt(ps + 12 + 12 * i))))
              Some(())
            }
          }
        case "stco" =>
          if (pe - ps < 8) None
          else {
            val n = bb.getInt(ps + 4)
            if (n < 0 || n > MaxSamples || ps + 8 + 4L * n > pe) None
            else {
              t.chunkOffs = Some((0 until n).map(i => bb.getInt(ps + 8 + 4 * i)))
              Some(())
            }
          }
        case _ => Some(())
      })
    def parseTrak(ps: Int, pe: Int): Option[Unit] = {
      val t = new TrakState
      val walked = walk(ps, pe, 2)((id2, ds, de) => id2 match {
        case "tkhd" =>
          if (de - ds < 84) None
          else {
            t.w = bb.getInt(de - 8) >>> 16
            t.h = bb.getInt(de - 4) >>> 16
            Some(())
          }
        case "mdia" =>
          walk(ds, de, 3)((id3, fs, fe) => id3 match {
            case "mdhd" =>
              // payload: verflags, creation, modification, THEN timescale
              if (fe - fs < 16) None
              else { t.timescale = bb.getInt(fs + 12); Some(()) }
            case "hdlr" =>
              // payload: verflags, pre_defined, THEN handler_type
              if (fe - fs < 12) None
              else { t.handler = fourcc(fs + 8); Some(()) }
            case "minf" =>
              walk(fs, fe, 4)((id4, ss, se) => id4 match {
                case "stbl" => parseStbl(t, ss, se)
                case _ => Some(())
              })
            case _ => Some(())
          })
        case _ => Some(())
      })
      if (walked.isEmpty) return None
      (for {
        sz <- t.sizes
        co <- t.chunkOffs
        rn <- t.runs
        if t.entry.nonEmpty && rn.nonEmpty
        spans <- expandSpans(sz, co, rn, bytes.length)
      } yield SampleTable(t.entry, t.timescale, t.delta,
        t.w, t.h, co.length, spans,
        if (t.handler.nonEmpty) t.handler else "vide"))
        .map { st => tables += st; () }
    }
    val walked = walk(0, bytes.length, 0)((id, ms, me) => id match {
      case "moov" =>
        walk(ms, me, 1)((id1, ps, pe) => id1 match {
          case "trak" => parseTrak(ps, pe)
          case _ => Some(())
        })
      case _ => Some(())
    })
    if (walked.isEmpty) None
    else Some(tables.result()).filter(_.nonEmpty)
  }

  /** expand stsc runs × stco offsets × stsz sizes into absolute
    * per-sample spans: run r covers chunks [first_r, first_{r+1});
    * samples lay out back to back within each chunk; every span must
    * lie inside the file and the tables must account for EXACTLY the
    * stsz sample count (leftover or missing samples fail the file)
    */
  private def expandSpans(sizes: Seq[Int], chunkOffs: Seq[Int],
      runs: Seq[(Int, Int)], fileLen: Int): Option[Seq[(Int, Int)]] = {
    if (sizes.exists(s => s < 0 || s > fileLen)) return None
    if (runs.head._1 != 1) return None
    val spans = Seq.newBuilder[(Int, Int)]
    var sample = 0
    var run = 0
    var chunk = 0 // 0-based
    while (chunk < chunkOffs.length && sample < sizes.length) {
      if (run + 1 < runs.length && chunk + 1 >= runs(run + 1)._1) run += 1
      val spc = runs(run)._2
      if (spc <= 0 || spc > MaxSamples) return None
      var off = chunkOffs(chunk)
      var i = 0
      while (i < spc && sample < sizes.length) {
        val s = sizes(sample)
        if (off < 0 || off.toLong + s > fileLen) return None
        spans += ((off, s))
        off += s
        sample += 1
        i += 1
      }
      chunk += 1
    }
    if (sample == sizes.length) Some(spans.result()) else None
  }
}
