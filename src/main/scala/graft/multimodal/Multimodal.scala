package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` content
  * plus typed metadata, with decode / feature-extraction / resize /
  * frame-sampling stages (BASELINE.json north-star; SURVEY.md §2.4).
  *
  * The Spark-side plumbing — schema, partition-parallel transforms,
  * deterministic batch shapes — is real and tested. The *codec* itself is a
  * STUB: this container has no image/audio libraries, so `decodeFeatures`,
  * `resize`, and `sampleFrames` derive their outputs deterministically from
  * the content bytes (hash-based fakes). A production deployment swaps the
  * marked expressions for a real decoder (JNI/native or a vectorized UDF);
  * every surrounding schema and shuffle stays identical.
  *
  * All stages are pure Column expressions → whole-stage codegen, no UDF
  * serialization, trivially distributed at 100 TB.
  */
object Multimodal {

  /** Media row schema: media_id, kind, content (binary), meta struct. */
  val KINDS = Seq("image", "audio", "video")

  /** The id column of the docs frame, ROUND-ROBIN REPARTITIONED to the
    * session's core count before the per-row codec stages every media
    * generator hangs off it. Without this, scan parallelism is bounded
    * by the INPUT FILE split count — a single small parquet file plans
    * one task, and the whole encode+decode pipeline (the only CPU-heavy
    * stage in the codec family) runs serially on one core while the
    * rest of the machine idles; exactly the shape the r13–r15 driver
    * passes could not attribute (a multi-second 1-task stage is
    * hostage to the one core it lands on, so it inflates under any
    * sibling load while every all-core sentinel reads flat). The
    * shuffle moves ONLY 8-byte ids (the compute-vs-bytes split of the
    * TextQueries/SimilarityQueries round-robin idiom, guide §2.3/§2.6:
    * decide placement with lightweight rows, keep heavy work after),
    * so it costs microseconds at any corpus scale and also levels the
    * generator's per-id cost skew (nf varies by id). defaultParallelism
    * tracks the session's core count — scale-adaptive, not a constant.
    */
  private def docIds(docs: DataFrame): Dataset[Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
  }

  /** Manufacture a media table from any (id, text) corpus — used by tests
    * and the oracle queries since the driver test data has no binary
    * column: content = UTF-8 bytes of the text (so DuckDB's VARCHAR md5
    * agrees with Spark's binary md5 on the same bytes).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(KINDS), (col("doc_id") % 3).cast("int") + 1).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).as("duration_ms")
      ).as("meta"))

  // ── real byte-level headers: synthesis + parsing ───────────────────────
  // The container has no image/audio test assets, so headers are
  // SYNTHESIZED — but with the real formats' magic numbers and field
  // layouts (PNG signature + IHDR dimensions as u32-BE; RIFF/WAVE with the
  // sample rate as u32-LE at the canonical offset; an MP4 ftyp box
  // followed by a duration field). The parser below reads METADATA FROM
  // CONTENT BYTES alone — magic-number dispatch, endian-correct field
  // decodes — which is the real capability; only pixel/sample DECODE
  // kernels remain stubbed.

  private val PngMagic: Array[Byte] = Array(0x89.toByte, 0x50, 0x4E, 0x47,
    0x0D, 0x0A, 0x1A, 0x0A)

  /** u32 big-endian bytes of an int column */
  private def be4(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
  /** u32 little-endian bytes of an int column */
  private def le4(c: Column): Column = {
    val h = lpad(hex(c), 8, "0")
    unhex(concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2)))
  }

  /** header length by kind: PNG 8+4+4+4+4, WAV RIFF..rate, MP4 ftyp+mvhd */
  val HeaderLen: Map[String, Int] =
    Map("image" -> 24, "audio" -> 28, "video" -> 24)

  /** prepend a format-faithful binary header derived from the meta struct:
    * the inverse of [[parseMeta]], used to manufacture test media whose
    * binary column carries REAL magic numbers and field layouts
    */
  def withBinaryHeaders(media: DataFrame): DataFrame = {
    val png = concat(lit(PngMagic), be4(lit(13)),
      lit("IHDR".getBytes("US-ASCII")),
      be4(col("meta.width")), be4(col("meta.height")))
    val wav = concat(lit("RIFF".getBytes("US-ASCII")),
      le4(octet_length(col("content")) + 20),
      lit("WAVEfmt ".getBytes("US-ASCII")), le4(lit(16)),
      // PCM format tag + mono channel (u16-LE each)
      lit(Array[Byte](1, 0, 1, 0)),
      le4(col("meta.sample_rate")))
    val mp4 = concat(be4(lit(24)), lit("ftypisom".getBytes("US-ASCII")),
      be4(lit(0)), lit("mvhd".getBytes("US-ASCII")),
      be4(col("meta.duration_ms").cast("int")))
    media.withColumn("content", concat(
      when(col("kind") === "image", png)
        .when(col("kind") === "audio", wav)
        .otherwise(mp4),
      col("content")))
  }

  /** parse typed metadata FROM THE CONTENT BYTES: magic-number dispatch,
    * u32 big/little-endian field decodes at the formats' offsets — pure
    * Column expressions, whole-stage codegen, no UDF. Unknown magics map
    * to kind='unknown' with null fields (never a crash on garbage bytes).
    */
  def parseMeta(content: Column): Column = {
    def beInt(pos: Int): Column =
      conv(hex(substring(content, pos, 4)), 16, 10).cast("int")
    def leInt(pos: Int): Column = {
      val h = hex(substring(content, pos, 4))
      conv(concat(substring(h, 7, 2), substring(h, 5, 2),
        substring(h, 3, 2), substring(h, 1, 2)), 16, 10).cast("int")
    }
    val isPng = substring(content, 1, 8) === lit(PngMagic)
    // RIFF alone is just a container magic (AVI, WebP, and WAV all use
    // it): require the 'WAVE' form tag at bytes 9-12 — mirroring
    // WavCodec's check — so other RIFF variants fall through to
    // kind='unknown' instead of decoding a garbage sample_rate at the
    // canonical fmt-chunk offset
    val isWav = substring(content, 1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
      substring(content, 9, 4) === lit("WAVE".getBytes("US-ASCII"))
    val isMp4 = substring(content, 5, 4) === lit("ftyp".getBytes("US-ASCII"))
    val nullInt = lit(null).cast("int")
    struct(
      when(isPng, "image").when(isWav, "audio").when(isMp4, "video")
        .otherwise("unknown").as("kind"),
      when(isPng, beInt(17)).otherwise(nullInt).as("width"),
      when(isPng, beInt(21)).otherwise(nullInt).as("height"),
      when(isWav, leInt(25)).otherwise(nullInt).as("sample_rate"),
      when(isMp4, beInt(21)).otherwise(nullInt).as("duration_ms"),
      when(isPng, lit(HeaderLen("image"))).when(isWav, lit(HeaderLen("audio")))
        .when(isMp4, lit(HeaderLen("video"))).otherwise(lit(0))
        .as("header_len"))
  }

  /** the payload bytes after the parsed header (identity on unknown kinds):
    * pass the [[parseMeta]] struct so the offset comes from the bytes
    */
  def payload(content: Column, parsed: Column): Column =
    content.substr(parsed.getField("header_len") + 1, octet_length(content))

  /** STUB DECODE: deterministic fake feature vector of `dim` doubles in
    * [0,1), derived from md5 of (content ‖ ":" ‖ i). A real deployment
    * replaces this expression with an actual decoder+embedder; the output
    * schema (`array<double>`) and everything downstream are unchanged.
    */
  def featureExpr(content: Column, dim: Int): Column =
    array((0 until dim).map { i =>
      conv(substring(md5(concat(content, lit(s":$i").cast("binary"))), 1, 8),
        16, 10).cast("long").cast("double") / lit(4294967296.0)
    }: _*)

  def decodeFeatures(media: DataFrame, dim: Int = 8): DataFrame =
    media.withColumn("features", featureExpr(col("content"), dim))

  final case class MediaFeatures(media_id: Long, features: Array[Double])

  /** The imperative-codec extension point: batch-shaped decode over
    * `mapPartitions` (the Scala analog of mapInPandas) for codecs that
    * can't be expressed as Column expressions. Rows stream through in
    * `batchSize` groups — a real decoder hands each group to native code
    * as one unit; the STUB derives the same deterministic features as
    * [[featureExpr]] (asserted equal in MultimodalSpec), so swapping in a
    * real codec changes no schema, partitioning, or downstream code.
    */
  def decodeFeaturesPartitioned(media: DataFrame, dim: Int = 8,
      batchSize: Int = 64): org.apache.spark.sql.Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup amortized across all rows (the point of the
        // mapPartitions extension point): one digest, no content copies
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.grouped(batchSize).flatMap { batch =>
          // <-- a real codec decodes `batch` as one unit here
          batch.iterator.map { case (id, content) =>
            MediaFeatures(id, Array.tabulate(dim) { i =>
              md.reset()
              md.update(content)
              md.update(s":$i".getBytes("UTF-8"))
              val d = md.digest()
              val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
                ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
              v.toDouble / 4294967296.0
            })
          }
        }
      }
  }

  /** The decoder-PARAMETERIZED batch extension point — the worked example
    * of plugging a third-party lossy codec (MP3/AAC/H.264 class) into the
    * engine (r12 verdict task 6). The contract a real decoder gets:
    *
    *   - `decode` is called once per ≤ `batchSize` group, PARTITION-LOCALLY
    *     on the executor (never on the driver) — the unit a native library
    *     would consume in one call;
    *   - it must answer STRICTLY per row, in order: `Some(features)` for a
    *     decodable row, `None` for one it cannot decode (corrupt bytes
    *     yield ABSENCE, never garbage features — the q140 strict-decode
    *     discipline); a wrong-length answer fails the task loudly;
    *   - output schema/partitioning are fixed by the engine, so swapping
    *     decoders changes no downstream code.
    *
    * MultimodalSpec drives a fake external decoder through this exact
    * entry point and asserts each clause. [[decodeFeaturesPartitioned]]
    * remains the zero-dependency stub instance of the same shape.
    */
  def decodeFeaturesWith(media: DataFrame, batchSize: Int = 64)(
      decode: Seq[(Long, Array[Byte])] => Seq[Option[MediaFeatures]])
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          val out = decode(batch)
          require(out.length == batch.length,
            s"decoder answered ${out.length} results for a " +
              s"${batch.length}-row batch — the contract is one per row")
          out.iterator.flatten
        }
      }
  }

  // ── REAL codec path: BMP end to end (no stub anywhere) ─────────────────
  // [[BmpCodec]] is a genuine 24-bit BMP implementation; these operators
  // run it through the batch (mapPartitions) extension point — the same
  // shape a JPEG/audio codec would use, but with nothing faked: encode,
  // strict decode, per-channel feature extraction, and nearest-neighbor
  // resize all operate on real pixel bytes and are oracle-checked
  // (q140/q141) against closed-form pixel arithmetic.

  final case class BmpStats(media_id: Long, width: Long, height: Long,
      sum_b: Long, sum_g: Long, sum_r: Long)

  /** the deterministic pixel formula shared with the DuckDB oracle:
    * pix(id, x, y, c) = ((id·31 + (y·w + x)·3 + c) · 7) mod 256
    */
  def bmpPixel(id: Long, w: Int, x: Int, y: Int, c: Int): Int =
    (((id * 31 + (y.toLong * w + x) * 3 + c) * 7) % 256).toInt

  /** real BMP media from any id column: dimensions from the id
    * (w ∈ 2..7, h ∈ 2..5), pixels from the closed-form formula, bytes
    * from the REAL encoder — every downstream read crosses the actual
    * file format
    */
  def bmpMediaFromDocuments(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions { ids =>
      ids.map { id =>
        val w = (id % 6 + 2).toInt
        val h = (id % 4 + 2).toInt
        val px = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < 3) {
              px((y * w + x) * 3 + c) = bmpPixel(id, w, x, y, c).toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
        id -> BmpCodec.encode(BmpCodec.Bmp(w, h, px))
      }
    }
  }

  /** 8×8 BMPs whose pixel CONTENT derives from `doc_id mod keyMod` while
    * the media keeps its own id — distinct documents deliberately share
    * pixel-identical images (the duplicate-image corpus q167 dedups).
    * Bytes come from the REAL encoder, so downstream dedup only works if
    * the decode path recovers the pixels exactly.
    */
  def bmpMediaKeyed(docs: DataFrame,
      keyMod: Long): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val side = 8
    docIds(docs).mapPartitions { ids =>
      ids.map { id =>
        val ck = id % keyMod
        val px = new Array[Byte](side * side * 3)
        var y = 0
        while (y < side) {
          var x = 0
          while (x < side) {
            var c = 0
            while (c < 3) {
              px((y * side + x) * 3 + c) = bmpPixel(ck, side, x, y, c).toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
        id -> BmpCodec.encode(BmpCodec.Bmp(side, side, px))
      }
    }
  }

  final case class BmpAHash(media_id: Long, ahash: String)

  /** Average-hash (aHash) perceptual fingerprint from DECODED pixels:
    * per-pixel integer gray = (b+g+r)/3 (truncating), bit i set iff
    * gray_i·n ≥ Σgray (the division-free mean test — exact in both
    * engines), rendered as a raster-order bit string. Byte-identical
    * images always collide; the oracle recomputes the bits closed-form,
    * so the decode path is load-bearing for every bit.
    */
  def bmpAHashes(media: Dataset[(Long, Array[Byte])]): Dataset[BmpAHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      BmpCodec.decode(bytes).map { img =>
        val n = img.width * img.height
        val gray = new Array[Long](n)
        var tot = 0L
        var i = 0
        while (i < n) {
          val b = img.pixels(i * 3) & 0xff
          val g = img.pixels(i * 3 + 1) & 0xff
          val r = img.pixels(i * 3 + 2) & 0xff
          gray(i) = (b + g + r) / 3
          tot += gray(i)
          i += 1
        }
        val sb = new java.lang.StringBuilder(n)
        i = 0
        while (i < n) {
          sb.append(if (gray(i) * n >= tot) '1' else '0')
          i += 1
        }
        BmpAHash(id, sb.toString)
      }
    })
  }

  /** q247's NEAR-dup corpus: like [[bmpMediaKeyed]] but with (a) a
    * SCRAMBLED pixel formula `((ck·2654435761 + (3i+c)·40503) mod 65521)
    * mod 256` — [[bmpPixel]]'s linear raster makes aHash masks collapse
    * onto a handful of phase-shifted sawtooth patterns, so unrelated
    * images collide at hamming ≤ 3 and pair counts go quadratic; the
    * scramble makes distinct keys behave like random 64-bit masks — and
    * (b) a deterministic one-pixel edit: every duplicate-group member
    * with `(doc_id div keyMod) % 3 == 1` gets +120 (mod 256) added to
    * all three channels of pixel `(doc_id div keyMod) % 64`. Same-key
    * images are near-identical (a few aHash bits apart), different keys
    * stay far. Bytes still cross the REAL encoder/decoder.
    */
  def bmpMediaKeyedPerturbed(docs: DataFrame,
      keyMod: Long): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val side = 8
    docIds(docs).mapPartitions { ids =>
      ids.map { id =>
        // BLOCK-LOCAL duplicate groups: ids share a group only within
        // their own keyMod·100-id block, so group size is bounded (~100)
        // no matter how large the corpus — near-dup pair counts scale
        // LINEARLY under ScaleUp's id-shifted replication instead of
        // quadratically (the r10 sf1 probe caught the plain `id % keyMod`
        // fixture going 18× on 10× data). Below id = keyMod·100 this is
        // exactly `id % keyMod`, so sf ≤ 0.1 outputs are unchanged.
        val ck = id % keyMod + keyMod * (id / (keyMod * 100))
        val grp = id / keyMod
        val perturbed = grp % 3 == 1
        val pi = (grp % 64).toInt
        val px = new Array[Byte](side * side * 3)
        var y = 0
        while (y < side) {
          var x = 0
          while (x < side) {
            val i = y * side + x
            var c = 0
            while (c < 3) {
              val base =
                (((ck * 2654435761L + (i * 3 + c) * 40503L) % 65521L)
                  % 256L).toInt
              val v = if (perturbed && i == pi) (base + 120) % 256 else base
              px(i * 3 + c) = v.toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
        id -> BmpCodec.encode(BmpCodec.Bmp(side, side, px))
      }
    }
  }

  final case class BmpAHashParts(media_id: Long, hi: Long, lo: Long)

  /** [[bmpAHashes]]' bits as two NUMERIC 32-bit halves (raster order,
    * MSB-first: hi = Σ_{i<32} bit_i·2^(31−i), lo = Σ_{32≤i<64}
    * bit_i·2^(63−i)) so LSH banding keys and hamming confirmation run as
    * pure integer ops (16-bit band extraction, xor + bit_count) instead
    * of string surgery — both engine-identical by construction.
    */
  def bmpAHashParts(
      media: Dataset[(Long, Array[Byte])]): Dataset[BmpAHashParts] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      BmpCodec.decode(bytes).map { img =>
        val n = img.width * img.height
        val gray = new Array[Long](n)
        var tot = 0L
        var i = 0
        while (i < n) {
          val b = img.pixels(i * 3) & 0xff
          val g = img.pixels(i * 3 + 1) & 0xff
          val r = img.pixels(i * 3 + 2) & 0xff
          gray(i) = (b + g + r) / 3
          tot += gray(i)
          i += 1
        }
        var hi = 0L
        var lo = 0L
        i = 0
        while (i < n && i < 64) {
          if (gray(i) * n >= tot) {
            if (i < 32) hi |= 1L << (31 - i)
            else lo |= 1L << (63 - i)
          }
          i += 1
        }
        BmpAHashParts(id, hi, lo)
      }
    })
  }

  final case class MuLawStats(media_id: Long, n_samples: Long,
      sum_abs_dec: Long, sum_sq_dec: Long, max_abs_err: Long)

  /** q253: per-clip PCM samples (the q142 closed-form formula) pushed
    * through the REAL lossy μ-law codec — encode to G.711 bytes, decode
    * back — with exact integer features of the QUANTIZED signal plus the
    * worst per-sample quantization error. The oracle replays
    * encode∘decode per sample in closed form (the segment algorithm is
    * pure integer math), so every quantized value is load-bearing: a
    * wrong segment bound, mantissa shift, bias, or sign convention
    * changes sums the hash match catches.
    */
  def mulawRoundtripStats(docs: DataFrame): Dataset[MuLawStats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions { ids =>
      ids.map { id =>
        val n = (id % 50 + 10).toInt
        val orig = Array.tabulate(n)(i =>
          (((id * 13L + i.toLong * 7L) % 2003L) - 1001L).toInt)
        val dec = MuLawCodec.decode(MuLawCodec.encode(orig))
        var sa = 0L; var sq = 0L; var me = 0L
        var i = 0
        while (i < n) {
          sa += math.abs(dec(i))
          sq += dec(i).toLong * dec(i)
          me = math.max(me, math.abs(orig(i) - dec(i)).toLong)
          i += 1
        }
        MuLawStats(id, n.toLong, sa, sq, me)
      }
    }
  }

  /** q254: per-clip PCM samples through the REAL STATEFUL lossy codec —
    * IMA ADPCM encode to packed nibbles, decode back — with exact
    * integer features of the reconstructed signal and the worst
    * per-sample error. Clips are short (n = id mod 16 + 5 ≤ 20) because
    * the oracle replays the adaptive state machine as UNROLLED SQL
    * rounds (the BPE-oracle discipline); the state threading means one
    * wrong transition anywhere shifts every later sample and breaks the
    * hash.
    */
  def adpcmRoundtripStats(docs: DataFrame): Dataset[MuLawStats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions { ids =>
      ids.map { id =>
        val n = (id % 16 + 5).toInt
        val orig = Array.tabulate(n)(i =>
          (((id * 13L + i.toLong * 7L) % 2003L) - 1001L).toInt)
        val dec = AdpcmCodec.decode(AdpcmCodec.encode(orig), n)
        var sa = 0L; var sq = 0L; var me = 0L
        var i = 0
        while (i < n) {
          sa += math.abs(dec(i))
          sq += dec(i).toLong * dec(i)
          me = math.max(me, math.abs(orig(i) - dec(i)).toLong)
          i += 1
        }
        MuLawStats(id, n.toLong, sa, sq, me)
      }
    }
  }

  /** REAL decode + feature extraction: strict BMP decode, exact integer
    * per-channel sums; undecodable rows are dropped (never crash, never
    * fake)
    */
  def bmpChannelStats(media: Dataset[(Long, Array[Byte])]): Dataset[BmpStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      BmpCodec.decode(bytes).map { img =>
        val (b, g, r) = BmpCodec.channelSums(img)
        BmpStats(id, img.width.toLong, img.height.toLong, b, g, r)
      }
    })
  }

  /** REAL resize: decode → nearest-neighbor resample → re-encode →
    * re-decode → stats, exercising both codec directions plus the kernel
    */
  def bmpResizeStats(media: Dataset[(Long, Array[Byte])], w2: Int,
      h2: Int): Dataset[BmpStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      for {
        img <- BmpCodec.decode(bytes)
        resized = BmpCodec.resizeNearest(img, w2, h2)
        back <- BmpCodec.decode(BmpCodec.encode(resized))
      } yield {
        val (b, g, r) = BmpCodec.channelSums(back)
        BmpStats(id, back.width.toLong, back.height.toLong, b, g, r)
      }
    })
  }

  // ── REAL entropy-coded image path: PNG (see [[PngCodec]]) ──────────────

  final case class PngStats(media_id: Long, width: Long, height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** the deterministic pixel formula shared with the DuckDB oracle
    * (constants distinct from [[bmpPixel]]'s so the two paths can never
    * accidentally validate each other):
    * pix(id, x, y, c) = ((id·37 + (y·w + x)·3 + c) · 11) mod 256
    */
  def pngPixel(id: Long, w: Int, x: Int, y: Int, c: Int): Int =
    (((id * 37 + (y.toLong * w + x) * 3 + c) * 11) % 256).toInt

  /** real PNG media from any id column: dimensions from the id
    * (w ∈ 2..6, h ∈ 2..6 — h reaches 6 so the encoder's per-row filter
    * cycle y mod 5 exercises ALL FIVE filter types incl. Paeth), pixels
    * from the closed-form formula, bytes from the REAL encoder (zlib
    * DEFLATE, multi-IDAT)
    */
  def pngMediaFromDocuments(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions(_.map { id =>
      val w = (id % 5 + 2).toInt
      val h = (id % 5 + 2).toInt
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            px((y * w + x) * 3 + c) = pngPixel(id, w, x, y, c).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      id -> PngCodec.encode(PngCodec.Png(w, h, px))
    })
  }

  /** REAL decode + feature extraction through the entropy coder: strict
    * PNG decode (inflate + unfilter), exact integer per-channel sums;
    * undecodable rows are dropped (never crash, never fake)
    */
  def pngChannelStats(media: Dataset[(Long, Array[Byte])]): Dataset[PngStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      PngCodec.decode(bytes).map { img =>
        val (r, g, b) = PngCodec.channelSums(img)
        PngStats(id, img.width.toLong, img.height.toLong, r, g, b)
      }
    })
  }

  /** [[pngPixel]] generalized to any channel count (q160's gray/RGBA
    * media): pix(id, x, y, c) = ((id·37 + (y·w + x)·nch + c) · 11) mod 256
    * — the nch=3 case IS pngPixel, so the formula family stays one thing
    * across the PNG queries.
    */
  def pngPixelN(id: Long, w: Int, x: Int, y: Int, c: Int, nch: Int): Int =
    (((id * 37 + (y.toLong * w + x) * nch + c) * 11) % 256).toInt

  final case class PngMultiStats(media_id: Long, color_type: Long,
      width: Long, height: Long, channel: Long, sum_v: Long)

  /** real PNG media across the color types corpora actually contain:
    * even ids encode GRAYSCALE (color type 0, 1 channel), odd ids RGBA
    * (color type 6, 4 channels) — through the same real encoder (zlib,
    * filter cycle, multi-IDAT). Dimensions w ∈ 2..6, h ∈ 2..5.
    */
  def pngMultiMediaFromDocuments(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions(_.map { id =>
      val colorType = if (id % 2 == 0) 0 else 6
      val nch = PngCodec.channelsOf(colorType)
      val w = (id % 5 + 2).toInt
      val h = (id % 4 + 2).toInt
      val px = new Array[Byte](w * h * nch)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < nch) {
            px((y * w + x) * nch + c) = pngPixelN(id, w, x, y, c, nch).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      id -> PngCodec.encode(PngCodec.Png(w, h, px, colorType))
    })
  }

  /** strict multi-format decode + per-channel reduction: one output row
    * per (image, channel) so gray and RGBA rows coexist in one typed
    * result; undecodable rows are dropped (never crash, never fake)
    */
  def pngMultiStats(media: Dataset[(Long, Array[Byte])]): Dataset[PngMultiStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      PngCodec.decode(bytes).toSeq.flatMap { img =>
        PngCodec.channelSumsN(img).zipWithIndex.map { case (sv, c) =>
          PngMultiStats(id, img.colorType.toLong, img.width.toLong,
            img.height.toLong, c.toLong, sv)
        }
      }
    })
  }

  // ── REAL baseline-DCT JPEG path (see [[JpegCodec]]) ────────────────────

  final case class JpegStats(media_id: Long, n_comp: Long, width: Long,
      height: Long, sum_px: Long)

  /** block-constant pixel formula shared with the DuckDB oracle
    * (constants distinct from the PNG/BMP families):
    * v(id, bx, by) = ((id·43 + by·wb + bx) · 13) mod 256 — constant per
    * 8×8 block so the lossy DCT recovers it EXACTLY under the flat
    * quant table (only the DC coefficient is nonzero; the q136/q137
    * exact-recovery regime), while per-block-different values keep the
    * differential DC Huffman path load-bearing across every MCU
    */
  def jpegBlockValue(id: Long, wb: Int, bx: Int, by: Int): Int =
    (((id * 43 + by.toLong * wb + bx) * 13) % 256).toInt

  /** real baseline JPEG media from any id column: even ids GRAYSCALE
    * (1 component), odd ids full 4:4:4 YCbCr COLOR with gray-valued
    * pixels (R=G=B ⟹ the JFIF color transform is exact: Y=v,
    * Cb=Cr=128), dims wb ∈ {1,2} × hb ∈ {1,2,3} blocks, bytes from the
    * REAL encoder (forward DCT, quantize, Huffman, stuffing)
    */
  def jpegMediaFromDocuments(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions(_.map { id =>
      val wb = (id % 2 + 1).toInt; val hb = (id % 3 + 1).toInt
      val w = wb * 8; val h = hb * 8
      val nc = if (id % 2 == 0) 1 else 3
      val px = new Array[Byte](w * h * nc)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = jpegBlockValue(id, wb, x / 8, y / 8).toByte
          var c = 0
          while (c < nc) {
            px((y * w + x) * nc + c) = v
            c += 1
          }
          x += 1
        }
        y += 1
      }
      // every fifth image carries RESTART MARKERS (DRI interval 1 — an
      // RST between every MCU, DC predictors reset each time), so the
      // oracle-checked decode path covers restarts too: same pixels,
      // different scan framing
      val ri = if (id % 5 == 0) 1 else 0
      id -> JpegCodec.encode(JpegCodec.Jpeg(w, h, nc, px),
        restartInterval = ri)
    })
  }

  /** REAL decode + feature extraction through the full baseline pipeline
    * (marker parse, DHT/DQT, Huffman, dequant, IDCT, color transform):
    * header metadata (component count, dims from SOF0) + the exact sum
    * of every decoded channel byte; undecodable rows are dropped (never
    * crash, never fake)
    */
  def jpegPixelStats(media: Dataset[(Long, Array[Byte])]): Dataset[JpegStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      JpegCodec.decode(bytes).map { img =>
        JpegStats(id, img.nComp.toLong, img.width.toLong,
          img.height.toLong, JpegCodec.pixelSum(img))
      }
    })
  }

  /** keyed JPEG media for dedup (the bmpMediaKeyed shape): image content
    * depends only on doc_id mod `keyMod`, so dup groups are guaranteed;
    * grayscale 32×32 (4×4 blocks of 8×8), block-constant in the
    * exact-recovery regime, per-block values from a formula family
    * distinct from [[jpegBlockValue]]'s: with idx = by·4+bx,
    * v(ck,idx) = ((ck+3)·(idx²+1)·7) mod 256 — the QUADRATIC index term
    * matters: a formula linear in idx makes every key a cyclic shift of
    * the same staircase and 97 keys collapse into 16 aHash patterns;
    * this one gives all 97 keys distinct fingerprints (simulated
    * exhaustively before pinning the oracle)
    */
  def jpegMediaKeyed(docs: DataFrame,
      keyMod: Long): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions(_.map { id =>
      val ck = id % keyMod
      val px = new Array[Byte](32 * 32)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 32) {
          val idx = (y / 8) * 4 + x / 8
          px(y * 32 + x) = (((ck + 3) * (idx * idx + 1) * 7) % 256).toByte
          x += 1
        }
        y += 1
      }
      id -> JpegCodec.encode(JpegCodec.Jpeg(32, 32, 1, px))
    })
  }

  final case class JpegAHash(media_id: Long, ahash: String)

  /** aHash fingerprint from REAL-DECODED JPEG pixels (the bmpAHashes
    * arithmetic on the grayscale plane): bit i set iff px_i·n ≥ Σpx —
    * the division-free mean test, exact in both engines. The full
    * baseline decode (Huffman, dequant, IDCT, level shift) sits under
    * every bit, so any codec defect splits or merges dup groups.
    */
  def jpegAHashes(media: Dataset[(Long, Array[Byte])]): Dataset[JpegAHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      JpegCodec.decode(bytes).filter(_.nComp == 1).map { img =>
        val n = img.width * img.height
        var tot = 0L
        var i = 0
        while (i < n) { tot += img.pixels(i) & 0xff; i += 1 }
        val sb = new java.lang.StringBuilder(n)
        i = 0
        while (i < n) {
          sb.append(if ((img.pixels(i) & 0xff).toLong * n >= tot) '1' else '0')
          i += 1
        }
        JpegAHash(id, sb.toString)
      }
    })
  }

  // ── REAL video path: RIFF/AVI with DIB frames (see [[AviCodec]]) ───────

  final case class AviFrameStats(media_id: Long, frame_idx: Long,
      width: Long, height: Long, sum_b: Long, sum_g: Long, sum_r: Long)

  /** per-frame pixel formula shared with the DuckDB oracle:
    * pix(id, f, x, y, c) = ((id·31 + f·101 + (y·w + x)·3 + c) · 7) mod 256
    */
  def aviPixel(id: Long, f: Int, w: Int, x: Int, y: Int, c: Int): Int =
    (((id * 31 + f.toLong * 101 + (y.toLong * w + x) * 3 + c) * 7) % 256).toInt

  /** Keyed AVI media: frame CONTENT (dims, frame count, pixels) depends
    * only on doc_id % keyMod — deliberate byte-identical video dups, the
    * q167/q176 dedup fixture for the video modality
    */
  def aviMediaKeyed(docs: DataFrame,
      keyMod: Long): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions(_.map { id =>
      val ck = id % keyMod
      val w = (ck % 6 + 2).toInt
      val h = (ck % 4 + 2).toInt
      val n = (ck % 4 + 2).toInt
      val frames = (0 until n).map { f =>
        val px = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < 3) {
              px((y * w + x) * 3 + c) = aviPixel(ck, f, w, x, y, c).toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
        BmpCodec.Bmp(w, h, px)
      }
      id -> AviCodec.encode(AviCodec.Avi(40000, frames))
    })
  }

  final case class AviVHash(media_id: Long, vhash: String)

  /** Video fingerprint from DECODED frames: each frame's aHash bit string
    * (per-pixel gray, division-free mean test — q167's arithmetic),
    * frames joined in order with '|'. Exact integers throughout, so the
    * oracle recomputes every bit closed-form from the pixel formula; a
    * container defect (frame order, dims, stride) changes the string.
    */
  def aviVHashes(media: Dataset[(Long, Array[Byte])]): Dataset[AviVHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      AviCodec.decode(bytes).map { avi =>
        val fbs = avi.frames.map { img =>
          val n = img.width * img.height
          val gray = new Array[Long](n)
          var tot = 0L
          var i = 0
          while (i < n) {
            val b = img.pixels(i * 3) & 0xff
            val g = img.pixels(i * 3 + 1) & 0xff
            val r = img.pixels(i * 3 + 2) & 0xff
            gray(i) = (b + g + r) / 3
            tot += gray(i)
            i += 1
          }
          val sb = new java.lang.StringBuilder(n)
          i = 0
          while (i < n) {
            sb.append(if (gray(i) * n >= tot) '1' else '0')
            i += 1
          }
          sb.toString
        }
        AviVHash(id, fbs.mkString("|"))
      }
    })
  }

  /** real AVI media: n ∈ 2..5 frames of (2..7)×(2..5) DIBs at 25 fps,
    * through the real container encoder
    */
  def aviMediaFromDocuments(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions(_.map { id =>
      val w = (id % 6 + 2).toInt
      val h = (id % 4 + 2).toInt
      val n = (id % 4 + 2).toInt
      val frames = (0 until n).map { f =>
        val px = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var c = 0
            while (c < 3) {
              px((y * w + x) * 3 + c) = aviPixel(id, f, w, x, y, c).toByte
              c += 1
            }
            x += 1
          }
          y += 1
        }
        BmpCodec.Bmp(w, h, px)
      }
      id -> AviCodec.encode(AviCodec.Avi(40000, frames))
    })
  }

  /** REAL frame sampling: container walk → every `stride`-th frame → DIB
    * decode → exact per-channel sums. The previous byte-slice
    * `sampleFrames` remains for opaque content; this path is the real
    * thing for the real container.
    */
  def aviSampledFrameStats(media: Dataset[(Long, Array[Byte])],
      stride: Int): Dataset[AviFrameStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      AviCodec.decode(bytes).toSeq.flatMap { v =>
        v.frames.zipWithIndex.collect {
          case (frame, f) if f % stride == 0 =>
            val (b, g, r) = BmpCodec.channelSums(frame)
            AviFrameStats(id, f.toLong, frame.width.toLong,
              frame.height.toLong, b, g, r)
        }
      }
    })
  }

  final case class AviDiff(media_id: Long, frame_idx: Long, sad: Long)

  /** REAL container walk → consecutive-frame SAD (sum of absolute byte
    * differences over the decoded BGR pixels): the change signal scene-cut
    * detection thresholds. Adjacent frames live in one container row, so
    * the diff is computed locally at decode time — no self-join of a
    * frame table, no shuffle. Rows with undecodable containers (or
    * mismatched frame dims) are dropped.
    */
  def aviFrameDiffs(media: Dataset[(Long, Array[Byte])]): Dataset[AviDiff] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      AviCodec.decode(bytes).toSeq.flatMap { v =>
        v.frames.sliding(2).zipWithIndex.flatMap {
          case (Seq(a, b), i) if a.width == b.width && a.height == b.height =>
            var sad = 0L
            var j = 0
            while (j < a.pixels.length) {
              sad += math.abs((a.pixels(j) & 0xff) - (b.pixels(j) & 0xff))
              j += 1
            }
            Some(AviDiff(id, (i + 1).toLong, sad))
          case _ => None
        }
      }
    })
  }

  // ── MJPEG path: JPEG frames in the AVI container (lossy video by
  //    composition — AviCodec walk × JpegCodec frames) ────────────────────

  /** per-block value formula shared with the DuckDB oracle:
    * v(ck, f, b) = ((ck + 3) · (f·17 + b² + 1) · 7) mod 256 — constant
    * per 8×8 block, so the lossy DCT recovers it EXACTLY under the flat
    * quant (q179's exact-recovery regime); the QUADRATIC block-index
    * term keeps every key's fingerprint distinct (the jpegMediaKeyed
    * lesson — verified exhaustively over all 97 keys at the 16-block
    * frame geometry before pinning the oracle), the f·17 term keeps
    * frames distinct within a video.
    */
  def mjpegBlockValue(ck: Long, f: Int, b: Int): Int =
    (((ck + 3) * (f.toLong * 17 + b.toLong * b + 1) * 7) % 256).toInt

  /** Keyed MJPEG media: video content depends only on doc_id % keyMod
    * (deliberate byte-identical dups — the q177 fixture, transform-domain
    * lossy flavor). Each video: nf = ck%3+2 grayscale 32×32 frames (4×4
    * blocks of 8×8, block-constant — 16 aHash bits per frame, enough to
    * separate every key), every frame through the REAL baseline JPEG
    * encoder, the stream through the REAL AVI container encoder as
    * '00dc' chunks.
    */
  def mjpegMediaKeyed(docs: DataFrame,
      keyMod: Long): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions(_.map { id =>
      val ck = id % keyMod
      val nf = (ck % 3 + 2).toInt
      val frames = (0 until nf).map { f =>
        val px = new Array[Byte](32 * 32)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 32) {
            val b = (y / 8) * 4 + x / 8
            px(y * 32 + x) = mjpegBlockValue(ck, f, b).toByte
            x += 1
          }
          y += 1
        }
        JpegCodec.Jpeg(32, 32, 1, px)
      }
      id -> AviCodec.encodeMjpeg(AviCodec.Mjpeg(40000, frames))
    })
  }

  final case class MjpegStats(media_id: Long, n_frames: Long,
      width: Long, height: Long, sum_px: Long)

  /** REAL MJPEG decode → features: container walk, per-frame full
    * baseline JPEG decode (marker parse, DHT/DQT, Huffman, dequant,
    * IDCT), exact sum of every decoded byte across all frames.
    * Undecodable rows are dropped (never crash, never fake).
    */
  def mjpegPixelStats(media: Dataset[(Long, Array[Byte])]): Dataset[MjpegStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      AviCodec.decodeMjpeg(bytes).filter(_.frames.nonEmpty).map { v =>
        var tot = 0L
        v.frames.foreach { img =>
          var i = 0
          while (i < img.pixels.length) { tot += img.pixels(i) & 0xff; i += 1 }
        }
        MjpegStats(id, v.frames.length.toLong, v.frames.head.width.toLong,
          v.frames.head.height.toLong, tot)
      }
    })
  }

  final case class MjpegVHash(media_id: Long, vhash: String)

  /** Video fingerprint from MJPEG-DECODED frames: per-frame aHash over
    * the decoded grayscale plane (division-free mean test), frames
    * joined in order with '|' — [[aviVHashes]]'s contract with the full
    * JPEG pipeline under every bit, so any defect in the container walk
    * OR the entropy/transform layers splits or merges dup groups.
    */
  def mjpegVHashes(media: Dataset[(Long, Array[Byte])]): Dataset[MjpegVHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      AviCodec.decodeMjpeg(bytes)
        .filter(v => v.frames.nonEmpty && v.frames.forall(_.nComp == 1))
        .map { v =>
        val fbs = v.frames.map { img =>
          val n = img.width * img.height
          var tot = 0L
          var i = 0
          while (i < n) { tot += img.pixels(i) & 0xff; i += 1 }
          val sb = new java.lang.StringBuilder(n)
          i = 0
          while (i < n) {
            sb.append(if ((img.pixels(i) & 0xff).toLong * n >= tot) '1' else '0')
            i += 1
          }
          sb.toString
        }
        MjpegVHash(id, fbs.mkString("|"))
      }
    })
  }

  // ── MP4 path: JPEG samples behind the ISO-BMFF sample tables (the
  //    container family modern corpora carry — Mp4Codec walk × JpegCodec
  //    frames, the mjpeg composition re-hosted) ──────────────────────────

  /** MP4 media keyed like [[mjpegMediaKeyed]] (same block-constant
    * exact-recovery frames, same [[mjpegBlockValue]] formula the oracle
    * mirrors), but wrapped in the REAL ISO-BMFF container: ftyp + mdat +
    * moov with full stsd/stts/stsc/stsz/stco tables, multi-chunk layout
    * (3 + 2 + … samples per chunk) so stsc run expansion does real work
    */
  def mp4MediaKeyed(docs: DataFrame,
      keyMod: Long): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions(_.map { id =>
      val ck = id % keyMod
      val nf = (ck % 3 + 2).toInt
      val frames = (0 until nf).map { f =>
        val px = new Array[Byte](32 * 32)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 32) {
            val b = (y / 8) * 4 + x / 8
            px(y * 32 + x) = mjpegBlockValue(ck, f, b).toByte
            x += 1
          }
          y += 1
        }
        JpegCodec.Jpeg(32, 32, 1, px)
      }
      id -> Mp4Codec.encode(Mp4Codec.Mp4(1000000, 40000, frames))
    })
  }

  final case class Mp4Stats(media_id: Long, n_frames: Long, n_chunks: Long,
      duration_ticks: Long, width: Long, height: Long, sum_px: Long)

  /** REAL MP4 decode → features: the full box walk + sample-table
    * expansion, every sample through the baseline JPEG pipeline, plus
    * the table-grain audit columns (chunk count from stco, duration from
    * stts × stsz count) so the WALK, not just the frames, is under the
    * oracle hash. Undecodable rows are dropped (never crash, never fake).
    */
  def mp4PixelStats(media: Dataset[(Long, Array[Byte])]): Dataset[Mp4Stats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      for {
        st <- Mp4Codec.sampleTable(bytes)
        v <- Mp4Codec.decode(bytes)
        if v.frames.nonEmpty
      } yield {
        var tot = 0L
        v.frames.foreach { img =>
          var i = 0
          while (i < img.pixels.length) { tot += img.pixels(i) & 0xff; i += 1 }
        }
        Mp4Stats(id, v.frames.length.toLong, st.nChunks.toLong,
          v.frames.length.toLong * st.sampleDelta,
          v.frames.head.width.toLong, v.frames.head.height.toLong, tot)
      }
    })
  }

  /** multi-track MP4 media: the q505 JPEG video trak PLUS a mono μ-law
    * audio trak (entry `ulaw`, 8000 Hz, uniform-stsz single-byte
    * samples, 16-sample chunks + remainder), the two traks' chunks
    * INTERLEAVED in one mdat — so per-trak stco/stsc independence is
    * load-bearing: a reader that assumes contiguous per-track payload
    * reads the other track's bytes. Audio content is the q253 linear
    * ramp s(i) = ((id·11 + i·7) mod 2003) − 1001 through the REAL μ-law
    * encoder, so the decoded samples are the closed-form encode∘decode
    * the oracle replays.
    */
  def mp4AvMediaKeyed(docs: DataFrame,
      keyMod: Long): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions(_.map { id =>
      val ck = id % keyMod
      val nf = (ck % 3 + 2).toInt
      val frames = (0 until nf).map { f =>
        val px = new Array[Byte](32 * 32)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 32) {
            val b = (y / 8) * 4 + x / 8
            px(y * 32 + x) = mjpegBlockValue(ck, f, b).toByte
            x += 1
          }
          y += 1
        }
        JpegCodec.encode(JpegCodec.Jpeg(32, 32, 1, px))
      }
      val na = (ck % 40 + 20).toInt
      val audio = (0 until na).map { i =>
        Array(MuLawCodec.encodeSample(
          (((ck * 11 + i * 7) % 2003) - 1001).toInt))
      }
      val video = Mp4Codec.Track("jpeg", "vide", 1000000, 40000, 32, 32,
        frames, Mp4Codec.chunkSizes(nf))
      val audioChunks =
        Seq.fill(na / 16)(16) ++ (if (na % 16 > 0) Seq(na % 16) else Nil)
      val audioTrack = Mp4Codec.Track("ulaw", "soun", 8000, 1, 0, 0,
        audio, audioChunks, uniformStsz = true)
      id -> Mp4Codec.encodeMux(Seq(video, audioTrack))
    })
  }

  final case class Mp4AvStats(media_id: Long, n_frames: Long, n_audio: Long,
      v_chunks: Long, a_chunks: Long, v_dur_ticks: Long, a_dur_ticks: Long,
      sum_px: Long, sum_abs_dec: Long, sum_sq_dec: Long)

  /** multi-track MP4 decode → features: the walk must surface EXACTLY
    * one `vide` and one `soun` trak; every video sample decodes through
    * the baseline JPEG pipeline, every audio sample through the μ-law
    * expander; table-grain audit columns (per-trak chunk counts and
    * stts×stsz durations) ride beside the content sums so the per-trak
    * walk — not just the payloads — is under the oracle hash.
    * Undecodable rows are dropped (never crash, never fake).
    */
  def mp4AvStats(media: Dataset[(Long, Array[Byte])]): Dataset[Mp4AvStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      for {
        sts <- Mp4Codec.sampleTables(bytes)
        vt <- sts.find(_.handler == "vide")
        at <- sts.find(_.handler == "soun")
        if sts.length == 2 && vt.entry == "jpeg" && at.entry == "ulaw"
        frames = vt.spans.map { case (off, sz) =>
          JpegCodec.decode(java.util.Arrays.copyOfRange(bytes, off, off + sz))
        }
        if frames.nonEmpty && frames.forall(_.isDefined)
      } yield {
        var sumPx = 0L
        frames.foreach { f =>
          val px = f.get.pixels
          var i = 0
          while (i < px.length) { sumPx += px(i) & 0xff; i += 1 }
        }
        var sumAbs = 0L
        var sumSq = 0L
        at.spans.foreach { case (off, sz) =>
          var i = 0
          while (i < sz) {
            val s = MuLawCodec.decodeSample(bytes(off + i)).toLong
            sumAbs += math.abs(s)
            sumSq += s * s
            i += 1
          }
        }
        val nAudio = at.spans.length.toLong // 1 μ-law byte per sample
        Mp4AvStats(id, frames.length.toLong, nAudio,
          vt.nChunks.toLong, at.nChunks.toLong,
          frames.length.toLong * vt.sampleDelta, nAudio * at.sampleDelta,
          sumPx, sumAbs, sumSq)
      }
    })
  }

  /** fragmented-MP4 media (fMP4 — the DASH/HLS live layout): the SAME
    * exact-recovery JPEG frames as [[mp4MediaKeyed]], but carried as
    * moof/mdat fragment pairs behind an empty-table moov + mvex/trex —
    * no finalized sample table anywhere in the file. The fragment
    * schedule is deliberately non-uniform (2 samples in the first
    * fragment, 1 in each after) so the per-moof trun expansion and the
    * 1-based mfhd sequence check both do real work.
    */
  def mp4FragMediaKeyed(docs: DataFrame,
      keyMod: Long): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions(_.map { id =>
      val ck = id % keyMod
      val nf = (ck % 3 + 2).toInt
      val frames = (0 until nf).map { f =>
        val px = new Array[Byte](32 * 32)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 32) {
            val b = (y / 8) * 4 + x / 8
            px(y * 32 + x) = mjpegBlockValue(ck, f, b).toByte
            x += 1
          }
          y += 1
        }
        JpegCodec.encode(JpegCodec.Jpeg(32, 32, 1, px))
      }
      val t = Mp4Codec.Track("jpeg", "vide", 1000000, 40000, 32, 32,
        frames, Mp4Codec.chunkSizes(nf))
      val sched = if (nf <= 2) Seq(nf) else 2 +: Seq.fill(nf - 2)(1)
      id -> Mp4Codec.encodeFragmented(t, sched)
    })
  }

  final case class Mp4FragStats(media_id: Long, n_frames: Long,
      n_frags: Long, duration_ticks: Long, width: Long, height: Long,
      sum_px: Long)

  /** fMP4 decode → features: the moof/tfhd/trun fragment walk (trex
    * default duration, per-moof absolute spans), every sample through
    * the baseline JPEG pipeline; the fragment count and the trex-derived
    * duration ride beside the pixel sum so the FRAGMENT walk — not just
    * the frames — is under the oracle hash. Undecodable rows dropped.
    */
  def mp4FragStats(media: Dataset[(Long, Array[Byte])])
      : Dataset[Mp4FragStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      fragStatsOf(id, bytes)
    })
  }

  /** one fragmented file → its [[Mp4FragStats]] row (the q509 decode,
    * shared with the streaming reassembly path): fragment walk, every
    * sample through the baseline JPEG pipeline, None on anything torn
    */
  private[multimodal] def fragStatsOf(id: Long,
      bytes: Array[Byte]): Option[Mp4FragStats] =
    for {
      ft <- Mp4Codec.fragmentTable(bytes)
      if ft.entry == "jpeg"
      frames = ft.frags.flatten.map { case (off, sz) =>
        JpegCodec.decode(java.util.Arrays.copyOfRange(bytes, off, off + sz))
      }
      if frames.nonEmpty && frames.forall(_.isDefined)
    } yield {
      var tot = 0L
      frames.foreach { f =>
        val px = f.get.pixels
        var i = 0
        while (i < px.length) { tot += px(i) & 0xff; i += 1 }
      }
      Mp4FragStats(id, frames.length.toLong, ft.frags.length.toLong,
        frames.length.toLong * ft.sampleDelta,
        frames.head.get.width.toLong, frames.head.get.height.toLong, tot)
    }

  /** keyed state for the DASH reassembly stream: the expected segment
    * count (from the manifest row) and the segments collected so far
    */
  final case class DashState(nTotal: Int, segs: Map[Int, Array[Byte]])

  final case class Mp4StreamStats(media_id: Long, n_segments: Long,
      n_frames: Long, n_frags: Long, duration_ticks: Long, width: Long,
      height: Long, sum_px: Long)

  /** DASH-style stateful reassembly: segments of many media arrive
    * interleaved and OUT OF ORDER across micro-batches (media frag
    * rows may precede their init segment); keyed state per media_id
    * accumulates (seq → bytes) until all `n_segs` segments (known from
    * the manifest, as a real DASH client knows them from the MPD) are
    * present, then concatenates in seq order — reproducing the original
    * fragmented file byte-exactly — decodes it through the full
    * fragment walk, EMITS one stats row, and removes the state. State
    * is segment-sized per in-flight media and zero after emission, so
    * the operator survives an unbounded stream; works identically on a
    * batch frame (flatMapGroupsWithState executes once per group).
    * Incomplete media (a lost segment) emit nothing — fail closed.
    */
  def dashReassembly(segs: Dataset[(Long, Int, Int, Array[Byte])])
      : Dataset[Mp4StreamStats] = {
    val spark = segs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    segs.groupByKey(_._1)
      .flatMapGroupsWithState[DashState, Mp4StreamStats](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (id: Long, rows: Iterator[(Long, Int, Int, Array[Byte])],
            state: org.apache.spark.sql.streaming.GroupState[DashState]) =>
          var nTotal = state.getOption.map(_.nTotal).getOrElse(-1)
          var cur = state.getOption.map(_.segs)
            .getOrElse(Map.empty[Int, Array[Byte]])
          rows.foreach { case (_, seq, n, bytes) =>
            nTotal = n
            cur += (seq -> bytes)
          }
          if (nTotal > 0 && cur.size == nTotal &&
            (0 until nTotal).forall(cur.contains)) {
            state.remove()
            val whole = Array.newBuilder[Byte]
            (0 until nTotal).foreach(i => whole ++= cur(i))
            fragStatsOf(id, whole.result()).iterator.map(f =>
              Mp4StreamStats(f.media_id, nTotal.toLong, f.n_frames,
                f.n_frags, f.duration_ticks, f.width, f.height, f.sum_px))
          } else {
            state.update(DashState(nTotal, cur))
            Iterator.empty
          }
      }
  }

  // ── REAL audio path: PCM WAV (see [[WavCodec]]) ────────────────────────

  final case class WavStats(media_id: Long, sample_rate: Long,
      n_samples: Long, sum_sq: Long, peak: Long)

  /** the deterministic sample formula shared with the DuckDB oracle:
    * s(id, i) = ((id·13 + i·7) mod 2003) − 1001  (signed, fits 16-bit)
    */
  def wavSample(id: Long, i: Int): Short =
    (((id * 13 + i.toLong * 7) % 2003) - 1001).toShort

  /** real PCM WAV media from any id column: n ∈ 10..59 samples, rate from
    * the id, bytes from the REAL encoder
    */
  def wavMediaFromDocuments(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions(_.map { id =>
      val n = (id % 50 + 10).toInt
      val rate = (8000 + (id % 3) * 4000).toInt
      id -> WavCodec.encode(WavCodec.Wav(rate,
        Array.tabulate(n)(i => wavSample(id, i))))
    })
  }

  /** Keyed PCM WAV media: audio CONTENT depends only on doc_id % keyMod,
    * so the corpus carries deliberate byte-identical audio duplicates —
    * the q167-style dedup fixture, audio modality (bytes through the REAL
    * encoder)
    */
  def wavMediaKeyed(docs: DataFrame,
      keyMod: Long): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions(_.map { id =>
      val ck = id % keyMod
      val n = (ck % 50 + 10).toInt
      val rate = (8000 + (ck % 3) * 4000).toInt
      id -> WavCodec.encode(WavCodec.Wav(rate,
        Array.tabulate(n)(i => wavSample(ck, i))))
    })
  }

  final case class WavEHash(media_id: Long, ehash: String)

  /** Energy-hash perceptual fingerprint from DECODED samples: bit i set
    * iff s_i²·n ≥ Σs² (the division-free mean-energy test — aHash's
    * arithmetic, audio domain), rendered in sample order. Exact integers
    * throughout, so the oracle can recompute every bit closed-form from
    * the sample formula; undecodable rows are dropped (never crash,
    * never fake).
    */
  def wavEHashes(media: Dataset[(Long, Array[Byte])]): Dataset[WavEHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      WavCodec.decode(bytes).map { w =>
        val n = w.samples.length
        var tot = 0L
        var i = 0
        while (i < n) {
          val s = w.samples(i).toLong
          tot += s * s
          i += 1
        }
        val sb = new java.lang.StringBuilder(n)
        i = 0
        while (i < n) {
          val s = w.samples(i).toLong
          sb.append(if (s * s * n >= tot) '1' else '0')
          i += 1
        }
        WavEHash(id, sb.toString)
      }
    })
  }

  final case class WavFrame(media_id: Long, frame_idx: Long, n: Long,
      sum_sq: Long)

  /** REAL decode → fixed-length analysis frames: per frame the sample
    * count and exact integer energy Σs² (the last frame may be partial).
    * The frame grain is where every audio-analysis op (VAD, segmentation,
    * energy normalization) lives; emitting frames as ROWS keeps the
    * downstream math declarative DataFrame land. Undecodable rows dropped.
    */
  def wavFrameEnergies(media: Dataset[(Long, Array[Byte])],
      frameLen: Int): Dataset[WavFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      WavCodec.decode(bytes).toSeq.flatMap { w =>
        w.samples.grouped(frameLen).zipWithIndex.map { case (fr, f) =>
          var e = 0L
          var i = 0
          while (i < fr.length) {
            val s = fr(i).toLong
            e += s * s
            i += 1
          }
          WavFrame(id, f.toLong, fr.length.toLong, e)
        }
      }
    })
  }

  /** REAL decode + features: strict chunk-walking decode, exact integer
    * Σs²/peak; undecodable rows dropped
    */
  def wavStats(media: Dataset[(Long, Array[Byte])]): Dataset[WavStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      WavCodec.decode(bytes).map { w =>
        val (n, sumSq, peak) = WavCodec.stats(w)
        WavStats(id, w.sampleRate.toLong, n, sumSq, peak)
      }
    })
  }

  /** REAL resample: decode → nearest-neighbor to n2 → re-encode →
    * re-decode → features (both codec directions + the kernel)
    */
  def wavResampleStats(media: Dataset[(Long, Array[Byte])], n2: Int,
      newRate: Int): Dataset[WavStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      for {
        w <- WavCodec.decode(bytes)
        back <- WavCodec.decode(WavCodec.encode(
          WavCodec.resampleNearest(w, n2, newRate)))
      } yield {
        val (n, sumSq, peak) = WavCodec.stats(back)
        WavStats(id, back.sampleRate.toLong, n, sumSq, peak)
      }
    })
  }

  // ── REAL palette path: GIF87a + LZW (see [[GifCodec]]) ─────────────────

  final case class GifStats(media_id: Long, width: Long, height: Long,
      n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Real GIF87a media from the documents ids: a 4-color palette and the
    * index raster both closed-form in doc_id, bytes through the REAL
    * encoder (so the LZW compressor runs on every row). Shared formulas
    * with the DuckDB oracle:
    *   w = id%5+4, h = id%4+3, palette[k][ch] = ((id·31+k·13+ch·7)·11)%256,
    *   index(p) = (id·7+p·11)%4
    */
  def gifMediaFromDocuments(docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docIds(docs).mapPartitions(_.map { id =>
      val w = (id % 5 + 4).toInt
      val h = (id % 4 + 3).toInt
      val palette = new Array[Byte](4 * 3)
      var k = 0
      while (k < 4) {
        var ch = 0
        while (ch < 3) {
          palette(k * 3 + ch) = (((id * 31 + k * 13 + ch * 7) * 11) % 256).toByte
          ch += 1
        }
        k += 1
      }
      val idx = Array.tabulate[Byte](w * h)(p => ((id * 7 + p * 11) % 4).toByte)
      id -> GifCodec.encode(GifCodec.Gif(w, h, palette, idx))
    })
  }

  /** REAL decode + features: strict container walk + LZW decode, exact
    * integer per-channel sums of the palette-resolved pixels; undecodable
    * rows dropped (never crash, never fake)
    */
  def gifChannelStats(media: Dataset[(Long, Array[Byte])]): Dataset[GifStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { case (id, bytes) =>
      GifCodec.decode(bytes).map { g =>
        val (r, gg, b) = GifCodec.channelSums(g)
        GifStats(id, g.width.toLong, g.height.toLong,
          g.indices.length.toLong, r, gg, b)
      }
    })
  }

  /** STUB RESIZE: rewrites meta.width/height and stamps a checksum of the
    * would-be resized pixels (here: md5 of the original content + target
    * box — a real resize kernel goes where the md5 is).
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media
      .withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.duration_ms").as("duration_ms")))
      .withColumn("checksum", md5(concat(col("content"),
        lit(s":${w}x$h").cast("binary"))))

  /** STUB FRAME SAMPLING: emits `n` pseudo-frames per media row, each a
    * deterministic byte-slice of the content (per-frame offsets are the
    * real plumbing; a video codec would produce the bytes).
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media
      .withColumn("nbytes", octet_length(col("content")))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame", expr(
        s"substring(content, frame_idx * (nbytes div $n) + 1, nbytes div $n)"))
      .select(col("media_id"), col("kind"), col("frame_idx").cast("long").as("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
}
