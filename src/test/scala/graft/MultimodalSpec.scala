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
}
