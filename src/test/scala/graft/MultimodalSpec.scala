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
}
