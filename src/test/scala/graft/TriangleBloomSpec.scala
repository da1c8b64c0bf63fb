package graft

import org.scalatest.funsuite.AnyFunSuite

/** The copurchtri build ships two prune modes (see
  * GraphQueries.coPurchaseTriangles): the plain wedge stream in local
  * mode and the bloom-prefiltered closing join for cluster deployments.
  * The bloom's one-sided error must only ROUTE wedges, never decide
  * them — so both modes must produce the identical triple set.
  */
class TriangleBloomSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("bloom-prefiltered triangle build == plain build (exact triple set)") {
    def triples(useBloom: Boolean): Set[(Long, Long, Long)] =
      operators.GraphQueries.triangleTriplesBuild(spark, sf, useBloom)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = triples(useBloom = false)
    val bloomed = triples(useBloom = true)
    assert(plain.nonEmpty, "fixture must contain triangles")
    assert(bloomed == plain,
      s"bloom path diverged: ${bloomed.size} vs ${plain.size} triples")
  }
}
