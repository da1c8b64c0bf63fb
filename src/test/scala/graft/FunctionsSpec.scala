package graft

import graft.functions.vec
import org.apache.spark.sql.graftshim.VectorDot
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** The native VectorDot expression: correctness on both the interpreted and
  * codegen paths, and exact agreement with the declarative HOF fold it
  * replaced (same IEEE operation order — required for oracle stability).
  */
class FunctionsSpec extends AnyFunSuite with SparkFixture {

  test("interpreted eval computes the sequential double fold") {
    def litArr(xs: Seq[Float]) =
      Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(FloatType))
    val e = VectorDot(litArr(Seq(1.0f, 2.0f, 3.0f)), litArr(Seq(4.0f, 5.0f, 6.0f)))
    assert(e.eval(null) == (1.0 * 4.0 + 2.0 * 5.0 + 3.0 * 6.0))
    // min-length semantics
    val short = VectorDot(litArr(Seq(2.0f)), litArr(Seq(3.0f, 9.0f)))
    assert(short.eval(null) == 6.0)
  }

  test("codegen path agrees exactly with the HOF fold on real embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
      .select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = a.crossJoin(b).filter(col("ida") < col("idb"))
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x.cast("array<double>"), y.cast("array<double>"),
        (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val diff = pairs
      .withColumn("native", vec.dot(col("va"), col("vb")))
      .withColumn("hof", hofDot(col("va"), col("vb")))
      .filter(col("native") =!= col("hof"))   // exact bitwise comparison
      .count()
    assert(diff == 0L)
  }

  test("vec.norm and vec.cosine compose from the native fold") {
    val row = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") === 0)
      .select(vec.norm(col("embedding")).as("n"),
        vec.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 0.05) // corpus is ~unit-norm
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
  }

  test("null input yields null (nullSafe paths)") {
    val r = spark.sql("SELECT CAST(NULL AS ARRAY<FLOAT>) AS a")
      .select(vec.dot(col("a"), col("a")).as("d")).collect().head
    assert(r.isNullAt(0))
  }

  test("VecMeanAggregator (typed UDAF) matches the declarative M-step") {
    // the Aggregator computes per-label mean vectors in ONE buffer per
    // group; the posexplode path (q83's shape) is the reference — values
    // agree to float-accumulation tolerance
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val udafMeans = e.groupBy("label")
      .agg(graft.functions.VecMeanAggregator.udafColumn(64)(col("embedding"))
        .as("mean_vec"))
      .collect()
      .map(r => r.getAs[Int]("label") ->
        r.getAs[scala.collection.Seq[Double]]("mean_vec").toSeq)
      .toMap
    val exploded = e
      .select(col("label"), posexplode(col("embedding").cast("array<double>"))
        .as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(avg(col("x")).as("m"))
      .collect()
      .groupBy(_.getAs[Int]("label"))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("m")).toSeq
      }
    assert(udafMeans.keySet == exploded.keySet)
    for ((l, ref) <- exploded; got = udafMeans(l)) {
      assert(got.length == 64)
      assert(ref.zip(got).forall { case (a, b) => math.abs(a - b) < 1e-9 },
        s"label $l mean vector mismatch")
    }
  }

  test("bloom bridge: no false negatives, bounded false positives, " +
      "distributed build == narrow build") {
    import graft.functions.bloom
    // distributed build: 16 partitions force map-side partial filters +
    // an OR-merge on the reduce side
    val members = spark.range(0L, 4096L, 1L, 16).select(col("id"))
    def build(df: org.apache.spark.sql.DataFrame): Array[Byte] =
      df.agg(bloom.filterAgg(xxhash64(col("id")), 4096L, 1L << 16).as("bf"))
        .head.getAs[Array[Byte]](0)
    val bf = build(members)
    // identical insert set through one partition must yield the identical
    // filter (merge is a pure bitwise OR — layout-independent)
    assert(java.util.Arrays.equals(bf, build(members.coalesce(1))))
    // every inserted key MUST probe positive (the exactness contract:
    // q164's confirm join only ever sees a superset of the true dups)
    val fn = members
      .filter(!bloom.mightContain(xxhash64(col("id")), lit(bf))).count()
    assert(fn == 0, s"$fn false negatives — bloom routing would drop dups")
    // non-members: false-positive rate stays near the sizing target
    // (4096 items in 2^16 bits ⇒ ~2.3% optimal; allow slack)
    val fp = spark.range(1000000L, 1032768L, 1L, 16)
      .filter(bloom.mightContain(xxhash64(col("id")), lit(bf))).count()
    assert(fp < 32768 * 0.10, s"$fp/32768 false positives — filter degenerate")
  }
}
