package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Functions
import graft.ops.Similarity

/** The native CosineSimilarity expression must be bit-identical to the
  * composed-builtins recurrence it replaces (oracle results are
  * hash-compared — an ulp of drift is a correctness failure, not noise).
  */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  test("native cosine == composed cosine, bit for bit, over real embeddings") {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(5000)
      .select(
        Functions.cosine_sim(col("a.v"), col("b.v")).as("native"),
        Similarity.cosineComposed(col("a.v"), col("b.v")).as("composed"))
    assert(pairs.filter(col("native") =!= col("composed")).count() == 0)
    assert(pairs.filter(col("native").isNull).count() == 0)
  }

  test("hoisted-norm dot-product cosine == fused cosine, bit for bit") {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("n2", aggregate(transform(col("v"), x => x * x),
        lit(0.0), (acc, x) => acc + x))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(5000)
      .select(
        (Functions.dot_product(col("a.v"), col("b.v")) /
          sqrt(col("a.n2") * col("b.n2"))).as("hoisted"),
        Functions.cosine_sim(col("a.v"), col("b.v")).as("fused"))
    assert(pairs.filter(col("hoisted") =!= col("fused")).count() == 0)
  }

  test("cosine_sim is callable from SQL after registration") {
    Functions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head().getDouble(0)
    assert(r == 1.0)
  }

  test("edge cases: zero vector → NaN; empty arrays → NaN; null → null") {
    Functions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(0.0d, 0.0d), array(1.0d, 2.0d)) AS zero,
        |       cosine_sim(CAST(array() AS ARRAY<DOUBLE>),
        |                  CAST(array() AS ARRAY<DOUBLE>)) AS empty,
        |       cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS nul""".stripMargin).head()
    assert(r.getDouble(0).isNaN)
    assert(r.getDouble(1).isNaN)
    assert(r.isNullAt(2))
  }

  test("orthogonal and opposite vectors") {
    val r = Seq((Seq(1.0, 0.0), Seq(0.0, 3.0)), (Seq(1.0, 1.0), Seq(-1.0, -1.0)))
      .toDF("a", "b")
      .select(Functions.cosine_sim(col("a"), col("b")).as("c"))
      .as[Double].collect()
    assert(r(0) == 0.0 && r(1) == -1.0)
  }
}
