package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.IntQuant

class IntQuantSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(sf("embeddings"))

  test("quant_dot ≡ the interpreted zip_with/aggregate HOF formulation") {
    val scale = 1024L
    val q = emb.select(col("vec_id"),
      transform(col("embedding"), x => floor(x.cast("double") * scale).cast("long")).as("ql"),
      col("embedding"))
    val pairs = q.select(col("vec_id").as("a_id"), col("ql").as("qa"), col("embedding").as("ea"))
      .crossJoin(q.select(col("vec_id").as("b_id"), col("ql").as("qb"), col("embedding").as("eb")))
      .where(col("a_id") < col("b_id") && col("a_id") < 10 && col("b_id") < 10)
    val mismatches = pairs.select(
        aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
          lit(0L), (a, v) => a + v).as("hof"),
        IntQuant.quantDot(col("ea"), col("eb"), scale).as("native"))
      .where(col("hof") =!= col("native")).count()
    assert(mismatches == 0)
  }

  test("quant_norm2 ≡ the HOF formulation") {
    val scale = 1024L
    val mismatches = emb.select(
        aggregate(transform(col("embedding"),
            x => { val q = floor(x.cast("double") * scale).cast("long"); q * q }),
          lit(0L), (a, v) => a + v).as("hof"),
        IntQuant.quantNorm2(col("embedding"), scale).as("native"))
      .where(col("hof") =!= col("native")).count()
    assert(mismatches == 0)
  }

  test("quant_dot is NULL on length mismatch") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val r = df.select(IntQuant.quantDot(col("a"), col("b"), 1024L).as("d")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("over-range inputs error loudly instead of wrapping (round-10 advice)") {
    // q ≈ 3e18 fits a Long but q·q overflows 64 bits: the kernel must
    // throw (the ANSI Column formulation's failure mode), not return a
    // silently wrapped value
    val big = Array(3.0e15f, 1.0f)
    val df = Seq((big, big)).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(IntQuant.quantDot(col("a"), col("b"), 1024L).as("d")).collect()
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("overflow") || msg.contains("quant overflow"), msg)
    // quantization itself beyond Long range (would otherwise SATURATE)
    val ex2 = intercept[Exception] {
      Seq(Array(1.0e19f)).toDF("a")
        .select(IntQuant.quantNorm2(col("a"), 1024L).as("n")).collect()
    }
    val msg2 = ex2.getMessage + Option(ex2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("quant overflow"), msg2)
  }
}
