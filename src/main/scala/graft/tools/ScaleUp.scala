package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the driver's testdata: writes `factor`
  * replica-shifted copies of each table so scale claims argued at sf0.1 can
  * be MEASURED at sf1 (judge r10, Next #7). Replication must not change the
  * workload's SHAPE, only its size — naive row duplication would: 10 exact
  * copies of every document are all near-duplicates of each other, so LSH
  * edge counts grow ~45× (pairs within each replica clique), not 10×, and
  * any super-linearity measured would be an artifact of the generator.
  * Per-table replica transforms that preserve within-replica structure
  * exactly while decorrelating replicas:
  *
  *  - documents: per-replica Caesar shift of the letters (a bijection on
  *    the alphabet — shingle equality WITHIN a replica is preserved, so
  *    each replica carries the original corpus's exact near-dup structure;
  *    ACROSS replicas shingle sets are disjoint, so components replicate
  *    10×, never merge). Lengths unchanged → n_chars stays valid.
  *  - embeddings: cyclic dimension rotation by the replica index (an
  *    isometry — within-replica cosines exact; across replicas ~random).
  *  - TPC-H facts/dims: key offset r·10^7 applied consistently on both
  *    sides of every FK so each replica joins only within itself.
  *  - nation/region: fixed dimensions, copied once (TPC-H semantics).
  *
  * Usage: runMain graft.tools.ScaleUp <inSfDir> <outDir> <factor>
  */
object ScaleUp {
  private val K = 10000000L

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <inSfDir> <outDir> <factor>")
    val Array(in, out, factorS) = args
    val factor = factorS.toInt
    // hard cap 26: the Caesar shift wraps at 26, so replica r ≥ 26 would
    // carry text BYTE-IDENTICAL to replica r-26 — recreating exactly the
    // cross-replica LSH merge artifact this tool exists to prevent (and
    // the embedding rotation needs r < dim, 64 in the driver testdata)
    require(factor >= 1 && factor <= 26,
      s"factor $factor out of range [1, 26]: the replica decorrelators " +
        "(Caesar mod 26, dimension rotation) repeat past 26")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$in/$name.parquet")
    def write(name: String)(df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    /** `factor` replica transforms unioned — each replica is one narrow
      * map over the source scan, so the whole generator is scan-bound. */
    def replicate(df: DataFrame)(tx: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(r => tx(df, r)).reduce(_ union _)

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def caesar(r: Int): String => org.apache.spark.sql.Column = colName => {
      val s = r % 26
      val from = lower + upper
      val to = lower.drop(s) + lower.take(s) + upper.drop(s) + upper.take(s)
      translate(col(colName), from, to)
    }

    write("documents")(replicate(t("documents")) { (df, r) =>
      df.select((col("doc_id") + lit(r * K)).as("doc_id"),
        caesar(r)("text").as("text"), col("lang"), col("source"), col("n_chars"))
    })
    write("embeddings")(replicate(t("embeddings")) { (df, r) =>
      val rot =
        if (r == 0) col("embedding")
        else concat(expr(s"slice(embedding, ${r + 1}, size(embedding) - $r)"),
          expr(s"slice(embedding, 1, $r)"))
      df.select((col("vec_id") + lit(r * K)).as("vec_id"),
        rot.as("embedding"), col("label"))
    })
    write("lineitem")(replicate(t("lineitem")) { (df, r) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(r * K))
        .withColumn("l_partkey", col("l_partkey") + lit(r * K))
        .withColumn("l_suppkey", col("l_suppkey") + lit(r * K))
    })
    write("orders")(replicate(t("orders")) { (df, r) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(r * K))
        .withColumn("o_custkey", col("o_custkey") + lit(r * K))
    })
    write("customer")(replicate(t("customer")) { (df, r) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(r * K))
    })
    write("supplier")(replicate(t("supplier")) { (df, r) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(r * K))
    })
    write("part")(replicate(t("part")) { (df, r) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(r * K))
    })
    write("events")(replicate(t("events")) { (df, r) =>
      df.withColumn("event_id", col("event_id") + lit(r * K))
        .withColumn("user_id", col("user_id") + lit(r * K))
    })
    write("nation")(t("nation"))
    write("region")(t("region"))
    spark.stop()
  }
}
