package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.Ann

/** Similarity-search queries over `embeddings`. The brute-force top-k is
  * oracle-backed (ids+ranks only: similarity gaps ≥ 7.5e-6 at every SF, far
  * above cross-engine float noise). The IVF and hyperplane variants are
  * rows-only; AnnSpec pins their recall against brute force.
  */
object SimilarityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact cosine top-10 for the first 20 vectors as queries
    "q40_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Ann.bruteForceTopK(emb.where(col("vec_id") < 20), emb,
          "vec_id", "embedding", k = 10)
        .orderBy("query_id", "rank")
    }),

    // IVF: 16 cells, 4 probes (rows-only; recall pinned in AnnSpec)
    "q41_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Ann.ivfTopK(emb.where(col("vec_id") < 20), emb,
          "vec_id", "embedding", k = 10, nCentroids = 16, nProbe = 4)
        .orderBy("query_id", "rank")
    }),

    // hyperplane LSH signatures (rows-only; deterministic)
    "q42_hyperplane_sig" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          Ann.hyperplaneSignature(col("embedding"), nBits = 32, seed = 42L).as("sig"))
        .orderBy("vec_id")),

    // IVF approximation quality as a MEASURED output: per-query recall@10
    // of q41's IVF result against q40's exact brute force (same config) —
    // the driver tracks the number round over round instead of trusting a
    // spec constant. Pure relational over two deterministic top-k outputs
    // (tiny: 20 queries × k rows each); rows-only because the IVF side
    // inherits q41's xxhash64 centroid sample, which has no DuckDB twin.
    // The aggregate recall is additionally pinned in AnnSpec.
    "q47_ivf_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 20)
      val bf = Ann.bruteForceTopK(q, emb, "vec_id", "embedding", k = 10)
      val ivf = Ann.ivfTopK(q, emb, "vec_id", "embedding",
        k = 10, nCentroids = 16, nProbe = 4)
      val hits = bf.join(ivf.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
      bf.groupBy("query_id").agg(count(lit(1)).as("n_true"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), col("n_true"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_true"))
            .as("recall"))
        .orderBy("query_id")
    }))

  val oracle: Map[String, String] = Map(
    "q40_ann_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 20),
        |sims AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(q.emb, e.emb) DESC, e.vec_id) AS rank
        |  FROM q JOIN e ON q.vec_id <> e.vec_id)
        |SELECT query_id, rank, neighbor_id FROM sims WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin)
}
