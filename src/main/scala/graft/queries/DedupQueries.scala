package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Deduplication queries over the `documents`/`embeddings` tables. The
  * SQL-expressible ones (exact hash groups, exact n-gram Jaccard, exact
  * embedding cosine) carry DuckDB oracles; the hash-family-dependent ones
  * (MinHash/LSH, SimHash — xxhash64 has no DuckDB twin) are registered
  * without oracles (driver records rows-only) and are instead pinned by
  * GraftDedupSpec against planted near-duplicates.
  */
object DedupQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup groups on content hash
    "q20_exact_dedup" -> ((s, dir) =>
      Dedup.exactGroups(t(s, dir, "documents"), col("text"), col("doc_id"))
        .orderBy("keep_id")),

    // exact word-trigram Jaccard near-dup pairs, blocked by source
    "q21_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"),
          col("doc_id"), col("text"), col("source"), n = 3, threshold = 0.02)
        .orderBy("a_id", "b_id")),

    // MinHash 32-component signature, 8×4 banded LSH candidates with
    // estimated similarity (no oracle: xxhash64-specific)
    "q22_minhash_lsh" -> ((s, dir) => {
      // Native one-pass MinHash expression (the HOF formulation is
      // interpreted per element by Spark — measured 97 s for the signature
      // projection alone at sf0.1 vs <1 s native). Signatures travel
      // THROUGH the bucket self-join (siga/sigb carried on each side), so
      // the signature subtree is evaluated twice instead of four times and
      // nothing needs a session-lifetime cache.
      val sigs = t(s, dir, "documents")
        .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
        .where(size(col("toks")) >= 3)
        .select(col("doc_id"),
          Dedup.minhashSignatureNative(col("toks"), n = 3, m = 32).as("sig"))
      val buckets = Dedup.lshBuckets(sigs, col("doc_id"), col("sig"), bands = 8, rowsPerBand = 4)
      val l = buckets.select(col("band"), col("bucket"), col("id").as("a"), col("sig").as("siga"))
      val r = buckets.select(col("band"), col("bucket"), col("id").as("b"), col("sig").as("sigb"))
      l.join(r, Seq("band", "bucket")).where(col("a") < col("b"))
        .groupBy("a", "b")
        .agg(first(col("siga")).as("siga"), first(col("sigb")).as("sigb"))
        .withColumn("est_sim", Dedup.signatureSimilarity(col("siga"), col("sigb")))
        .where(col("est_sim") >= 0.3)
        .select(col("a").as("a_id"), col("b").as("b_id"), col("est_sim"))
        .orderBy("a_id", "b_id")
    }),

    // SimHash fingerprints + banded near-dup pairs (no oracle)
    "q23_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), col("doc_id"), col("text"),
          maxHamming = 6)
        .orderBy("a_id", "b_id")),

    // exact embedding cosine near-dup pairs (ids only — see oracle note)
    "q24_embedding_neardup" -> ((s, dir) =>
      Dedup.cosinePairs(t(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), lit(0), threshold = 0.4)
        .select("a_id", "b_id")
        .orderBy("a_id", "b_id")))

  val oracle: Map[String, String] = Map(
    "q20_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    // same integer set arithmetic (|∩| / (|A|+|B|-|∩|)) → bit-identical
    "q21_ngram_jaccard" ->
      """WITH docs AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents WHERE len(string_split(text,' ')) >= 3)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jacc
        |FROM docs a JOIN docs b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.02
        |ORDER BY a_id, b_id""".stripMargin,

    // ids only: cosine magnitudes differ in the last ulp between engines,
    // but the 0.4 threshold has ≥1e-5 margin to every pair at all SFs
    "q24_embedding_neardup" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin)
}
