package graft.similarity

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Lloyd k-means over the embedding column, computed ENTIRELY on
  * the integer lattice floor(x · 2^20) so every step — assignment argmin,
  * mean update, inertia — is exact 64-bit arithmetic that replays
  * bit-identically in any engine (the q93/q134 discipline): no float
  * reassociation, no cross-engine ulp drift, hence a full DuckDB oracle for
  * the whole iterative algorithm, not just one pass.
  *
  * Shape per iteration (the MLlib KMeans shape):
  *   - centroids live on the DRIVER as a k×dim long array — a bounded
  *     collect (k·dim values, 512 longs at the default 8×64), broadcast back
  *     as a literal table each pass. The corpus never collects.
  *   - assignment = corpus exploded to (id, d, qv) ⋈ centroid(d) on the dim
  *     index (broadcast hash join, ≤ k rows per dim) → partial integer L2
  *     per (id, cid) via map-side combine → argmin as min(struct(d2, cid))
  *     (ties → lowest cid, total order, no window needed).
  *   - update = one groupBy(cid, d) over the assigned corpus; the mean is
  *     the plain truncating integer quotient Σqv div n — Spark's `div` and
  *     DuckDB's `//` BOTH truncate toward zero (verified: -7//2 = -3 in
  *     both), so the two engines agree on every sign with no shift and no
  *     overflow at any corpus size (Σqv ≤ n·scale·|x| stays far under 2^63
  *     where n·2^31 would not). Clusters that lose every point keep their
  *     previous centroid.
  *
  * At 100 TB: each round costs two scans of the quantized corpus — one
  * under the assignment aggregate, one under the update join (a long-lived
  * service persists the quantized form; re-derivation from columnar parquet
  * is the cheaper default here) — plus one shuffle of (cid, d) partials,
  * k·dim groups, nothing skewed; the only driver state is the k×dim model,
  * same as any broadcast ML model. Reference analogue: none (the reference
  * has no clustering); this is the SemDeDup/curation prerequisite.
  */
object Clustering {

  /** Quantization scale: floor(x·2^20) is exact in double for |x| < 2^32. */
  val Scale: Long = 1L << 20

  /** Corpus exploded to the integer lattice: (id, d, qv). */
  def quantized(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("d", "x")))
      .select(col("id"), col("d").cast("long").as("d"),
        floor(col("x").cast("double") * Scale).cast("long").as("qv"))

  /** Deterministic init: the k corpus rows with the smallest Mix64 sample
    * coordinate (the same portable coordinate the IVF centroids use),
    * quantized. Bounded collect: exactly k rows. */
  def initCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int): Array[Array[Long]] =
    corpus.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        graft.functions.Mix64.sampleCoord(col(idCol).cast("long")).as("_h"))
      .orderBy("_h", "id").limit(k)
      .select(transform(col("v"),
        x => floor(x.cast("double") * Scale).cast("long")).as("qv"))
      .collect()
      .map(_.getSeq[Long](0).toArray)

  private def centroidDF(spark: SparkSession, cents: Array[Array[Long]]): DataFrame = {
    val rows = for {
      (vec, cid) <- cents.zipWithIndex.toSeq
      (cq, d) <- vec.zipWithIndex
    } yield Row(cid.toLong, d.toLong, cq)
    val schema = StructType(Seq(
      StructField("cid", LongType, nullable = false),
      StructField("d", LongType, nullable = false),
      StructField("cq", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Nearest-centroid assignment under the given model: (id, cid, d2).
    * Ties break to the lowest cid via the struct total order. */
  def assign(qdf: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val spark = qdf.sparkSession
    qdf.join(broadcast(centroidDF(spark, cents)), Seq("d"))
      .groupBy(col("id"), col("cid"))
      .agg(sum((col("qv") - col("cq")) * (col("qv") - col("cq"))).as("d2"))
      .groupBy(col("id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("id"), col("m.cid").as("cid"), col("m.d2").as("d2"))
  }

  /** One Lloyd update: truncating integer mean per (cid, d) over the
    * assigned corpus, empty clusters keep their previous centroid. Bounded
    * collect: ≤ k·dim rows (the model), never the corpus. */
  def update(qdf: DataFrame, assignment: DataFrame,
             prev: Array[Array[Long]]): Array[Array[Long]] = {
    // `div` (not `/`): long division stays integral; Spark div and DuckDB
    // // both truncate toward zero, so the mean replays sign-exactly
    val exact = assignment.select("id", "cid").join(qdf, Seq("id"))
      .groupBy(col("cid"), col("d"))
      .agg(expr("sum(qv) div count(1)").as("cq"))
    val next = prev.map(_.clone())
    exact.collect().foreach { r =>
      next(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getLong(2)
    }
    next
  }

  /** STATELESS per-row argmin under a driver-side model: the deployment
    * form of [[assign]] (no join, no aggregation — an array of (d2, cid)
    * structs folded by array_min, ties → lowest cid exactly like the
    * grouped kernel). This is what a stream or a model-serving projection
    * uses: the k×dim model rides the plan as literals. */
  def assignExpr(vecCol: org.apache.spark.sql.Column,
                 cents: Array[Array[Long]]): org.apache.spark.sql.Column = {
    val dim = cents.head.length
    val qcol = transform(vecCol, x => floor(x.cast("double") * Scale).cast("long"))
    val dists = cents.zipWithIndex.toSeq.map { case (cv, cid) =>
      struct(
        aggregate(zip_with(qcol, lit(cv), (x, c) => (x - c) * (x - c)),
          lit(0L), (a, v) => a + v).as("d2"),
        lit(cid.toLong).as("cid")) }
    // dimension guard (round-10 advice): zip_with null-pads a short/long
    // vector, which would fold a NULL d2 into the argmin and assign a
    // SILENT wrong cluster — while the batch path's equi-join on d computes
    // a partial distance. Fail loudly instead: serving ≡ batch only holds
    // for exactly model-dim inputs, so anything else is corrupt input.
    // coalesce + null-safe message: a NULL vector must raise the same
    // crafted diagnostic, not raise_error(NULL) (size(NULL) is NULL, and
    // concat over it would null the whole message).
    when(coalesce(size(vecCol) === dim, lit(false)),
        array_min(array(dists: _*)).getField("cid"))
      .otherwise(raise_error(concat(
        lit(s"assignExpr: vector dim "),
        coalesce(size(vecCol).cast("string"), lit("NULL")),
        lit(s" != model dim $dim"))))
  }

  /** Full run: init → `updates` Lloyd rounds → final assignment under the
    * final model. Returns (assignment(id, cid, d2), final centroids). */
  def kmeans(corpus: DataFrame, idCol: String, vecCol: String,
             k: Int, updates: Int): (DataFrame, Array[Array[Long]]) = {
    val qdf = quantized(corpus, idCol, vecCol)
    var cents = initCentroids(corpus, idCol, vecCol, k)
    for (_ <- 1 to updates)
      cents = update(qdf, assign(qdf, cents), cents)
    (assign(qdf, cents), cents)
  }
}
