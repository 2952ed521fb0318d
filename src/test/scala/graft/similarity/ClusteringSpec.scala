package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("k-means separates two obvious clusters") {
    // two tight blobs on orthogonal axes. Membership is derived from the
    // Mix64 init ORDER (ranks alternate blobs) so the two seed centroids
    // provably straddle the blobs — with a sane init, Lloyd must separate
    // them perfectly (with both seeds in one blob it may not: local optima
    // are k-means semantics, not a defect)
    val order = (0L until 20L).sortBy(i => (graft.functions.Mix64.hash(i), i))
    val blobA = order.zipWithIndex.collect { case (id, r) if r % 2 == 0 => id }.toSet
    val vecs = (0L until 20L).map { i =>
      val base = if (blobA(i)) Array(1.0f, 0.0f) else Array(0.0f, 1.0f)
      (i, base.map(_ + (i % 5).toFloat * 0.01f))
    }.toDF("vec_id", "embedding")
    val (asg, cents) = Clustering.kmeans(vecs, "vec_id", "embedding", k = 2, updates = 3)
    val byCluster = asg.collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._2)
      .map { case (cid, rows) => cid -> rows.map(r => blobA(r._1)).toSet }
    // every cluster is pure: one blob each
    assert(byCluster.values.forall(_.size == 1))
    assert(byCluster.size == 2)
    assert(cents.length == 2 && cents.forall(_.length == 2))
  }

  test("final assignment is the exact integer argmin under the final model") {
    val emb = spark.read.parquet(sf("embeddings"))
    val (asg, cents) = Clustering.kmeans(emb, "vec_id", "embedding", 4, 2)
    val qv = emb.select($"vec_id",
        transform($"embedding", x => floor(x.cast("double") * Clustering.Scale)
          .cast("long")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    asg.collect().foreach { r =>
      val (id, cid, d2) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val dists = cents.map(c => c.zip(qv(id)).map { case (cq, x) =>
        (x - cq) * (x - cq) }.sum)
      val best = dists.zipWithIndex.minBy { case (d, i) => (d, i) }
      assert(cid == best._2 && d2 == best._1, s"vec $id")
    }
  }

  test("integer mean truncates toward zero on negative sums (div ≡ //)") {
    // one cluster, all points negative: the update mean must be the
    // TRUNCATING quotient — the semantics Spark div and DuckDB // share
    // on every sign (no shift needed, no n·2^31 overflow at any scale)
    val vecs = Seq(
      (0L, Array(-0.31f, -0.77f)),
      (1L, Array(-0.52f, -0.13f)),
      (2L, Array(-0.11f, -0.99f))).toDF("vec_id", "embedding")
    val qdf = Clustering.quantized(vecs, "vec_id", "embedding")
    val init = Clustering.initCentroids(vecs, "vec_id", "embedding", 1)
    val asg = Clustering.assign(qdf, init)
    val next = Clustering.update(qdf, asg, init)
    val q = qdf.collect().map(r => (r.getLong(1), r.getLong(2)))
    for (d <- 0 until 2) {
      val vals = q.filter(_._1 == d).map(_._2)
      assert(vals.sum < 0, s"dim $d must exercise the negative-sum path")
      assert(next(0)(d) == vals.sum / vals.length, // JVM / truncates
        s"dim $d: got ${next(0)(d)}")
    }
  }

  test("empty clusters keep their previous centroid") {
    // 4 identical points: after one update every point lands in one cell,
    // the other centroid must survive verbatim from its init value
    val vecs = (0L until 4L).map(i => (i, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val init = Clustering.initCentroids(vecs, "vec_id", "embedding", 2)
    val qdf = Clustering.quantized(vecs, "vec_id", "embedding")
    val next = Clustering.update(qdf, Clustering.assign(qdf, init), init)
    // identical vectors → assignment all to cid 0 (ties → lowest cid);
    // cid 1 keeps init
    assert(next(1).toSeq == init(1).toSeq)
    val expected = Math.floor(0.5 * Clustering.Scale).toLong // mean of equals
    assert(next(0).toSeq == Seq(expected, expected))
  }

  test("assignExpr (stateless serving form) ≡ assign (grouped kernel)") {
    val emb = spark.read.parquet(sf("embeddings"))
    val (_, cents) = Clustering.kmeans(emb, "vec_id", "embedding", 4, 2)
    val grouped = Clustering
      .assign(Clustering.quantized(emb, "vec_id", "embedding"), cents)
      .select(col("id"), col("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val served = emb.select(col("vec_id"),
        Clustering.assignExpr(col("embedding"), cents).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served == grouped)
  }

  test("assignExpr rejects dimension-mismatched vectors loudly") {
    import spark.implicits._
    val cents = Array(Array(0L, 0L), Array(Clustering.Scale, Clustering.Scale))
    // model dim 2 vs a 3-dim and a 1-dim vector: zip_with would null-pad
    // and silently misassign — the guard must raise instead
    for (bad <- Seq(Seq(0.1f, 0.2f, 0.3f), Seq(0.1f))) {
      val ex = intercept[Exception] {
        Seq(bad).toDF("embedding")
          .select(Clustering.assignExpr(col("embedding"), cents).as("cid"))
          .collect()
      }
      assert(ex.getMessage.contains("model dim 2"), ex.getMessage)
    }
    // a NULL vector raises the crafted message too, not raise_error(NULL)
    val exNull = intercept[Exception] {
      Seq(Option.empty[Seq[Float]]).toDF("embedding")
        .select(Clustering.assignExpr(col("embedding"), cents).as("cid"))
        .collect()
    }
    assert(exNull.getMessage.contains("vector dim NULL"), exNull.getMessage)
    // exact-dim vectors still serve
    val ok = Seq(Seq(0.9f, 0.9f)).toDF("embedding")
      .select(Clustering.assignExpr(col("embedding"), cents).as("cid"))
      .collect().map(_.getLong(0)).toSeq
    assert(ok == Seq(1L))
  }

  test("kmeans is deterministic across runs") {
    val emb = spark.read.parquet(sf("embeddings"))
    val (a1, c1) = Clustering.kmeans(emb, "vec_id", "embedding", 4, 2)
    val (a2, c2) = Clustering.kmeans(emb, "vec_id", "embedding", 4, 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(a1.collect().map(_.toSeq).toSet == a2.collect().map(_.toSeq).toSet)
  }
}
