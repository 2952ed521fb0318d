package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("error paths: wrong dims throw with the operator's name, bad params rejected") {
    val cb = Pq.codebook(emb, "vec_id", "embedding", 8, 16)
    val bad = spark.range(1).selectExpr("cast(array(1.0, 2.0) as array<float>) as v")
    val e = intercept[Exception] {
      bad.select(Pq.encode(org.apache.spark.sql.functions.col("v"), cb)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("pq_encode"),
      s"dim-mismatch error should name pq_encode: ${e.getMessage}")
    intercept[IllegalArgumentException] {
      Pq.codebook(emb, "vec_id", "embedding", m = 7, k = 16) // 64 % 7 != 0
    }
    intercept[IllegalArgumentException] {
      Pq.codebook(emb.limit(3), "vec_id", "embedding", m = 8, k = 16) // corpus < k
    }
  }

  test("codebook is the deterministic sample, m x k x subdim") {
    val cb = Pq.codebook(emb, "vec_id", "embedding", m = 8, k = 16)
    assert(cb.length === 8)
    assert(cb.forall(_.length === 16))
    assert(cb.forall(_.forall(_.length === 8)))
    val cb2 = Pq.codebook(emb.repartition(13), "vec_id", "embedding", 8, 16)
    assert(cb.flatten.flatten.toSeq === cb2.flatten.flatten.toSeq,
      "codebook depends on partition layout")
  }

  test("encode: codes in range, deterministic, nearest-centroid by construction") {
    val cb = Pq.codebook(emb, "vec_id", "embedding", 8, 16)
    val codes = emb.select(col("vec_id"),
        Pq.encode(col("embedding"), cb).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 16)))
    // a vector that IS a codeword encodes to itself in every subspace
    val sampleIds = emb.select(col("vec_id"), xxhash64(col("vec_id")).as("h"))
      .orderBy("h", "vec_id").limit(16).select("vec_id")
      .collect().map(_.getLong(0))
    val vecOf = emb.where(col("vec_id").isin(sampleIds: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    sampleIds.foreach { id =>
      val cs = codes(id)
      cs.zipWithIndex.foreach { case (c, mi) =>
        assert(cb(mi)(c).toSeq === vecOf(id).slice(mi * 8, mi * 8 + 8).toSeq,
          s"codeword vector $id did not encode to itself in subspace $mi")
      }
    }
  }

  test("ADC self-similarity of a codeword vector is ~1") {
    val cb = Pq.codebook(emb, "vec_id", "embedding", 8, 16)
    val coded = emb.select(col("vec_id"), col("embedding"),
      Pq.encode(col("embedding"), cb).as("codes"))
    val sims = coded
      .withColumn("self", Pq.adcCosine(col("embedding"), col("codes"), cb))
      .select("self").collect().map(_.getDouble(0))
    // reconstruction is lossy for non-codewords but must stay a cosine
    assert(sims.forall(s => s >= -1.0000001 && s <= 1.0000001))
    assert(sims.max > 0.9999, "no codeword reconstructed to itself")
  }

  test("IVF-PQ composes: hash join on cells, compounded recall clears its floor") {
    val q = emb.where(col("vec_id") < 20)
    val df = Pq.ivfAdcTopK(q, emb, "vec_id", "embedding", 10,
      nCentroids = 16, nProbe = 4, m = 16, kCent = 64)
    val p = df.queryExecution.executedPlan.toString
    // the corpus-scan join keys on centroid_id (only the bounded 16-row
    // centroid-assignment joins are nested loops)
    assert(p.contains("centroid_id"), p.take(400))
    val bf = Ann.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & got).size.toDouble / bf.size
    assert(recall >= 0.3, f"IVF-PQ recall@10 $recall%.2f below floor")
    val got2 = Pq.ivfAdcTopK(q.repartition(3), emb.repartition(9),
        "vec_id", "embedding", 10, nCentroids = 16, nProbe = 4, m = 16, kCent = 64)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 === got, "IVF-PQ result depends on partition layout")
  }

  test("training runs on the bounded deterministic sample") {
    // the default sample covers this corpus entirely → ≡ full-corpus training
    val full = Pq.trainCodebook(emb, "vec_id", "embedding", 8, 16, iters = 2,
      trainSampleSize = -1)
    val dflt = Pq.trainCodebook(emb, "vec_id", "embedding", 8, 16, iters = 2)
    assert(full.flatten.flatten.toSeq === dflt.flatten.flatten.toSeq)
    // a bounded sample trains exactly as full training over that explicit
    // subset (same Mix64 coordinate order Sampling uses)
    val n = 64
    val subset = emb.select(col("vec_id"), col("embedding"))
      .orderBy(graft.functions.Mix64.sampleCoord(col("vec_id").cast("long")),
        col("vec_id"))
      .limit(n)
    val sampled = Pq.trainCodebook(emb, "vec_id", "embedding", 8, 16, iters = 2,
      trainSampleSize = n)
    val manual = Pq.trainCodebook(subset, "vec_id", "embedding", 8, 16, iters = 2,
      trainSampleSize = -1)
    assert(sampled.flatten.flatten.toSeq === manual.flatten.flatten.toSeq)
    intercept[IllegalArgumentException] { // sample must cover the codebook
      Pq.trainCodebook(emb, "vec_id", "embedding", 8, 16, 1, trainSampleSize = 8)
    }
  }

  test("portable encode: integer argmin, layout-invariant, codewords self-encode") {
    val qcb = Pq.codebookPortable(emb, "vec_id", "embedding", m = 8, k = 16)
    val codes = emb.select(col("vec_id"),
        Pq.encodePortable(col("embedding"), qcb).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(cs => cs.length == 8 && cs.forall(c => c >= 0 && c < 16)))
    val codes2 = emb.repartition(11)
      .select(col("vec_id"), Pq.encodePortable(col("embedding"), qcb).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes === codes2, "portable codes depend on partition layout")
    // a sampled codeword vector quantizes to itself → distance 0 in every
    // subspace → encodes to its own index (ties broken to a lower index
    // only by an exact integer duplicate, which this corpus has none of)
    val sampleIds = emb
      .select(col("vec_id"),
        graft.functions.Mix64.sampleCoord(col("vec_id").cast("long")).as("h"))
      .orderBy("h", "vec_id").limit(16).select("vec_id")
      .collect().map(_.getLong(0))
    sampleIds.zipWithIndex.foreach { case (id, j) =>
      assert(codes(id).forall(_ == j),
        s"codeword vector $id (index $j) did not self-encode: ${codes(id)}")
    }
  }

  test("ADC rejects codes trained under a different codebook with a named error") {
    val cb16 = Pq.codebook(emb, "vec_id", "embedding", 8, 16)
    val cb32 = Pq.codebook(emb, "vec_id", "embedding", 8, 32)
    val e = intercept[Exception] {
      emb.select(Pq.adcCosine(col("embedding"),
        Pq.encode(col("embedding"), cb32), cb16)).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("pq_adc_cosine"),
      s"out-of-range code error should name pq_adc_cosine: ${e.getMessage}")
  }

  test("recall@10 vs exact brute force clears the floor; layout-invariant") {
    val q = emb.where(col("vec_id") < 20)
    val bf = Ann.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Pq.adcTopK(q, emb, "vec_id", "embedding", 10, m = 16, kCent = 64)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & pq).size.toDouble / bf.size
    assert(recall >= 0.5, f"PQ recall@10 $recall%.2f below floor")
    val pq2 = Pq.adcTopK(q.repartition(7), emb.repartition(5),
        "vec_id", "embedding", 10, m = 16, kCent = 64)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq2 === pq, "PQ result depends on partition layout")
  }

  test("candidate+re-rank beats the raw ADC ranking and is layout-invariant") {
    val q = emb.where(col("vec_id") < 20)
    val bf = Ann.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def run(qs: org.apache.spark.sql.DataFrame,
            cs: org.apache.spark.sql.DataFrame) =
      Pq.rerankTopK(qs, cs, "vec_id", "embedding",
          k = 10, nCand = 200, m = 8, kCent = 128)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rr = run(q, emb)
    val recall = (bf & rr).size.toDouble / bf.size
    // q113's measured value at this SF is 0.99; the floor leaves margin
    assert(recall >= 0.8, f"re-rank recall@10 $recall%.2f below floor")
    assert(run(q.repartition(7), emb.repartition(5)) === rr,
      "re-rank result depends on partition layout")
  }

  test("portable IVF-PQ (q141): full shape, layout-invariant, recall floor") {
    val q = emb.where(col("vec_id") < 20)
    def run(qs: org.apache.spark.sql.DataFrame,
            cs: org.apache.spark.sql.DataFrame) =
      Pq.ivfAdcPortableTopK(qs, cs, "vec_id", "embedding",
          k = 10, nCentroids = 16, nProbe = 4, m = 8, kCent = 16)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val got = run(q, emb)
    assert(got.length == 20 * 10)
    assert(got.map(_._1).distinct.length == 20)
    // exact-integer distances + id tie-break: a bit-portable total order,
    // so the ranking cannot depend on the physical layout
    assert(run(q.repartition(7), emb.repartition(5)).toSeq == got.toSeq,
      "portable IVF-PQ ranking depends on partition layout")
    val bf = Ann.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ours = got.map(t => (t._1, t._3)).toSet
    val recall = (bf & ours).size.toDouble / bf.size
    // compounds both approximations at the SMALL q93 codebook — the
    // number is tracked, the spec only pins a sanity floor above chance
    assert(recall >= 0.1, f"portable IVF-PQ recall $recall%.2f below floor")
  }

  test("q142 re-rank curve: monotone in shortlist size, q113 point on it") {
    val rows = graft.SparkEntry.queries("q142_rerank_curve")(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Int]("n_cand")).toSeq == Seq(25, 50, 100, 200, 400))
    val recalls = rows.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone: ${recalls.toSeq}")
    // the q112/q113 production point (nCand = 200) must sit on the curve
    val q113 = graft.SparkEntry.queries("q113_rerank_recall")(spark, sfDir)
      .collect()
    val q113overall = q113.map(_.getAs[Long]("n_hit")).sum.toDouble /
      q113.map(_.getAs[Long]("n_true")).sum
    val curve200 = rows.find(_.getAs[Int]("n_cand") == 200).get
      .getAs[Double]("recall")
    assert(curve200 == q113overall, s"curve@200 $curve200 != q113 $q113overall")
  }
}
