package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{toColumn, toExpr, PqAdcExpr, PqCodec, PqEncodeExpr}

/** Product-quantization ANN — the memory/IO scale path for embedding search.
  * A 100 TB embedding corpus is mostly vector payload; PQ replaces each
  * D-float vector (4·D bytes) with M small codebook indices (M ints, 4-bit
  * codes in a production layout), so the scan/shuffle side of a top-k drops
  * by ~D/M× while distances are still computable per pair via asymmetric
  * distance computation (ADC) against the full-precision query.
  *
  * Everything is deterministic: the codebook is the [[Ann.sampleCentroids]]
  * draw (smallest xxhash64(id) rows) subdivided into M subspaces, encode is
  * a strict-argmin, ADC is fixed-order double arithmetic — so results are
  * reproducible across runs and layouts, and the approximation quality is a
  * MEASURED quantity (q80) like IVF's (q47), not a tolerance.
  */
object Pq {

  /** Deterministic codebook: the k corpus vectors with the smallest
    * xxhash64(id), split into m sub-vectors each. Collected to the driver —
    * k·D floats, a bounded model artifact (the same deployment shape as
    * q69's Bloom bitset), broadcast to executors inside the expressions. */
  def codebook(corpus: DataFrame, idCol: String, vecCol: String,
               m: Int, k: Int): PqCodec.Codebook = {
    val rows = corpus
      .select(col(vecCol).as("v"), xxhash64(col(idCol)).as("_h"), col(idCol).as("_i"))
      .orderBy("_h", "_i").limit(k)
      .select("v").collect()
      .map(_.getSeq[Float](0).toArray)
    require(rows.length == k, s"corpus smaller than codebook size $k")
    val d = rows.head.length
    require(d % m == 0, s"dim $d not divisible by $m subspaces")
    val sub = d / m
    Array.tabulate(m)(mi => rows.map(_.slice(mi * sub, (mi + 1) * sub)))
  }

  def encode(vec: Column, cb: PqCodec.Codebook): Column =
    toColumn(PqEncodeExpr(toExpr(vec), cb))

  /** PORTABLE codebook: the k corpus vectors with the smallest Mix64
    * sample coordinate (the replayable sample family — same as
    * [[Ann.sampleCentroids]]), split into m subspaces and quantized to
    * integers. The twin of [[codebook]] whose every downstream code is
    * DuckDB-replayable. */
  def codebookPortable(corpus: DataFrame, idCol: String, vecCol: String,
                       m: Int, k: Int): PqCodec.QCodebook = {
    val rows = corpus
      .select(col(vecCol).as("v"),
        graft.functions.Mix64.sampleCoord(col(idCol).cast("long")).as("_h"),
        col(idCol).as("_i"))
      .orderBy("_h", "_i").limit(k)
      .select("v").collect()
      .map(_.getSeq[Float](0).toArray)
    require(rows.length == k, s"corpus smaller than codebook size $k")
    val d = rows.head.length
    require(d % m == 0, s"dim $d not divisible by $m subspaces")
    val sub = d / m
    PqCodec.quantize(
      Array.tabulate(m)(mi => rows.map(_.slice(mi * sub, (mi + 1) * sub))))
  }

  def encodePortable(vec: Column, qcb: PqCodec.QCodebook): Column =
    toColumn(graft.functions.PqEncodePortableExpr(toExpr(vec), qcb))

  /** Bounded deterministic training sample: the `n` corpus rows with the
    * smallest Mix64 sample coordinate (tie-broken by id) — a uniform draw
    * without replacement that is a pure function of the ids, the same
    * coordinate family as [[graft.ops.Sampling]]. Plans as TakeOrdered
    * (per-partition top-n heaps, one merge): no shuffle of the corpus, so
    * at 100 TB each Lloyd iteration touches n rows, not the corpus. */
  private def trainingSample(corpus: DataFrame, idCol: String, vecCol: String,
                             n: Int): DataFrame =
    corpus.select(col(idCol), col(vecCol))
      .orderBy(graft.functions.Mix64.sampleCoord(col(idCol).cast("long")), col(idCol))
      .limit(n)

  /** Lloyd-refined codebook: start from the deterministic sample, then
    * `iters` k-means steps per subspace — assign every sub-vector to its
    * nearest codeword (the encode expression), recompute codewords as cell
    * means, keep the old codeword for empty cells. The means are computed
    * over components QUANTIZED to integers (floor(x·2^20), the q64 trick):
    * integer sums are order-free, so the trained codebook is bit-identical
    * whatever the partitioning — a float mean would drift with Spark's
    * partial-aggregation order.
    *
    * Training runs on a BOUNDED deterministic sample of the corpus
    * (standard PQ practice): `trainSampleSize` rows via [[trainingSample]],
    * cached across the iterations. At test scale the sample usually covers
    * the whole corpus (default 65536 ≥ sf0.1's embeddings table); at 100 TB
    * it is what makes `iters` refinement passes affordable — the full
    * corpus is only ever touched by the one encode pass the caller runs
    * AFTER training. Pass trainSampleSize <= 0 to force full-corpus
    * training (spec/diagnostic use only). */
  def trainCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                    m: Int, k: Int, iters: Int,
                    trainSampleSize: Int = 65536): PqCodec.Codebook = {
    require(trainSampleSize <= 0 || trainSampleSize >= k,
      s"trainSampleSize $trainSampleSize smaller than codebook size $k")
    val train =
      if (trainSampleSize > 0)
        trainingSample(corpus, idCol, vecCol, trainSampleSize).cache()
      else corpus
    var cb = codebook(train, idCol, vecCol, m, k)
    val sub = PqCodec.subDim(cb)
    val Q = 1048576L // 2^20
    for (_ <- 1 to iters) {
      val means = train
        .select(col(vecCol).as("v"), encode(col(vecCol), cb).as("cs"))
        .select(posexplode(col("cs")).as(Seq("mi", "code")), col("v"))
        .select(col("mi"), col("code"),
          posexplode(slice(col("v"), col("mi") * sub + 1, lit(sub)))
            .as(Seq("di", "x")))
        .groupBy("mi", "code", "di")
        .agg(sum(floor(col("x").cast("double") * Q).cast("long")).as("qsum"),
          count(lit(1)).as("n"))
        .collect()
      val next = cb.map(_.map(_.clone()))
      means.foreach { r =>
        val (mi, code, di) = (r.getInt(0), r.getInt(1), r.getInt(2))
        next(mi)(code)(di) =
          (r.getLong(3).toDouble / r.getLong(4).toDouble / Q).toFloat
      }
      cb = next
    }
    if (trainSampleSize > 0) train.unpersist()
    cb
  }

  def adcCosine(query: Column, codes: Column, cb: PqCodec.Codebook): Column =
    toColumn(PqAdcExpr(toExpr(query), toExpr(codes), cb))

  def adcPortableD2(query: Column, codes: Column,
                    qcb: PqCodec.QCodebook): Column =
    toColumn(graft.functions.PqAdcPortableExpr(toExpr(query), toExpr(codes), qcb))

  /** Candidate-generation + exact RE-RANK: the production retrieval shape.
    * Stage 1 scans the coded corpus with the PORTABLE integer ADC distance
    * (codes from [[codebookPortable]], so the whole candidate set is a
    * DuckDB-replayable total order) and keeps `nCand` candidates per
    * query; stage 2 re-scores ONLY those candidates with the exact float
    * cosine against the raw vectors and keeps the top k. At 100 TB the
    * exact arithmetic touches |Q|·nCand vectors instead of |Q|·|C| — the
    * candidate stage moves M ints per row, and the re-rank join is a hash
    * join on neighbor_id that retrieves just the shortlisted raw vectors.
    * Recall ≈ exact whenever the true top-k survives the candidate cut —
    * measured in q113 (0.845 @ sf0.1 with the q112 configuration, the
    * best approximate tier: IVF 0.405, float-ADC PQ 0.625, IVF-PQ
    * 0.350). */
  def rerankTopK(queries: DataFrame, corpus: DataFrame,
                 idCol: String, vecCol: String, k: Int, nCand: Int,
                 m: Int, kCent: Int): DataFrame = {
    require(nCand >= k, s"nCand $nCand < k $k")
    val qcb = codebookPortable(corpus, idCol, vecCol, m, kCent)
    val coded = corpus.select(col(idCol).as("neighbor_id"),
      encodePortable(col(vecCol), qcb).as("codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wc = Window.partitionBy("query_id")
      .orderBy(col("add2"), col("neighbor_id"))
    val cand = q.crossJoin(coded)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("add2", adcPortableD2(col("qv"), col("codes"), qcb))
      .withColumn("crank", row_number().over(wc))
      .where(col("crank") <= nCand)
      .select("query_id", "qv", "neighbor_id")
    val raw = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val wr = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand.join(raw, "neighbor_id")
      .withColumn("sim",
        graft.functions.CosineSim.cosineSim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** The re-rank tier's recall/cost tradeoff as DATA (the q140 pattern
    * applied to the production retrieval shape): one row per shortlist
    * size with total recall@k against exact brute force. One portable ADC
    * scan ranks the corpus per query (8 ints per row — the scan cost is
    * LEVEL-INDEPENDENT); each candidate joins every level ≥ its rank, the
    * raw vectors are fetched once for the ≤ max(levels) shortlist (hash
    * join on neighbor_id, exactly [[rerankTopK]]'s shape), and the exact
    * cosine re-ranks inside each level. So the curve answers the real
    * sizing question — how big a shortlist buys how much recall — with
    * the re-rank join cost growing only in max(levels). */
  def rerankRecallCurve(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String, k: Int,
                        levels: Seq[Int], m: Int, kCent: Int): DataFrame = {
    require(levels.nonEmpty && levels.min >= k, s"levels must be ≥ k=$k")
    val maxLevel = levels.max
    val qcb = codebookPortable(corpus, idCol, vecCol, m, kCent)
    val coded = corpus.select(col(idCol).as("neighbor_id"),
      encodePortable(col(vecCol), qcb).as("codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wc = Window.partitionBy("query_id")
      .orderBy(col("add2"), col("neighbor_id"))
    val lv = array(levels.map(lit): _*)
    val cand = q.crossJoin(coded)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("add2", adcPortableD2(col("qv"), col("codes"), qcb))
      .withColumn("crank", row_number().over(wc))
      .where(col("crank") <= maxLevel)
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("crank"))
    val raw = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = cand.join(raw, "neighbor_id")
      .withColumn("sim",
        graft.functions.CosineSim.cosineSim(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        explode(filter(lv, l => l >= col("crank"))).as("n_cand"))
    val bf = Ann.bruteForceTopK(queries, corpus, idCol, vecCol, k)
      .select("query_id", "neighbor_id")
    val wr = Window.partitionBy("n_cand", "query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    val hits = scored.withColumn("rank", row_number().over(wr))
      .where(col("rank") <= k)
      .join(bf, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("n_cand").agg(count(lit(1)).as("n_hit"))
    scored.groupBy("n_cand")
      .agg((countDistinct(col("query_id")) * k).as("n_true"))
      .join(hits, Seq("n_cand"), "left")
      .select(col("n_cand"), col("n_true"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_true"))
          .as("recall"))
      .orderBy("n_cand")
  }

  /** ADC top-k: full-precision queries against the CODED corpus — the
    * compressed-domain linear scan. Same output shape and tie-break as
    * [[Ann.bruteForceTopK]]; the join moves M ints per corpus row instead
    * of D floats. (Compose with IVF cells to also prune the scan — here the
    * scan itself is the operator under test.)
    *
    * Capacity rule, measured at a 10× corpus (BASELINE.md round-11 sf1
    * spot-check): PQ recall is governed by codebook CAPACITY (m·kCent)
    * relative to corpus diversity — m=16,kCent=64 held 0.565 recall@10 on
    * the driver distribution but fell to 0.385 on a 10× decorrelated mix;
    * kCent=256 or m=32 restored 0.58/0.755. Growing the corpus without
    * growing (or retraining) the codebook silently degrades recall —
    * unlike IVF, whose recall tracks the probe FRACTION independent of N. */
  def adcTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              m: Int, kCent: Int, trainIters: Int = 3,
              trainSampleSize: Int = 65536,
              codebookOpt: Option[PqCodec.Codebook] = None): DataFrame = {
    // codebookOpt (optimization r17): a caller serving several tiers from
    // ONE deterministic codebook (q182 trains identical books for its PQ
    // and IVF-PQ tiers — same corpus, m, kCent, iters) passes it in and
    // pays the Lloyd passes once; None keeps the train-here behavior.
    val cb = codebookOpt.getOrElse(trainCodebook(corpus, idCol, vecCol, m,
      kCent, trainIters, trainSampleSize))
    val coded = corpus.select(col(idCol).as("neighbor_id"),
      encode(col(vecCol), cb).as("codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("asim").desc, col("neighbor_id"))
    q.crossJoin(coded)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("asim", adcCosine(col("qv"), col("codes"), cb))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** IVF-PQ: the production ANN configuration — IVF cells prune WHICH rows
    * are scanned (queries probe their nProbe nearest cells only), PQ codes
    * shrink WHAT each scanned row carries. The probe join keys on
    * centroid_id (a hash join — no cross join at all), and its corpus side
    * is (cell, id, codes): at 100 TB that is nProbe/nCells of the corpus
    * at D/M of the bytes. Same deterministic parts as q41 and q79;
    * recall compounds both approximations and is measured, not assumed. */
  /** PORTABLE IVF-PQ: [[ivfAdcTopK]]'s composition — cells prune WHICH
    * rows, codes shrink WHAT they carry — built entirely from the
    * replayable parts: Mix64-sampled cells (q41's chain), the integer
    * quantizer codebook (q93's chain) and the exact integer ADC distance
    * (ties → id, a bit-portable total order). The production float tier
    * keeps [[ivfAdcTopK]]; this twin gives the COMPOSED architecture a
    * full DuckDB oracle — scan shape is identical (hash join on
    * centroid_id, M ints per scanned row). */
  def ivfAdcPortableTopK(queries: DataFrame, corpus: DataFrame,
                         idCol: String, vecCol: String, k: Int,
                         nCentroids: Int, nProbe: Int,
                         m: Int, kCent: Int): DataFrame = {
    val qcb = codebookPortable(corpus, idCol, vecCol, m, kCent)
    val cells = Ann.sampleCentroids(corpus, idCol, vecCol, nCentroids)
    val corpusCells = Ann.assignCells(corpus, idCol, vecCol, cells)
      .select(col(idCol).as("neighbor_id"), col("centroid_id"),
        encodePortable(col(vecCol), qcb).as("codes"))
    val queryCells = Ann.assignCells(queries, idCol, vecCol, cells, n = nProbe)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("centroid_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("add2"), col("neighbor_id"))
    queryCells.join(corpusCells, Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("add2", adcPortableD2(col("qv"), col("codes"), qcb))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  def ivfAdcTopK(queries: DataFrame, corpus: DataFrame,
                 idCol: String, vecCol: String, k: Int,
                 nCentroids: Int, nProbe: Int,
                 m: Int, kCent: Int, trainIters: Int = 3,
                 trainSampleSize: Int = 65536,
                 codebookOpt: Option[PqCodec.Codebook] = None): DataFrame = {
    // see adcTopK.codebookOpt — one shared deterministic codebook across
    // tiers; None keeps the train-here behavior
    val cb = codebookOpt.getOrElse(trainCodebook(corpus, idCol, vecCol, m,
      kCent, trainIters, trainSampleSize))
    val cells = Ann.sampleCentroids(corpus, idCol, vecCol, nCentroids)
    val corpusCells = Ann.assignCells(corpus, idCol, vecCol, cells)
      .select(col(idCol).as("neighbor_id"), col("centroid_id"),
        encode(col(vecCol), cb).as("codes"))
    val queryCells = Ann.assignCells(queries, idCol, vecCol, cells, n = nProbe)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("centroid_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("asim").desc, col("neighbor_id"))
    queryCells.join(corpusCells, Seq("centroid_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("asim", adcCosine(col("qv"), col("codes"), cb))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }
}
