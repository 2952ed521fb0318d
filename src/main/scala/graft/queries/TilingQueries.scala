package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tiling.{PairRow, TileJobs}

/** Tiling-operator queries. The E3 kernels are not SQL-expressible (driver
  * records rows-only); inputs are generated deterministically in-query
  * (hash-derived pixels — no files needed), sized against the same
  * geometry as the golden fixtures. Full reference parity is pinned by
  * TilingSpec against the numpy oracle; this entry keeps a live tiling
  * artifact in every verify round.
  */
object TilingQueries {

  /** Deterministic synthetic pair set: `nPairs` HR 30×30 / LR 10×10 4-band
    * images with a dense centerline band, pixels from xxhash64 — pure
    * column expressions until the tiling flatMap. */
  private def syntheticPairs(s: SparkSession, nPairs: Int) = {
    import s.implicits._
    val nb = 4; val hrH = 30; val hrW = 30; val lrH = 10; val lrW = 10
    def pix(seed: Column, n: Int, tag: String): Column =
      transform(sequence(lit(0), lit(n - 1)),
        i => ((pmod(xxhash64(seed, i, lit(tag)), lit(1000)) + 1).cast("double") / 1000.0).cast("float"))
    // centerline: rows 14–16 of the 30×30 grid hit where hash parity says so
    def mask(seed: Column): Column =
      transform(sequence(lit(0), lit(hrH * hrW - 1)), i => {
        val r = (i / hrW).cast("int"); val c = pmod(i, lit(hrW)).cast("int")
        when(r.between(14, 16) && c.between(4, 25) &&
          pmod(xxhash64(seed, i), lit(2)) === 0, 1.0f).otherwise(0.0f)
      })
    s.range(nPairs.toLong).select(
      concat(lit("pair_"), col("id")).as("pair_id"),
      lit(nb).as("n_bands"),
      lit(hrH).as("hr_h"), lit(hrW).as("hr_w"), pix(col("id"), nb * hrH * hrW, "hr").as("hr_pixels"),
      lit(lrH).as("lr_h"), lit(lrW).as("lr_w"), pix(col("id"), nb * lrH * lrW, "lr").as("lr_pixels"),
      lit(hrH).as("mask_h"), lit(hrW).as("mask_w"), mask(col("id")).as("mask_pixels"))
      .as[PairRow]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O24/O12/O25/O13/O26 — faithful greedy tiling over synthetic pairs
    "q60_tiling_greedy" -> ((s, _) =>
      TileJobs.tilePairs(syntheticPairs(s, 64),
          TileJobs.Config(batch = 6, scale = 3))
        .select(col("pair_id"), col("tile_id"), col("r"), col("c"),
          crc32(to_json(struct(col("hr")))).as("hr_crc"),
          crc32(to_json(struct(col("lr")))).as("lr_crc"))
        .orderBy("pair_id", "tile_id")),

    // O28 — the v1 column walk on the same synthetic set (scalable form)
    "q61_tiling_grid" -> ((s, _) =>
      TileJobs.tilePairs(syntheticPairs(s, 64),
          TileJobs.Config(batch = 6, scale = 3, mode = TileJobs.GridSnap))
        .groupBy("pair_id").agg(count(lit(1)).as("n_tiles"))
        .orderBy("pair_id")))

  val oracle: Map[String, String] = Map.empty
}
