package graft.raster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D3/D4/D5 row models (SURVEY.md §1): multi-band image tensors and
  * centerline masks as flattened float arrays. Spark has no tensor type, so
  * shape travels as columns and `pixels` is band-major row-major (NCHW):
  * index = band*h*w + r*w + c.
  */
case class ImageTensor(
    image_id: String,
    sensor: String,
    bands: Seq[String],
    c: Int, h: Int, w: Int,
    pixels: Array[Float])

case class CenterlineMask(mask_id: String, h: Int, w: Int, pixels: Array[Float])

/** Band-file predicates and deterministic band stacking (O11, beta
  * semantics — reference main_function_beta.py:136–156 iterates the band
  * list so stacking order is fixed; the original's os.listdir order was
  * nondeterministic, quirk Q4). Substring matching in the reference
  * (`"B2" in name`) also matches B20 etc. (quirk Q7) — here the band id is
  * matched as a whole `_`/`.`-delimited token.
  */
object Bands {
  /** Landsat/HLS band set, stack order. */
  val LandsatBands: Seq[String] = Seq("B02", "B03", "B04", "B05")
  /** Sentinel-2 band set, stack order. */
  val SentinelBands: Seq[String] = Seq("B2", "B3", "B4", "B8")

  /** Anchored band-token predicate: keeps file names containing the band id
    * as a full token, never `.xml` sidecars. */
  def bandFileFilter(name: Column, bands: Seq[String]): Column = {
    val token = bands.map(java.util.regex.Pattern.quote).mkString("(", "|", ")")
    name.rlike(s"[._]$token[._]") && !name.contains("xml")
  }

  /** Which band id a file name carries (NULL if none). */
  def bandOf(name: Column, bands: Seq[String]): Column = {
    val token = bands.map(java.util.regex.Pattern.quote).mkString("(", "|", ")")
    val ex = regexp_extract(name, s"[._]$token[._]", 1)
    when(ex =!= "", ex)
  }

  /** Deterministic stack: per-band rows (image_id, band, h, w, pixels) →
    * one D4 row per image with bands concatenated in `bands` order
    * (beta semantics). The per-image sort key is the band's position in the
    * canonical list, so the result is order-independent under parallelism.
    */
  def stack(perBand: DataFrame, bands: Seq[String], sensor: String): DataFrame = {
    val pos = array_position(lit(bands.toArray), col("band"))
    perBand
      .withColumn("_pos", pos)
      .where(col("_pos") > 0)
      .groupBy("image_id", "h", "w")
      .agg(
        flatten(array_sort(collect_list(struct(col("_pos"), col("pixels"))))
          .getField("pixels")).as("pixels"),
        count(lit(1)).as("_nbands"))
      .where(col("_nbands") === bands.size)
      .select(
        col("image_id"),
        lit(sensor).as("sensor"),
        typedLit(bands).as("bands"),
        lit(bands.size).as("c"),
        col("h"), col("w"), col("pixels"))
  }
}
