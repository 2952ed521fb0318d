package graft.raster

/** Georeferencing metadata of a GeoTIFF, carried VERBATIM as raw tag
  * payloads so decode→encode reproduces the source's CRS/transform the way
  * rasterio's profile copy does in the reference's `array2raster`
  * (data_pair/fct_data_extraction.py:15–20: `kwargs = raster.meta` → write
  * with the same crs/transform). No interpretation happens here — the
  * engine treats projection as opaque metadata riding alongside the pixel
  * payload (a column, in the Dataset view), which is exactly the fidelity
  * the meta-copy contract needs: bytes in, identical bytes out.
  *
  * Field ↔ TIFF tag:
  *   - pixelScale — 33550 ModelPixelScaleTag (3 doubles)
  *   - tiepoints  — 33922 ModelTiepointTag (6·k doubles)
  *   - transform  — 34264 ModelTransformationTag (16 doubles)
  *   - geoKeys    — 34735 GeoKeyDirectoryTag (4·n unsigned shorts,
  *                  incl. the CRS code, e.g. ProjectedCSTypeGeoKey 3072)
  *   - geoDoubles — 34736 GeoDoubleParamsTag
  *   - geoAscii   — 34737 GeoAsciiParamsTag (NUL terminator normalized
  *                  away on read, re-appended on write)
  *
  * Empty array / empty string = tag absent. */
final case class GeoMeta(
    pixelScale: Array[Double],
    tiepoints: Array[Double],
    transform: Array[Double],
    geoKeys: Array[Int],
    geoDoubles: Array[Double],
    geoAscii: String) {

  def isEmpty: Boolean =
    pixelScale.isEmpty && tiepoints.isEmpty && transform.isEmpty &&
      geoKeys.isEmpty && geoDoubles.isEmpty && geoAscii.isEmpty

  /** Structural equality (case-class eq on Arrays is reference eq). */
  def sameAs(o: GeoMeta): Boolean =
    pixelScale.sameElements(o.pixelScale) &&
      tiepoints.sameElements(o.tiepoints) &&
      transform.sameElements(o.transform) &&
      geoKeys.sameElements(o.geoKeys) &&
      geoDoubles.sameElements(o.geoDoubles) &&
      geoAscii == o.geoAscii
}

object GeoMeta {
  val empty: GeoMeta = GeoMeta(Array.emptyDoubleArray, Array.emptyDoubleArray,
    Array.emptyDoubleArray, Array.emptyIntArray, Array.emptyDoubleArray, "")
}
