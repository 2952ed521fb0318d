package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical byte-CSV of a decoded pixel array: each float (stored as
  * b/255f by the decoder) reconstructs its source byte via round(p·255)
  * (exact — p·255 lands within one ulp of the integer) and the bytes join
  * with commas. ONE pass per row; the higher-order
  * `transform`+`concat_ws` formulation of the same thing is interpreted
  * per ELEMENT by Spark (768 interpreter round-trips per frame — measured
  * 4.0 s for q98 at sf0.1 vs sub-second native). The CSV string — not a
  * binary blob — is the canonical form so the DuckDB oracle can rebuild
  * it arithmetically with array_to_string. */
object PixelCsv {
  def pixelCsv(pixels: Column): Column = toColumn(PixelCsvExpr(toExpr(pixels)))
}

case class PixelCsvExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "pixel_csv"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // containsNull=false only: a null element would read as float 0 via
      // ArrayData.getFloat and silently serialize as byte 0 in the canonical
      // CSV/md5. Decoded pixel arrays are non-null by construction; anything
      // else must be rejected at analysis, not absorbed at eval.
      case ArrayType(FloatType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pixel_csv requires ARRAY<FLOAT> with non-null elements, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val sb = new java.lang.StringBuilder(n * 4)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      sb.append(Math.round(a.getFloat(i) * 255.0).toInt)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): PixelCsvExpr =
    copy(child = c)
}
