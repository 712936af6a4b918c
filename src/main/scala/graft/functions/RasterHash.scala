package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `raster_hash(payload)` — the image content-dedup key
  * ([[graft.multimodal.Multimodal.rasterHash]]: decode via
  * `javax.imageio`, FNV-1a 64 over the canonical (dims, row-major
  * RGB) raster) as a SQL-reachable expression, so
  * `SELECT raster_hash(payload) FROM images GROUP BY 1` hits the same
  * execution path as the m07 gate's Column/Dataset form.
  *
  * CodegenFallback deliberately: the per-row cost is the image decode
  * itself (ImageIO is JVM library code either way), so generated code
  * would save nothing — this is the one expression family where
  * interpretation is not the bottleneck. NULL in (unreadable bytes
  * included) → NULL out; consumers must exclude NULLs before
  * grouping, same contract as the Dataset helper.
  */
case class RasterHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"raster_hash expects BINARY, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "raster_hash"

  override def nullSafeEval(input: Any): Any =
    graft.multimodal.Multimodal
      .rasterHash(input.asInstanceOf[Array[Byte]]) match {
      case Some((_, _, h)) => h
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): RasterHash =
    copy(child = newChild)
}
