package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** Native kernels for the transactional-lake read path. */

/** Decode a GDV1 deletion-vector sidecar (binary file contents) into its
  * masked row positions (array<long>, writer-sorted) — the executor-side
  * decode of [[graft.sources.TxnLake]]'s distributed DV path (a
  * `binaryFile` scan of the sidecars when the cumulative mask count
  * exceeds the driver budget), as a NATIVE expression rather than a
  * Scala UDF: the repo's kernels are all native Catalyst expressions,
  * and r16 flagged the decode UDF as the lone exception.
  * CodegenFallback deliberately: the expression evaluates once per
  * sidecar FILE per scan (one row per masked file), never per data row —
  * codegen would buy nothing. A malformed payload fails loudly (wrong
  * magic), identical to the driver-side [[graft.sources.TxnLake]]
  * decode. */
case class DvDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected binary, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dv_decode"

  override def nullSafeEval(v: Any): Any = {
    val buf = java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    val magic = new Array[Byte](4)
    buf.get(magic)
    require(java.util.Arrays.equals(magic,
      Array[Byte]('G', 'D', 'V', '1')),
      "TxnLake: not a deletion vector file")
    val n = buf.getInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = buf.getLong; i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LakeExpressions {
  def dvDecode(content: Column): Column =
    ColumnBridge.column(DvDecode(ColumnBridge.expression(content)))
}
