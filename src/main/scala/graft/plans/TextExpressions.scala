package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: for j in 0..k-1, the minimum md5 hex of
  * `"j:" + shingle` over the shingle set — bit-identical to the
  * composed form in TextFunctions.minhashSignature (and to the DuckDB
  * oracle), but computed at the byte level:
  *
  *  - one reused MessageDigest per thread (no per-call allocation),
  *  - mins tracked as raw 16-byte digests with unsigned comparison
  *    (hex encoding is order-preserving per byte, so byte-order min ==
  *    hex-string min), hex-encoded only for the k winners,
  *  - zero intermediate hex strings for the k × |shingles| candidates.
  *
  * CodegenFallback is deliberate: the md5 work dwarfs the boxing cost,
  * and the fallback keeps the implementation auditable.
  */
case class MinhashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "graft_minhash"

  @transient private lazy val localDigest =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(b: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((b(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(b(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic byte compare (== hex-string compare). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = localDigest.get()
    val mins = new Array[Array[Byte]](k)
    val prefixes = Array.tabulate(k)(j => s"$j:".getBytes("UTF-8"))
    var s = 0
    while (s < n) {
      val sh = arr.getUTF8String(s)
      if (sh != null) {
        val shBytes = sh.getBytes
        var j = 0
        while (j < k) {
          md.reset()
          md.update(prefixes(j))
          md.update(shBytes)
          val d = md.digest()
          if (mins(j) == null || less(d, mins(j))) mins(j) = d
          j += 1
        }
      }
      s += 1
    }
    // empty shingle set → k null entries, matching
    // array_min(transform(empty, ...)) in the composed form
    new GenericArrayData(mins.map(m =>
      if (m == null) null else toHex(m)).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Column API: native minhash signature over a shingle-array column. */
  def minhashSignature(shingles: Column, k: Int): Column =
    GraftSqlBridge.column(
      MinhashSignatureExpr(GraftSqlBridge.expression(shingles), k))
}
