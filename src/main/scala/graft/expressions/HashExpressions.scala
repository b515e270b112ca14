package graft.expressions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_md5_split(s)` → `array<bigint>` `[hi, lo]`: the MD5 digest of `s`
  * as two big-endian signed longs (bytes 0-7 and 8-15).
  *
  * Rationale: every signature pipeline here derives integer values (hex
  * digits, 20-bit minhash lanes) from `md5()`. The builtin route allocates
  * a fresh `MessageDigest` per row (commons-codec `DigestUtils`), encodes
  * 32 hex chars into a `UTF8String`, and then the query PARSES those chars
  * back to integers (`conv`/`substr`). This expression computes the digest
  * once per row on a per-thread reused `MessageDigest` and hands back the
  * raw 128 bits — every downstream value is a shift+mask away, entirely
  * inside whole-stage codegen.
  *
  * Parity: nibble `i` (0-based, hex-char order) of the digest is
  * `(hi >>> (60 - 4*i)) & 15` for `i < 16` and
  * `(lo >>> (124 - 4*i)) & 15` for `i >= 16` — identical to
  * `instr('0123456789abcdef', substr(md5(s), i+1, 1)) - 1`, so DuckDB
  * oracles written against the hex form are unaffected.
  */
case class Md5Split(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_split expects string or binary, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_split"

  override def nullSafeEval(input: Any): Any = {
    val bytes = child.dataType match {
      case StringType => input.asInstanceOf[UTF8String].getBytes
      case _ => input.asInstanceOf[Array[Byte]]
    }
    Md5Split.digestPair(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = child.dataType match {
        case StringType => s"$c.getBytes()"
        case _ => c
      }
      s"${ev.value} = graft.expressions.Md5Split$$.MODULE$$.digestPair($bytes);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Split =
    copy(child = newChild)
}

object Md5Split {
  private val localDigest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Digest → [hi, lo] as an unboxed array (called from generated code). */
  def digestPair(bytes: Array[Byte]): ArrayData = {
    val md = localDigest.get()
    md.reset()
    val d = md.digest(bytes)
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
    while (i < 16) { lo = (lo << 8) | (d(i) & 0xffL); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(hi, lo))
  }

  /** Column form. */
  def apply(c: Column): Column =
    GraftExpressionBridge.column(Md5Split(GraftExpressionBridge.expression(c)))
}
