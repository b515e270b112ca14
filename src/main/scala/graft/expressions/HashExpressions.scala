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

/** `graft_shingle_md5(toks, n)` → `array<struct<sh_hi:bigint, sh_lo:bigint>>`:
  * the DISTINCT word n-gram shingles of a token array, each digested to the
  * same `[hi, lo]` MD5 split [[Md5Split]] produces for the shingle STRING
  * (tokens joined by single spaces) — fused into one native evaluation.
  *
  * Replaces the composed hot path of the dedup family
  * (`explode(array_distinct(shingles(toks, n)))` + `graft_md5_split`):
  * higher-order functions evaluate interpreted and allocate a `UTF8String`
  * per shingle plus an array per row; this expression streams each
  * shingle's token bytes straight into a per-thread reused MessageDigest —
  * token bytes are materialized ONCE per row, no intermediate shingle
  * strings, no distinct pass (first-occurrence dedup on the 128-bit digest
  * happens inline; collisions are the usual 2^-128 non-event).
  *
  * Parity: null tokens are skipped inside a shingle exactly like
  * `concat_ws(" ", ...)` skips them, so values match the composed form
  * byte-for-byte and every DuckDB oracle written against `md5(shingle)`
  * is unaffected.
  */
case class ShingleMd5(toks: Expression, n: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def left: Expression = toks
  override def right: Expression = n

  override def checkInputDataTypes(): TypeCheckResult = toks.dataType match {
    case ArrayType(StringType, _) =>
      if (n.foldable && n.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "graft_shingle_md5 expects a foldable int shingle width")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_md5 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("sh_hi", LongType, nullable = false),
      StructField("sh_lo", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_shingle_md5"

  override def nullSafeEval(toksVal: Any, nVal: Any): Any =
    ShingleMd5.compute(toksVal.asInstanceOf[ArrayData], nVal.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.expressions.ShingleMd5$$.MODULE$$.compute($t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleMd5 =
    copy(toks = newLeft, n = newRight)
}

object ShingleMd5 {
  private val localDigest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Distinct shingle digests, first-occurrence order (mirrors
    * array_distinct over the shingle strings). Called from generated code.
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val len = arr.numElements()
    if (k <= 0 || len < k)
      return new GenericArrayData(Array.empty[Any])
    // token bytes once per row, reused by up to k shingles each
    val tokBytes = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      tokBytes(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = localDigest.get()
    val out = new java.util.ArrayList[Any](len - k + 1)
    // two-tier first-occurrence dedup: a map keyed on hi resolves ~all
    // cases in one probe; the rare distinct-lo-same-hi collisions fall
    // back to an exact composite-key set
    val dedup = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    val seen = new java.util.HashSet[(Long, Long)]()
    i = 0
    while (i <= len - k) {
      md.reset()
      var first = true
      var j = 0
      while (j < k) {
        val b = tokBytes(i + j)
        if (b != null) { // concat_ws skips nulls, including its separator
          if (!first) md.update(' '.toByte)
          md.update(b)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      var hi = 0L; var lo = 0L
      var p = 0
      while (p < 8) { hi = (hi << 8) | (d(p) & 0xffL); p += 1 }
      while (p < 16) { lo = (lo << 8) | (d(p) & 0xffL); p += 1 }
      // 128-bit first-occurrence dedup: key on hi, verify lo (hi collisions
      // with differing lo get a composite re-check below)
      val prev = dedup.get(hi)
      if (prev == null) {
        dedup.put(hi, lo)
        out.add(InternalRow(hi, lo))
      } else if (prev.longValue() != lo) {
        // rare hi-collision with distinct lo: exact check on the FULL
        // 128-bit pair (a folded 64-bit key here could alias two distinct
        // digests that share hi and silently drop a shingle)
        if (seen.add((hi, lo))) out.add(InternalRow(hi, lo))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column form. */
  def of(toksCol: Column, n: Int): Column =
    GraftExpressionBridge.column(ShingleMd5(
      GraftExpressionBridge.expression(toksCol),
      org.apache.spark.sql.catalyst.expressions.Literal(n)))
}
