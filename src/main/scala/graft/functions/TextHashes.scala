package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (codegen'd).
  *
  * fp(s) = Σ s[i]·B^i mod M over UTF-8 bytes, B = 131, M = 2^61 - 1 —
  * a content-defined 61-bit fingerprint usable for exact-dup detection
  * and stable sharding of documents. Pure integer math, so the value is
  * identical on any executor/JVM.
  */
case class RollingHashFingerprint(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"doc_fingerprint expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"

  override def nullSafeEval(input: Any): Any =
    RollingHashFingerprint.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashFingerprint.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RollingHashFingerprint {
  final val M: Long = (1L << 61) - 1
  final val B: Long = 131L

  /** Horner-free accumulation in index order; mulmod via Math.multiplyHigh. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var acc = 0L
    var pow = 1L
    var i = 0
    while (i < bytes.length) {
      acc = (acc + mulMod(bytes(i) & 0xffL, pow)) % M
      pow = mulMod(pow, B)
      i += 1
    }
    acc
  }

  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product mod 2^61-1: (hi·2^64 + lo) ≡ hi·8 + lo parts
    val r = (lo & M) + ((lo >>> 61) | (hi << 3)) // hi < 2^61 here
    val s = (r & M) + (r >>> 61)
    if (s >= M) s - M else s
  }
}

/** 64-bit SimHash over a token array (codegen'd single pass).
  *
  * Each token votes its xxhash64 bit pattern (+1/−1 per bit); the sign
  * vector is the fingerprint. Near-duplicate docs differ in few bits →
  * hamming-distance filter. Deterministic: fixed seed, integer math.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.ofTokens(Array.tabulate(arr.numElements()) { i =>
      if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    })
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val toks = ctx.freshName("toks")
      s"""
         |org.apache.spark.unsafe.types.UTF8String[] $toks =
         |  new org.apache.spark.unsafe.types.UTF8String[$c.numElements()];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  $toks[$i] = $c.isNullAt($i) ? null : $c.getUTF8String($i);
         |}
         |${ev.value} = graft.functions.SimHash64.ofTokens($toks);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  final val Seed = 42L

  def ofTokens(tokens: Array[UTF8String]): Long = {
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (tok != null) {
        val h = XXH64.hashUnsafeBytes(tok.getBaseObject, tok.getBaseOffset, tok.numBytes, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
