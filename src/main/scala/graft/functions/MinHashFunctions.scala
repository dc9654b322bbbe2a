package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a document in ONE codegen'd pass: `array<long>`
  * of length `numHashes`, or NULL when the text has fewer than two
  * tokens (exactly the rows `filter(size(sh) > 0)` dropped).
  *
  * Bit-identical to the composable chain it replaces
  * (`transform(sequence(0, n-1), j -> array_min(transform(shingles,
  * s -> xxhash64(j, s))))` over word-bigram shingles — ScalaTest-pinned
  * against [[graft.ops.MinHashDedup.signaturesViaAgg]]), but ~10-30×
  * cheaper per row: the lambda-HOF chain is interpreted (Catalyst does
  * not codegen higher-order functions) and allocates a shingle string
  * per bigram, where this expression exploits that a word-bigram
  * shingle `tok[i] ++ " " ++ tok[i+1]` over a single-space split is a
  * CONTIGUOUS BYTE SLICE of the original text — so each `xxhash64(j, s)`
  * is `XXH64.hashUnsafeBytes` over a slice of the input's own bytes:
  * zero string allocation, a primitive double loop, fully inside
  * whole-stage codegen. `array_distinct` in the reference chain is
  * irrelevant under min-aggregation (min over duplicates = min over
  * distinct), so it is elided.
  *
  * Spark's `xxhash64(j, s)` semantics are reproduced exactly:
  * `seed_j = XXH64.hashInt(j, 42)` (j is the IntegerType sequence
  * element), then `XXH64.hashUnsafeBytes(sliceBytes, seed_j)`. The
  * per-j seeds are memoized per numHashes (they are pure constants).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && numHashes >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects string with numHashes >= 1, " +
        s"got ${child.dataType.simpleString}, numHashes=$numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.ofText(input.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.MinHashSignature.ofText($c, $numHashes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  private final val SparkHashSeed = 42L
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  /** seed_j = xxhash64 of the IntegerType literal j at Spark's default
    * seed — the running-hash state after the first child of
    * `xxhash64(j, s)`. Constant per (j, numHashes); memoized. */
  def seeds(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes, n =>
      Array.tabulate[Long](n)(j => XXH64.hashInt(j, SparkHashSeed)))

  /** Null (drop) when < 2 space-split tokens, else the signature.
    *
    * Token boundaries are the 0x20 bytes of the UTF-8 text (a space
    * can only encode the space codepoint; multi-byte sequences have
    * the high bit set), matching `split(text, " ")` with its implicit
    * limit -1 — empty tokens between consecutive/leading/trailing
    * spaces included, exactly like the chain this replaces. The
    * shingle for token pair (i, i+1) is the byte range
    * [start(i), end(i+1)) of the original text. */
  def ofText(text: UTF8String, numHashes: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    // token start offsets: 0 and every position after a space byte
    var nTok = 1
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) nTok += 1
      i += 1
    }
    if (nTok < 2) return null
    val starts = new Array[Int](nTok)
    var t = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    val sj = seeds(numHashes)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var s = 0
    while (s < nTok - 1) {
      val from = starts(s)
      // end of token s+1: next start minus the separator, or text end
      val until = if (s + 2 < nTok) starts(s + 2) - 1 else len
      val slen = until - from
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashUnsafeBytes(base, off + from, slen, sj(j))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }
}

/** LSH band hashes of a MinHash signature in one codegen'd pass:
  * `array<long>` of length `bands`, where
  * `bh[b] = xxhash64(slice(sig, b*r + 1, r))` with `r = |sig| / bands`
  * — reproduced exactly as Spark computes xxhash64 of an array<long>
  * child (fold `XXH64.hashLong(elem, acc)` over the slice, acc0 = 42).
  * Replaces the interpreted `transform(sequence(...), b ->
  * xxhash64(slice(...)))` chain; equality ScalaTest-pinned.
  */
case class MinHashBands(child: Expression, bands: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bands >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects array<long> with bands >= 1, got ${other.simpleString}, bands=$bands")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashBands.ofSignature(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashBands.ofSignature($c, $bands)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashBands {
  private final val SparkHashSeed = 42L

  def ofSignature(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    require(n % bands == 0,
      s"minhash_bands: signature length $n not divisible by bands=$bands")
    val r = n / bands
    val out = new Array[Long](bands)
    var b = 0
    var i = 0
    while (b < bands) {
      var acc = SparkHashSeed
      var k = 0
      while (k < r) {
        acc = XXH64.hashLong(sig.getLong(i), acc)
        i += 1; k += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}
