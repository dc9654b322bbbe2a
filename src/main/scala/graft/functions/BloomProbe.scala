package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Blocked bloom filter over 64-bit keys, built for broadcast-probe
  * join prefiltering (SURVEY.md §2.3 scale notes).
  *
  * Layout: the bit vector is an `Array[Long]` split into 8-word
  * (512-bit) blocks; each key's k probe bits all land in ONE block
  * chosen by the high bits of its first hash — one cache line touched
  * per probe instead of k scattered reads (the register-blocked design
  * from public "cache-, hash- and space-efficient bloom filter" work
  * and Impala/Kudu's BlockBloomFilter). Probe order of magnitude:
  * ~1-2 ns vs ~k·50 ns for a scattered standard bloom at 100 TB fact
  * scale, where the probe sits inside whole-stage codegen on every row.
  *
  * Hashing: two independent finalizer-strength mixes of the key
  * (splitmix64 constants) drive Kirsch-Mitzenmacher double hashing
  * h_i = h1 + i·h2. Pure integer math — identical on every JVM.
  */
object LongBloom {

  final val WordsPerBlock = 8 // 512-bit blocks: one cache line

  /** Bits sized for `n` items at false-positive rate `p` (standard
    * m = -n·ln p / ln²2), rounded up to whole blocks; k = m/n·ln 2
    * clamped to [1, 8] (blocked filters gain nothing past 8 probes).
    */
  def provision(n: Long, p: Double): (Int, Int) = {
    require(n > 0, s"bloom needs n > 0, got $n")
    require(p > 0 && p < 1, s"bloom needs fpp in (0,1), got $p")
    val mBits = math.ceil(-n.toDouble * math.log(p) / (math.log(2) * math.log(2)))
    val words = math.max(WordsPerBlock,
      ((mBits / 64).toLong + WordsPerBlock - 1) / WordsPerBlock * WordsPerBlock)
    require(words <= Int.MaxValue / 8, s"bloom too large: $words words")
    val k = math.max(1, math.min(8,
      math.round(mBits / n.toDouble * math.log(2)).toInt))
    (words.toInt, k)
  }

  def mix1(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def mix2(x: Long): Long = {
    var z = x + 0xc2b2ae3d27d4eb4fL
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  def insert(bits: Array[Long], k: Int, key: Long): Unit = {
    val h1 = mix1(key)
    val h2 = mix2(key) | 1L
    val block = (((h1 >>> 32) * (bits.length / WordsPerBlock)) >>> 32).toInt *
      WordsPerBlock
    var i = 0
    var h = h1
    while (i < k) {
      val bit = (h & 0x1ffL).toInt // 9 bits: position within the 512-bit block
      bits(block + (bit >> 6)) |= 1L << (bit & 63)
      h += h2
      i += 1
    }
  }

  /** Hot-path probe — called from generated code, one block touched. */
  def contains(bits: Array[Long], k: Int, key: Long): Boolean = {
    val h1 = mix1(key)
    val h2 = mix2(key) | 1L
    val block = (((h1 >>> 32) * (bits.length / WordsPerBlock)) >>> 32).toInt *
      WordsPerBlock
    var i = 0
    var h = h1
    while (i < k) {
      val bit = (h & 0x1ffL).toInt
      if ((bits(block + (bit >> 6)) & (1L << (bit & 63))) == 0L) return false
      h += h2
      i += 1
    }
    true
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
}

/** `bloom_might_contain(key)` against a broadcast-embedded blocked
  * bloom — exact-superset semantics (never a false negative), so any
  * join placed after it is unchanged. Codegen'd: the bit array rides
  * as a referenced object (not inlined source), the probe is a static
  * call inside whole-stage codegen.
  */
case class BloomMightContain(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression {

  require(bits.length % LongBloom.WordsPerBlock == 0 && bits.length > 0,
    s"bloom bit array must be whole 8-word blocks, got ${bits.length}")
  require(k >= 1 && k <= 8, s"bloom k out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects an integral key, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  private def toLong(input: Any): Long = input match {
    case l: Long  => l
    case i: Int   => i.toLong
    case s: Short => s.toLong
    case b: Byte  => b.toLong
  }

  override def nullSafeEval(input: Any): Any =
    LongBloom.contains(bits, k, toLong(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LongBloom.contains($bitsRef, $k, (long)($c))")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)

  // The bit array is payload, not identity: keep equals/hashCode cheap
  // and reference-based via the default case-class semantics on Array
  // (eq), which is correct here — two builds are never the same filter.
}
