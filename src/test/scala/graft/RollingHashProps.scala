package graft

import java.math.BigInteger
import java.nio.charset.StandardCharsets

import org.scalacheck.{Prop, Properties}
import graft.functions.RollingHashFingerprint

/** ScalaCheck model-check of the fingerprint's modular arithmetic: the
  * optimized multiplyHigh/fold implementation must agree with a slow
  * BigInteger reference on arbitrary inputs (SURVEY.md §5.2).
  */
object RollingHashProps extends Properties("RollingHashFingerprint") {

  private val M = BigInteger.valueOf(RollingHashFingerprint.M)
  private val B = BigInteger.valueOf(RollingHashFingerprint.B)

  private def reference(bytes: Array[Byte]): Long = {
    var acc = BigInteger.ZERO
    var pow = BigInteger.ONE
    bytes.foreach { b =>
      acc = acc.add(BigInteger.valueOf(b & 0xffL).multiply(pow)).mod(M)
      pow = pow.multiply(B).mod(M)
    }
    acc.longValueExact()
  }

  property("matches BigInteger reference") = Prop.forAll { (s: String) =>
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    RollingHashFingerprint.hashBytes(bytes) == reference(bytes)
  }

  property("in range [0, M)") = Prop.forAll { (s: String) =>
    val h = RollingHashFingerprint.hashBytes(s.getBytes(StandardCharsets.UTF_8))
    h >= 0L && h < RollingHashFingerprint.M
  }

  property("deterministic") = Prop.forAll { (s: String) =>
    val b = s.getBytes(StandardCharsets.UTF_8)
    RollingHashFingerprint.hashBytes(b) == RollingHashFingerprint.hashBytes(b.clone())
  }
}
