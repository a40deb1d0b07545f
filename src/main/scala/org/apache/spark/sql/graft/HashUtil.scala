package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Hash kernels shared by graft's custom expressions (and callable from
  * generated code, so the expressions stay inside whole-stage codegen).
  *
  * The 64-bit string hash is the low 8 bytes of MD5 interpreted
  * little-endian — bit-identical to DuckDB's `md5_number_lower`, which is
  * what makes simhash/minhash results oracle-checkable by the driver's
  * DuckDB compare. MD5 is slower than xxhash64 but engine-independent;
  * swap-in of a faster fingerprint is a documented engine-specific option.
  */
object HashUtil {
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Low 8 bytes of MD5(bytes), little-endian (== DuckDB md5_number_lower
    * bit pattern, reinterpreted as a signed long). */
  def md5Lower8LE(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 7
    while (i >= 0) { h = (h << 8) | (d(8 + i) & 0xffL); i -= 1 }
    h
  }

  def md5Lower8LE(s: UTF8String): Long = md5Lower8LE(s.getBytes)

  /** 64-bit SimHash over a token array: bit b of the result is set iff the
    * sum of (+1/-1) votes from bit b of each token's hash is positive.
    * Null tokens are skipped. */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5Lower8LE(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Order-sensitive polynomial rolling hash over a token array:
    * h = sum(hash(tok_i) * 31^(n-1-i)) in Z/2^64. Null tokens hash as 0. */
  def rollingHash64(arr: ArrayData): Long = {
    var h = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val t = if (arr.isNullAt(i)) 0L else md5Lower8LE(arr.getUTF8String(i))
      h = h * 31L + t
      i += 1
    }
    h
  }
}
