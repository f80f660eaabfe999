package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing for sketch operators
  * (MinHash, SimHash). Spark's native `hash`/`xxhash64` are fast but
  * engine-specific; for oracle-checkable sketches we derive a 60-bit
  * integer from md5 (identical in Spark and DuckDB:
  * `conv(substr(md5(x),1,15),16,10)` ≙ `('0x'||substr(md5(x),1,15))::BIGINT`)
  * and expand it into a universal hash family `h_i(x) = (a_i·x + b_i) mod p`
  * over the Mersenne prime p = 2^31−1 — exact 64-bit integer math on
  * both engines, no overflow (a_i·x < 2^37).
  */
object PortableHash {

  /** Mersenne prime modulus for the hash family. */
  val P: Long = 2147483647L

  def aCoef(i: Int): Long = 2L * i + 1
  def bCoef(i: Int): Long = 7L + i.toLong * i

  /** 60-bit integer digest of a string column. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** i-th member of the hash family applied to a digest reduced mod P. */
  def family(h0: Column, i: Int): Column =
    (lit(aCoef(i)) * h0 + lit(bCoef(i))) % P

  @transient private lazy val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** JVM-side twin of `md5Long(col)` alone (no mod-P reduction): the
    * unsigned top 60 bits of the md5 digest (≡ the first 15 hex
    * chars), derived numerically from the first 8 bytes instead of
    * formatting and re-parsing hex — shared by [[digestOf]] and the
    * native logreg-margin kernel
    * ([[GraftExpressions.logregMarginOf]]). */
  def digest60(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    digest60Bytes(b, 0, b.length)
  }

  /** [[digest60]] over a byte slice — the zero-allocation form for
    * kernels that already hold utf-8 bytes (native logreg margin).
    * Hot-path safe: thread-local digest instance. */
  def digest60Bytes(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = mdLocal.get()
    md.reset()
    md.update(bytes, off, len)
    val b = md.digest()
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (b(i) & 0xffL); i += 1 }
    top >>> 4
  }

  /** JVM-side twin of `md5Long(col) % P` — for driver-side probe
    * values (sketch bucket precomputation) and JVM-state streaming
    * sketches that must agree with the SQL form bit-for-bit.
    * Equivalence with the hex-parse form is spec-pinned
    * (PortableHashSpec). */
  def digestOf(s: String): Long = digest60(s) % P

  /** DuckDB-side twins (string fragments for oracle SQL). */
  def md5LongSql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  def familySql(h0: String, i: Int): String =
    s"((${aCoef(i)} * $h0 + ${bCoef(i)}) % $P)"
}
