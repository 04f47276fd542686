package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DecimalType, IntegerType, LongType, ShortType}

/** Wraparound (modulo-2^N) arithmetic for the logical unsigned dtypes.
  *
  * Spark has no unsigned types, so the lattice stores uintN in the next
  * wider signed type (uint64 → DECIMAL(20,0)) — see `graft.Types.toSpark`
  * and SURVEY §1.3. numpy (and therefore the reference, whose C++ kernels
  * compute in the same-width C type — reference
  * `legate/pandas/common/types.py:72-104` keeps `uint8..uint64` as native
  * dtypes) WRAPS same-dtype arithmetic modulo 2^N. These helpers compute
  * the widened value and fold it back into the unsigned range, keeping
  * every intermediate inside a type that cannot overflow under ANSI mode:
  *
  *  - 8/16/32-bit: compute in LongType (max product (2^32-1)² needs
  *    DECIMAL, see `umul`), `pmod` by 2^N, cast back to the storage type;
  *  - 64-bit: compute in DECIMAL(21..38,0), `pmod` by 2^64; products use
  *    a 32-bit hi/lo split so no intermediate exceeds DECIMAL(38,0).
  *
  * All helpers assume operands are already in-range for their logical
  * dtype (the parquet scan guarantees this for ingested data).
  */
object UnsignedOps {

  private val two64 = BigDecimal("18446744073709551616") // 2^64
  private val two32 = 4294967296L

  private def modulus(bits: Int): Column =
    if (bits == 64) lit(two64.bigDecimal).cast(DecimalType(21, 0))
    else lit(1L << bits)

  /** Storage type for a logical uintN (mirrors Types.toSpark). */
  def storageType(bits: Int): DataType = bits match {
    case 8 => ShortType
    case 16 => IntegerType
    case 32 => LongType
    case 64 => DecimalType(20, 0)
    case other => throw new IllegalArgumentException(s"uint$other")
  }

  private def back(c: Column, bits: Int): Column = c.cast(storageType(bits))

  /** (a + b) mod 2^bits — numpy uintN + uintN. */
  def uadd(a: Column, b: Column, bits: Int): Column =
    if (bits == 64)
      back(pmod(a.cast(DecimalType(21, 0)) + b.cast(DecimalType(21, 0)),
        modulus(64)), 64)
    else back(pmod(a.cast(LongType) + b.cast(LongType), modulus(bits)), bits)

  /** (a - b) mod 2^bits — numpy uintN - uintN (wraps below zero). */
  def usub(a: Column, b: Column, bits: Int): Column =
    if (bits == 64)
      back(pmod(a.cast(DecimalType(21, 0)) - b.cast(DecimalType(21, 0)),
        modulus(64)), 64)
    else back(pmod(a.cast(LongType) - b.cast(LongType), modulus(bits)), bits)

  /** (a * b) mod 2^bits — numpy uintN * uintN.
    *
    * 8/16-bit products fit a long directly. 32-bit products reach
    * (2^32-1)² ≈ 1.8e19 > Long.MaxValue, so they run in DECIMAL(38,0).
    * 64-bit products reach 2^128 > DECIMAL(38) — decompose each operand
    * into 32-bit halves: with a = ah·2^32 + al,
    *   (a·b) mod 2^64 = (al·bl + ((ah·bl + al·bh) mod 2^32)·2^32) mod 2^64
    * and every partial product is < 2^64 (DECIMAL(20,0)-safe).
    */
  def umul(a: Column, b: Column, bits: Int): Column = bits match {
    case 8 | 16 =>
      back(pmod(a.cast(LongType) * b.cast(LongType), modulus(bits)), bits)
    case 32 =>
      val d = DecimalType(38, 0)
      back(pmod(a.cast(d) * b.cast(d), lit(two32).cast(d)), 32)
    case 64 =>
      val d = DecimalType(38, 0)
      val t32 = lit(BigDecimal(two32).bigDecimal).cast(d)
      val (ad, bd) = (a.cast(d), b.cast(d))
      // hi half via exact subtraction, NOT floor(a / 2^32): Spark decimal
      // division rounds to scale 6, which can cross an integer boundary
      // for quotients within 2^-32 of it; (a - a mod 2^32) / 2^32 divides
      // exactly, so the 6dp result IS the integer.
      val al = pmod(ad, t32); val ah = ((ad - al) / t32).cast(d)
      val bl = pmod(bd, t32); val bh = ((bd - bl) / t32).cast(d)
      val cross = pmod(ah * bl + al * bh, t32)
      back(pmod(al * bl + cross * t32, lit(two64.bigDecimal).cast(d)), 64)
    case other => throw new IllegalArgumentException(s"uint$other")
  }
}
