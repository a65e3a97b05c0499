package graft.functions

/** IEEE 754 binary16 and bfloat16 codecs (Java 17 has no
  * `Float.floatToFloat16`), used by format-owning writers to honor the
  * [[graft.operators.FieldOps.PrecisionKey]] column tag with a genuinely
  * narrower on-disk dtype (reference `domains/mesh/filters/precision.py:40-45`
  * requests float16/bfloat16 artifact widths; Spark's in-memory mapping stays
  * FloatType). Encoding rounds to nearest, ties to even — the IEEE default
  * and what numpy's `astype(float16)` does, so artifacts match the
  * reference's byte-for-byte on shared values.
  */
object Half {

  /** float → binary16 bits, round-to-nearest-even; overflow → ±Inf,
    * |x| < 2⁻²⁵ (half of the min subnormal) → ±0, NaN → quiet NaN.
    */
  def toHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val absBits = bits & 0x7fffffff
    if (absBits >= 0x7f800000) // Inf / NaN
      return (if (absBits > 0x7f800000) sign | 0x7e00 else sign | 0x7c00).toShort
    if (absBits == 0) return sign.toShort
    val e = (absBits >>> 23) - 127 // unbiased exponent (0 only for f32 subnormals, all < 2⁻²⁵)
    if (absBits < 0x00800000) return sign.toShort // f32 subnormal: far below half range
    if (e >= 16) return (sign | 0x7c00).toShort // overflow → Inf
    if (e >= -14) { // normal half: drop 13 mantissa bits with RNE
      val mant = absBits & 0x7fffff
      val base = ((e + 15) << 10) | (mant >>> 13)
      val rem = mant & 0x1fff
      val out = if (rem > 0x1000 || (rem == 0x1000 && (base & 1) == 1)) base + 1 else base
      // mantissa carry rolls into the exponent field (and to Inf at the top)
      // exactly as IEEE rounding requires
      return (sign | out).toShort
    }
    if (e < -25) return sign.toShort // underflow → zero
    // subnormal half: value = m·2⁻²⁴, m = round(mant24 · 2^(e+1))
    val mant24 = (absBits & 0x7fffff) | 0x800000
    val sh = -(e + 1) // in [14, 24]
    val base = mant24 >>> sh
    val rem = mant24 & ((1 << sh) - 1)
    val halfPoint = 1 << (sh - 1)
    val out = if (rem > halfPoint || (rem == halfPoint && (base & 1) == 1)) base + 1 else base
    (sign | out).toShort
  }

  /** binary16 bits → float (exact: every half value is a float). */
  def fromHalf(h: Short): Float = {
    val bits = h & 0xffff
    val neg = (bits & 0x8000) != 0
    val exp = (bits >>> 10) & 0x1f
    val mant = bits & 0x3ff
    val v =
      if (exp == 31) { if (mant != 0) Float.NaN else Float.PositiveInfinity }
      else if (exp == 0) mant * 5.9604645e-8f // m · 2⁻²⁴, exact
      else java.lang.Math.scalb((mant | 0x400).toFloat, exp - 25)
    if (neg) -v else v
  }

  /** float → bfloat16 bits (top 16 float bits, RNE); NaN stays quiet. */
  def toBf16(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    if ((bits & 0x7fffffff) > 0x7f800000) return ((bits >>> 16) | 0x0040).toShort
    val lsb = (bits >>> 16) & 1
    ((bits + 0x7fff + lsb) >>> 16).toShort
  }

  /** bfloat16 bits → float (exact by construction). */
  def fromBf16(h: Short): Float =
    java.lang.Float.intBitsToFloat((h & 0xffff) << 16)
}
