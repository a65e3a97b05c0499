package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding-similarity hot path.
  *
  * `aggregate(zip_with(...))` higher-order functions evaluate one boxed
  * lambda call per element — inside an all-pairs join that is O(n²·dim)
  * interpreted allocations. This expression is a primitive float loop with
  * `doGenCode`, so it stays inside whole-stage codegen (and its interpreted
  * `eval` path, used by nested-loop join conditions, is still a boxing-free
  * JIT-friendly loop).
  *
  * Semantics match the HOF formulation and the DuckDB oracle exactly for
  * non-null float elements: sequential left-to-right sum of
  * `(double)a[i] * (double)b[i]`. Divergence from `zip_with` on edge inputs,
  * by design: length mismatch folds over the common prefix (zip_with
  * null-pads), and a null ELEMENT contributes its value slot rather than
  * nulling the whole sum — embedding columns are dense, non-null arrays.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd int8 dot product over two BINARY columns of signed-byte
  * codes — the scalar-quantized (SQ8) search kernel: ranking is EXACT
  * integer arithmetic (Σ a[i]·b[i] as long, |dot| ≤ dim·2¹⁴ ≪ 2⁶³), so
  * a top-k over quantized embeddings has no float rounding for an
  * oracle to chase, and the hot loop is a primitive byte loop inside
  * whole-stage codegen. Length mismatch folds over the common prefix
  * (dense equal-length code columns by construction).
  */
case class ByteVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "byte_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += (long) ($a[$i] * $b[$i]);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd Hamming distance over two BINARY columns of packed sign
  * bits — the 1-bit-quantized search kernel (32× smaller than float32):
  * Σ popcount(a[i] XOR b[i]) as an exact small integer, so the ranking
  * has no float arithmetic for an oracle to chase, and the hot loop is
  * a primitive XOR/popcount loop inside whole-stage codegen. Length
  * mismatch folds over the common prefix (dense equal-length code
  * columns by construction); equal trailing pad bits contribute zero.
  */
case class ByteVecHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "byte_vec_hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) {
      s += java.lang.Integer.bitCount((x(i) ^ y(i)) & 0xFF)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += java.lang.Integer.bitCount(($a[$i] ^ $b[$i]) & 0xFF);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd sign-bit packing for binary quantization: one pass over an
  * `Array[Float]` embedding compares each dimension against its literal
  * threshold (`(mn+mx)/2`, precomputed from a dim-row range aggregate)
  * and packs 8 dims/byte MSB-first into a BINARY value. Constant
  * dimensions (`constDims`) emit 0, mirroring the mx==mn convention.
  * The thresholds ride the plan as reference objects, so quantizing a
  * corpus is a single shuffle-free projection — the posexplode/groupBy
  * formulation this replaces shuffled dim× the corpus row count just to
  * regroup what was already row-local.
  */
case class PackSignBits(child: Expression, thresholds: IndexedSeq[Double],
                        constDims: IndexedSeq[Boolean]) extends UnaryExpression {

  // Params are IndexedSeq (element-wise case-class equality), not Array
  // (reference equality), so semanticEquals/canonicalization recognizes two
  // identical quantization expressions — subexpression and exchange reuse
  // would silently never fire otherwise. Codegen still wants primitive
  // arrays; these are derived once per (de)serialized instance.
  @transient private lazy val thrArr: Array[Double] = thresholds.toArray
  @transient private lazy val cstArr: Array[Boolean] = constDims.toArray

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "pack_sign_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), thrArr.length)
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      if (!cstArr(i) && a.getFloat(i).toDouble > thrArr(i))
        out(i >> 3) = (out(i >> 3) | (1 << (7 - (i & 7)))).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val thr = ctx.addReferenceObj("thr", thrArr, "double[]")
    val cst = ctx.addReferenceObj("cst", cstArr, "boolean[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $thr.length);
         |byte[] $out = new byte[($n + 7) / 8];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$cst[$i] && (double) $a.getFloat($i) > $thr[$i]) {
         |    $out[$i >> 3] = (byte) ($out[$i >> 3] | (1 << (7 - ($i & 7))));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd one-pass SQ8 encoding against literal per-dimension ranges:
  * element i packs to `round(((x − mn_i) / (mx_i − mn_i)) · 255) − 128` as
  * one signed byte (constant dims, mx == mn, pack to 0). This replaces the
  * posexplode → broadcast-range join → groupByKey/mapGroups reassembly the
  * int8 index builders ran — that formulation shuffled dim× the corpus row
  * count through an object-serialized regroup just to reassemble what was
  * already row-local (guide §2.3/§4), exactly the hazard [[PackSignBits]]
  * already closed for the 1-bit tier.
  *
  * Math is BIT-IDENTICAL to the column tree it replaces (the DuckDB oracle
  * pins it): x widens float→double, the scale term associates as
  * `((x − mn) / (mx − mn)) · 255.0`, and rounding is Spark's
  * `Round(_, 0)` on DoubleType — `BigDecimal.valueOf(d).setScale(0,
  * HALF_UP)` — not `Math.round`, whose floor(x+0.5) form disagrees on
  * values like the largest double below an exact half.
  */
case class PackInt8(child: Expression, mns: IndexedSeq[Double],
                    mxs: IndexedSeq[Double]) extends UnaryExpression {

  @transient private lazy val mnArr: Array[Double] = mns.toArray
  @transient private lazy val mxArr: Array[Double] = mxs.toArray

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "pack_int8"

  // getFloat on an array<double> would silently pack garbage where the
  // column tree this replaces cast any numeric type — reject non-float
  // element types at analysis. (Parquet-sourced arrays commonly declare
  // containsNull=true even when no element is null, so element
  // nullability is accepted; a genuinely-null element packs as the mn
  // code, same as the interpreted path.)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pack_int8 requires array<float> input, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), mnArr.length)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val mn = mnArr(i); val mx = mxArr(i)
      if (mx != mn) {
        val scaled = ((a.getFloat(i).toDouble - mn) / (mx - mn)) * 255.0
        val r = java.math.BigDecimal.valueOf(scaled)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        out(i) = (r.toInt - 128).toByte
      }
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("mn", mnArr, "double[]")
    val mx = ctx.addReferenceObj("mx", mxArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val sc = ctx.freshName("sc")
      val r = ctx.freshName("r")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $mn.length);
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($mx[$i] != $mn[$i]) {
         |    double $sc = (((double) $a.getFloat($i) - $mn[$i])
         |      / ($mx[$i] - $mn[$i])) * 255.0;
         |    double $r = java.math.BigDecimal.valueOf($sc)
         |      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue();
         |    $out[$i] = (byte) (((int) $r) - 128);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd bitset membership test for a LongType position column: true
  * iff bit `pos` of the reference-object long[] bitset is set. The Bloom
  * prune's membership test expressed as `element_at(<m-element literal
  * array>, pos)` inlined the whole bitset into the plan THREE times (one
  * per probe level) — a ~100 KB condition string that bloated plan
  * stringification/serialization and janino input (measured: q_bloom_prune
  * first-rep 8 s, warm +0.6 s). Here the bitset rides as a reference
  * object (m/64 longs) and the plan prints `bitset_contains(pos)`.
  * Out-of-range positions test false (callers mod by m, so none occur).
  */
case class BitsetContains(child: Expression, bits: IndexedSeq[Long])
    extends UnaryExpression {

  @transient private lazy val bitArr: Array[Long] = bits.toArray

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bitset_contains"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitset_contains requires bigint input, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    val w = (v >>> 6).toInt
    v >= 0 && w < bitArr.length && (bitArr(w) & (1L << (v & 63))) != 0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bits", bitArr, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val w = ctx.freshName("w")
      s"""
         |int $w = (int) ($v >>> 6);
         |${ev.value} = $v >= 0 && $w < $b.length
         |  && (($b[$w] & (1L << ((int) ($v & 63L)))) != 0L);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd PQ distance table: for one subspace slice (an `Array[Float]`
  * column) and a LITERAL codebook of k sub-centroids, emit the length-k
  * array of squared L2 distances `‖x − c_j‖² = 〈x,x〉 − 2〈x,c_j〉 + 〈c_j,c_j〉`.
  *
  * This replaces a fan of k separate literal-codebook dot expressions
  * (`array(sqDist(c_0), …, sqDist(c_k))`): at (m=16, k=256) that fan
  * generates a projection past janino's method-size limit, fails
  * compilation, and silently drops the whole stage to interpreted
  * expression eval — 10–30× slower with no functional signal. Here the
  * codebook rides as a reference object and the generated code is one
  * constant-size nested loop, so the projection stays inside whole-stage
  * codegen at ANY (m, k).
  *
  * Float math is BIT-IDENTICAL to the expression fan it replaces (the
  * DuckDB oracle pins it): 〈x,x〉 and each 〈x,c_j〉 are left-to-right double
  * sums of float products (FloatVecDot's order), 〈c_j,c_j〉 is precomputed
  * with the same loop, and the combine is `(vv − 2.0·dq) + cc` in double —
  * the exact association the old `(vv - lit(2.0)*dot(s,c)) + dot(c,c)`
  * column tree produced. Length mismatch folds 〈x,c_j〉 over the common
  * prefix, like FloatVecDot.
  */
case class FloatSqDistTable(child: Expression, codebook: IndexedSeq[Float],
                            k: Int, subDim: Int) extends UnaryExpression {
  require(codebook.length == k * subDim,
    s"codebook ${codebook.length} != $k*$subDim")

  // IndexedSeq params for element-wise case-class equality (see
  // PackSignBits); primitive arrays derived once per instance for the loop.
  @transient private lazy val cbArr: Array[Float] = codebook.toArray
  @transient private lazy val ccArr: Array[Double] = {
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      var s = 0.0
      var i = 0
      while (i < subDim) {
        val v = cbArr(c * subDim + i).toDouble
        s += v * v
        i += 1
      }
      out(c) = s
      c += 1
    }
    out
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "float_sqdist_table"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val len = a.numElements()
    var vv = 0.0
    var i = 0
    while (i < len) {
      val v = a.getFloat(i).toDouble
      vv += v * v
      i += 1
    }
    val m = math.min(len, subDim)
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      var dq = 0.0
      val base = c * subDim
      i = 0
      while (i < m) {
        dq += a.getFloat(i).toDouble * cbArr(base + i).toDouble
        i += 1
      }
      out(c) = (vv - 2.0 * dq) + ccArr(c)
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("cb", cbArr, "float[]")
    val cc = ctx.addReferenceObj("cc", ccArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val vv = ctx.freshName("vv")
      val dq = ctx.freshName("dq")
      val base = ctx.freshName("base")
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v") // freshName: a bare local can shadow an
      // enclosing generated scope's `v`, which janino rejects — and the
      // rejection silently drops the stage to interpreted eval
      s"""
         |int $len = $a.numElements();
         |double $vv = 0.0;
         |for (int $i = 0; $i < $len; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $vv += $v * $v;
         |}
         |int $m = java.lang.Math.min($len, $subDim);
         |double[] $out = new double[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  double $dq = 0.0;
         |  int $base = $c * $subDim;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $dq += (double) $a.getFloat($i) * (double) $cb[$base + $i];
         |  }
         |  $out[$c] = ($vv - 2.0 * $dq) + $cc[$c];
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd dot TABLE against a literal centroid matrix: for one
  * `Array[Float]` column and k sub-centroids, emit the length-k array of
  * 〈x, c_j〉 dots — the IVF assignment/probing kernel. Same motivation and
  * discipline as [[FloatSqDistTable]]: the k-literal-`FloatVecDot` fan it
  * replaces generates O(k·dim) lines of projection code and fails janino
  * past a few hundred centroids (production IVF runs nlist in the
  * thousands), while this is one constant-size nested loop that stays in
  * whole-stage codegen at any k. Float math is bit-identical to the fan:
  * each dot is FloatVecDot's left-to-right double sum over the common
  * prefix.
  */
case class FloatDotTable(child: Expression, centroids: IndexedSeq[Float],
                         k: Int, dim: Int) extends UnaryExpression {
  require(centroids.length == k * dim, s"centroids ${centroids.length} != $k*$dim")

  @transient private lazy val cbArr: Array[Float] = centroids.toArray

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "float_dot_table"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = math.min(a.numElements(), dim)
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      var s = 0.0
      val base = c * dim
      var i = 0
      while (i < m) {
        s += a.getFloat(i).toDouble * cbArr(base + i).toDouble
        i += 1
      }
      out(c) = s
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("cb", cbArr, "float[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      s"""
         |int $m = java.lang.Math.min($a.numElements(), $dim);
         |double[] $out = new double[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  double $s = 0.0;
         |  int $base = $c * $dim;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $cb[$base + $i];
         |  }
         |  $out[$c] = $s;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd TWO-LEVEL coarse assignment — the IVF build kernel at
  * production nlist: a flat argmax over nlist centroids is O(nlist·dim)
  * dots per vector (measured 49.5 s for 2M vectors at nlist=1414 — the
  * whole index-build bill at corpus scale). Here the centroids are
  * pre-clustered into ~√nlist supergroups (driver-side, they are k·dim
  * floats); per vector this computes the nSuper supergroup dots, selects
  * the `sProbe` best, and scans ONLY their member centroids —
  * O((√nlist + sProbe·nlist/√nlist)·dim), ~an order fewer dots — with
  * exactness recoverable by raising sProbe (sProbe = nSuper reproduces
  * the flat argmax bit-for-bit). Members live in a CSR layout riding as
  * reference objects; ties break to the LOWEST original centroid id,
  * matching the flat path's first-occurrence-of-max rule.
  */
case class TwoLevelArgMax(child: Expression,
                          superCents: IndexedSeq[Float], nSuper: Int,
                          dim: Int,
                          memberCents: IndexedSeq[Float],
                          memberCids: IndexedSeq[Int],
                          groupStart: IndexedSeq[Int],
                          sProbe: Int) extends UnaryExpression {
  require(superCents.length == nSuper * dim, "bad supercentroid matrix")
  require(groupStart.length == nSuper + 1 &&
    memberCents.length == memberCids.length * dim, "bad CSR member layout")
  require(sProbe >= 1 && sProbe <= nSuper, s"sProbe $sProbe out of 1..$nSuper")
  require(memberCids.nonEmpty, "two_level_argmax needs >= 1 member centroid")

  @transient private lazy val scArr: Array[Float] = superCents.toArray
  @transient private lazy val mcArr: Array[Float] = memberCents.toArray
  @transient private lazy val idArr: Array[Int] = memberCids.toArray
  @transient private lazy val gsArr: Array[Int] = groupStart.toArray

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "two_level_argmax"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = math.min(a.numElements(), dim)
    val x = new Array[Double](m)
    var i = 0
    while (i < m) { x(i) = a.getFloat(i).toDouble; i += 1 }
    val s = new Array[Double](nSuper)
    var g = 0
    while (g < nSuper) {
      var d = 0.0
      val base = g * dim
      i = 0
      while (i < m) { d += x(i) * scArr(base + i); i += 1 }
      s(g) = d
      g += 1
    }
    // Probe selection SKIPS empty supergroups (stale empty-group centers
    // from superCluster attract nothing and must not burn a probe slot or
    // win the argmax with zero members behind it); a selection pass that
    // finds no comparable score (all remaining scores NaN — an all-NaN
    // input vector) falls back to the lowest non-taken non-empty group so
    // the result is still deterministic, and the FIRST member scanned
    // always installs (bestCid == MaxValue clause) so NaN dots can never
    // leave the sentinel behind.
    val taken = new Array[Boolean](nSuper)
    var best = Double.NegativeInfinity
    var bestCid = Int.MaxValue
    var p = 0
    var exhausted = false
    while (p < sProbe && !exhausted) {
      var bg = -1
      var bs = Double.NegativeInfinity
      g = 0
      while (g < nSuper) {
        if (!taken(g) && gsArr(g + 1) > gsArr(g) && s(g) > bs) {
          bs = s(g); bg = g
        }
        g += 1
      }
      if (bg == -1) {
        g = 0
        while (bg == -1 && g < nSuper) {
          if (!taken(g) && gsArr(g + 1) > gsArr(g)) bg = g
          g += 1
        }
      }
      if (bg == -1) exhausted = true
      else {
        taken(bg) = true
        var mi = gsArr(bg)
        while (mi < gsArr(bg + 1)) {
          var d = 0.0
          val base = mi * dim
          i = 0
          while (i < m) { d += x(i) * mcArr(base + i); i += 1 }
          if (d > best || bestCid == Int.MaxValue ||
              (d == best && idArr(mi) < bestCid)) {
            best = d; bestCid = idArr(mi)
          }
          mi += 1
        }
        p += 1
      }
    }
    if (bestCid == Int.MaxValue)
      throw new IllegalStateException(
        "two_level_argmax scanned no member centroid — empty CSR layout")
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sc = ctx.addReferenceObj("sc", scArr, "float[]")
    val mc = ctx.addReferenceObj("mc", mcArr, "float[]")
    val ids = ctx.addReferenceObj("ids", idArr, "int[]")
    val gs = ctx.addReferenceObj("gs", gsArr, "int[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      val p = ctx.freshName("p")
      val mi = ctx.freshName("mi")
      val m = ctx.freshName("m")
      val x = ctx.freshName("x")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      val taken = ctx.freshName("taken")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val bg = ctx.freshName("bg")
      val bs = ctx.freshName("bs")
      s"""
         |int $m = java.lang.Math.min($a.numElements(), $dim);
         |double[] $x = new double[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $x[$i] = (double) $a.getFloat($i);
         |}
         |double[] $s = new double[$nSuper];
         |for (int $g = 0; $g < $nSuper; $g++) {
         |  double $d = 0.0;
         |  int $base = $g * $dim;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $d += $x[$i] * $sc[$base + $i];
         |  }
         |  $s[$g] = $d;
         |}
         |boolean[] $taken = new boolean[$nSuper];
         |double $best = java.lang.Double.NEGATIVE_INFINITY;
         |int $bestCid = java.lang.Integer.MAX_VALUE;
         |for (int $p = 0; $p < $sProbe; $p++) {
         |  int $bg = -1;
         |  double $bs = java.lang.Double.NEGATIVE_INFINITY;
         |  for (int $g = 0; $g < $nSuper; $g++) {
         |    if (!$taken[$g] && $gs[$g + 1] > $gs[$g] && $s[$g] > $bs) {
         |      $bs = $s[$g]; $bg = $g;
         |    }
         |  }
         |  if ($bg == -1) {
         |    for (int $g = 0; $bg == -1 && $g < $nSuper; $g++) {
         |      if (!$taken[$g] && $gs[$g + 1] > $gs[$g]) { $bg = $g; }
         |    }
         |  }
         |  if ($bg == -1) break;
         |  $taken[$bg] = true;
         |  for (int $mi = $gs[$bg]; $mi < $gs[$bg + 1]; $mi++) {
         |    double $d = 0.0;
         |    int $base = $mi * $dim;
         |    for (int $i = 0; $i < $m; $i++) {
         |      $d += $x[$i] * $mc[$base + $i];
         |    }
         |    if ($d > $best || $bestCid == java.lang.Integer.MAX_VALUE ||
         |        ($d == $best && $ids[$mi] < $bestCid)) {
         |      $best = $d; $bestCid = $ids[$mi];
         |    }
         |  }
         |}
         |if ($bestCid == java.lang.Integer.MAX_VALUE) {
         |  throw new IllegalStateException(
         |    "two_level_argmax scanned no member centroid - empty CSR layout");
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd scaled int8 dot for RESIDUAL scalar quantization: over a
  * float query vector and a BINARY column of signed-byte residual codes,
  * Σ q_d · (codes_d + 128) · scale_d — the dequantized-residual part of
  * 〈q, x̂〉 = 〈q, centroid〉 + 〈q, mn〉 + Σ q_d·(code_d+128)·scale_d, so a
  * residual-SQ8 ranking never materializes the reconstructed vector
  * (the FAISS IVF-SQ residual search shape: coarse term via the
  * centroid dot table, per-dim offsets as literal vectors, and this
  * kernel for the code-dependent term). Per-dim scales ride as a
  * reference object; length mismatch folds over the common prefix.
  */
case class ByteScaledDot(left: Expression, right: Expression,
                         scale: IndexedSeq[Double]) extends BinaryExpression {

  @transient private lazy val scArr: Array[Double] = scale.toArray

  override def dataType: DataType = DoubleType
  override def prettyName: String = "byte_scaled_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[Array[Byte]]
    val n = math.min(math.min(q.numElements(), codes.length), scArr.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += q.getFloat(i).toDouble * ((codes(i) + 128) * scArr(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sc = ctx.addReferenceObj("sc", scArr, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min(
         |  java.lang.Math.min($a.numElements(), $b.length), $sc.length);
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} +=
         |    (double) $a.getFloat($i) * (($b[$i] + 128) * $sc[$i]);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Codegen'd dot product over two `Array[Float]` columns. */
  def dotF(a: Column, b: Column): Column =
    Bridge.column(FloatVecDot(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd length-k dot table against a literal centroid matrix. */
  def dotTable(v: Column, cents: Seq[Array[Float]]): Column = {
    require(cents.nonEmpty)
    val dim = cents.head.length
    Bridge.column(FloatDotTable(Bridge.expression(v),
      cents.flatten.toIndexedSeq, cents.length, dim))
  }

  /** Codegen'd length-k squared-L2 table against a literal PQ codebook. */
  def sqDistTable(v: Column, cents: Seq[Array[Float]]): Column = {
    require(cents.nonEmpty)
    val subDim = cents.head.length
    Bridge.column(FloatSqDistTable(Bridge.expression(v),
      cents.flatten.toIndexedSeq, cents.length, subDim))
  }

  /** Codegen'd signed-int8 dot over two BINARY code columns. */
  def dotB(a: Column, b: Column): Column =
    Bridge.column(ByteVecDot(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd Σ q_d·(code_d+128)·scale_d over (float query, byte codes). */
  def scaledDotB(q: Column, codes: Column, scale: Array[Double]): Column =
    Bridge.column(ByteScaledDot(Bridge.expression(q),
      Bridge.expression(codes), scale.toIndexedSeq))

  /** Codegen'd two-level coarse assignment (see [[TwoLevelArgMax]]).
    * `groups(g)` lists the original centroid ids in supergroup g;
    * `superCents(g)` is that group's centroid-of-centroids.
    */
  def twoLevelArgMax(v: Column, centroids: Seq[Array[Float]],
                     superCents: Seq[Array[Float]],
                     groups: Seq[Seq[Int]], sProbe: Int): Column = {
    require(superCents.nonEmpty && groups.length == superCents.length)
    val dim = superCents.head.length
    val memberCids = groups.flatten
    val memberCents = memberCids.flatMap(centroids(_).toSeq)
    val groupStart = groups.scanLeft(0)(_ + _.length)
    Bridge.column(TwoLevelArgMax(Bridge.expression(v),
      superCents.flatten.toIndexedSeq, superCents.length, dim,
      memberCents.toIndexedSeq, memberCids.toIndexedSeq,
      groupStart.toIndexedSeq, sProbe))
  }

  /** Codegen'd Hamming distance over two BINARY packed-bit columns. */
  def hammingB(a: Column, b: Column): Column =
    Bridge.column(ByteVecHamming(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd one-pass sign-bit packing against literal thresholds. */
  def packBits(v: Column, thresholds: Array[Double],
               constDims: Array[Boolean]): Column =
    Bridge.column(PackSignBits(Bridge.expression(v),
      thresholds.toIndexedSeq, constDims.toIndexedSeq))

  /** Codegen'd one-pass SQ8 byte packing against literal per-dim ranges. */
  def packInt8(v: Column, mns: Array[Double], mxs: Array[Double]): Column =
    Bridge.column(PackInt8(Bridge.expression(v),
      mns.toIndexedSeq, mxs.toIndexedSeq))

  /** Codegen'd reference-object bitset membership test on a long column. */
  def bitsetContains(pos: Column, bits: Array[Long]): Column =
    Bridge.column(BitsetContains(Bridge.expression(pos), bits.toIndexedSeq))
}
