package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd vector math over `array<float>` embedding columns.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are evaluated
  * INTERPRETED — one lambda closure invocation plus boxing per element —
  * which makes an all-pairs cosine over millions of pairs CPU-bound on
  * overhead, not arithmetic. These expressions generate a tight primitive
  * loop inside whole-stage codegen (the same preference order as the rest
  * of the engine: built-in > codegen'd Expression > UDF).
  *
  * Numerics: accumulation is double, sequential in index order — the SAME
  * order the higher-order formulation used, so results stay bit-identical
  * to the DuckDB oracle.
  *
  * Scale: per-row cost is exactly 1 fused multiply-add per element; at
  * 100 TB the similarity pass is memory-bandwidth-bound, which is the
  * physical optimum for this operator.
  */
object VectorExpressions {

  /** ⟨a, b⟩ in double precision. Null if either side is null; mismatched
    * lengths and NULL ELEMENTS raise (a data bug should fail loudly, not
    * silently skew — getFloat on a null slot would silently read 0.0). */
  case class FloatDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<float>), got $other")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "float_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      require(y.numElements() == n,
        s"float_dot: length mismatch $n vs ${y.numElements()}")
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i))
          throw new IllegalArgumentException(
            s"float_dot: null element at index $i")
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |final int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  throw new IllegalArgumentException(
           |    "float_dot: length mismatch " + $n + " vs " + $b.numElements());
           |}
           |double ${ev.value}Acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |    throw new IllegalArgumentException(
           |      "float_dot: null element at index " + $i);
           |  }
           |  ${ev.value}Acc +=
           |    ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
           |}
           |${ev.value} = ${ev.value}Acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): FloatDot =
      copy(left = newLeft, right = newRight)
  }

  /** ‖a‖₂ in double precision. */
  case class FloatNorm(child: Expression)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got $other")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "float_norm"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        if (x.isNullAt(i))
          throw new IllegalArgumentException(
            s"float_norm: null element at index $i")
        val v = x.getFloat(i).toDouble
        acc += v * v
        i += 1
      }
      math.sqrt(acc)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val v = ctx.freshName("v")
        s"""
           |final int $n = $a.numElements();
           |double ${ev.value}Acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) {
           |    throw new IllegalArgumentException(
           |      "float_norm: null element at index " + $i);
           |  }
           |  final double $v = (double) $a.getFloat($i);
           |  ${ev.value}Acc += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt(${ev.value}Acc);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression)
        : FloatNorm = copy(child = newChild)
  }

  /** Sign-random-projection LSH buckets for `tables` independent hash
    * tables of `planes` hyperplanes each, in ONE pass over the vector.
    * Hyperplane (t·planes+p) component i is ±1 by a splitmix64-derived
    * bit — data-independent and reproducible with no model artifact.
    * Output: array<long>[tables], element t = table t's bucket id
    * (planes sign bits). */
  case class LshBuckets(child: Expression, planes: Int, tables: Int)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got $other")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "lsh_buckets"

    // ONE source of truth for seed derivation and the interpreted loop
    // (LshKernel) — the multi-probe kernel's probe 0 must stay
    // bit-identical to this bucket, and three drifting copies of the
    // splitmix sign-hash would break that silently. The codegen string in
    // doGenCode below necessarily restates the loop; KernelSpec asserts
    // interpreted/codegen parity so it cannot drift unnoticed.
    private lazy val planeSeeds: Array[Long] =
      LshKernel.seeds(tables * planes)

    override def nullSafeEval(a: Any): Any =
      LshKernel.buckets(a.asInstanceOf[ArrayData], planes, tables,
        planeSeeds)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val seedsRef = ctx.addReferenceObj("lshSeeds", planeSeeds, "long[]")
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val p = ctx.freshName("p")
        val t = ctx.freshName("t"); val n = ctx.freshName("n")
        val v = ctx.freshName("v"); val proj = ctx.freshName("proj")
        val seed = ctx.freshName("seed"); val bucket = ctx.freshName("bucket")
        val out = ctx.freshName("out")
        s"""
           |final int $n = $a.numElements();
           |final long[] $out = new long[$tables];
           |for (int $t = 0; $t < $tables; $t++) {
           |  long $bucket = 0L;
           |  for (int $p = 0; $p < $planes; $p++) {
           |    final long $seed = $seedsRef[$t * $planes + $p];
           |    double $proj = 0.0;
           |    for (int $i = 0; $i < $n; $i++) {
           |      long $v = $seed + ((long) $i) * 0x9E3779B97F4A7C15L;
           |      $v = ($v ^ ($v >>> 30)) * 0xBF58476D1CE4E5B9L;
           |      $v = $v ^ ($v >>> 27);
           |      $proj += ((double) $a.getFloat($i))
           |        * ((($v & 1L) == 1L) ? 1.0 : -1.0);
           |    }
           |    if ($proj > 0) $bucket |= (1L << $p);
           |  }
           |  $out[$t] = $bucket;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions
           |  .UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression)
        : LshBuckets = copy(child = newChild)
  }

  /** Multi-probe variant of [[LshBuckets]] (Lv et al., VLDB'07): per
    * table, emit the base bucket PLUS `probes − 1` neighbor buckets — the
    * perturbation SETS of smallest total |projection| margin (see
    * [[LshKernel.multiProbe]]; flipping two near-boundary bits is
    * correctly preferred over one far bit). A vector near a hyperplane
    * almost tips into the adjacent bucket — probing those first recovers
    * most of the recall extra tables would buy WITHOUT replicating the
    * corpus index: the corpus stays at one row per (vector, table); only
    * the tiny probe side fans out. `probes = 2^planes` (planes ≤ 12)
    * probes every bucket — the exhaustive brute-force-equivalent
    * configuration. Output: array<long>[tables × probes], element
    * t·probes+j = table t's j-th probe bucket (j = 0 is the base,
    * identical to [[LshBuckets]] element t). */
  case class LshBucketsMultiProbe(child: Expression, planes: Int,
      tables: Int, probes: Int) extends UnaryExpression {
    require(probes >= 1 && probes <= LshKernel.maxProbes(planes),
      s"probes must be in [1, ${LshKernel.maxProbes(planes)}], got " +
        s"$probes (planes = $planes)")

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got $other")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "lsh_buckets_multiprobe"

    private lazy val planeSeeds: Array[Long] =
      LshKernel.seeds(tables * planes)

    override def nullSafeEval(a: Any): Any =
      LshKernel.multiProbe(a.asInstanceOf[ArrayData], planes, tables,
        probes, planeSeeds)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val seedsRef = ctx.addReferenceObj("lshSeeds", planeSeeds, "long[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"""${ev.value} = graft.functions.LshKernel
           |  .multiProbe($a, $planes, $tables, $probes, $seedsRef);
         """.stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression)
        : LshBucketsMultiProbe = copy(child = newChild)
  }

  def floatDot(a: Column, b: Column): Column =
    column(FloatDot(expression(a), expression(b)))

  def floatNorm(a: Column): Column = column(FloatNorm(expression(a)))

  def lshBuckets(vec: Column, planes: Int, tables: Int): Column =
    column(LshBuckets(expression(vec), planes, tables))

  def lshBucketsMultiProbe(vec: Column, planes: Int, tables: Int,
      probes: Int): Column =
    column(LshBucketsMultiProbe(expression(vec), planes, tables, probes))

  /** Symmetric int8 scalar quantization (SQ8) of an `array<float>`
    * embedding: `code_i = round_half_away(127 * x_i / max|x|)`, the
    * all-zero vector encoding to all zeros. 4× memory over float32 — at
    * 100 TB the ANN candidate-verification pass becomes bandwidth-bound
    * on exactly this payload, so codes travel through shuffles and
    * indexes instead of the float vectors. Per-vector scales cancel in
    * cosine, so quantized cosine ranking needs ONLY the codes
    * ([[int8Dot]]); the scale `max|x|/127` matters only for value
    * reconstruction. */
  case class Sq8Encode(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got $other")
      }
    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def prettyName: String = "sq8_encode"

    override def nullSafeEval(a: Any): Any =
      Sq8Kernel.encode(a.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""
           |${ev.value} = graft.functions.Sq8Kernel.encode($a);
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression)
        : Sq8Encode = copy(child = newChild)
  }

  /** ⟨a, b⟩ over two int8 code arrays, exact integer accumulation (long).
    * 64·127² per element bounds far below Long range at any real
    * dimensionality. */
  case class Int8Dot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<tinyint>, array<tinyint>), got $other")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "int8_dot"

    override def nullSafeEval(a: Any, b: Any): Any =
      Sq8Kernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""
           |${ev.value} = graft.functions.Sq8Kernel.dot($a, $b);
         """.stripMargin)

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Int8Dot =
      copy(left = newLeft, right = newRight)
  }

  /** max|x_i| in double precision (0.0 for an empty array) — the SQ8
    * scale numerator. */
  case class FloatAbsMax(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got $other")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "float_abs_max"

    override def nullSafeEval(a: Any): Any =
      Sq8Kernel.absMax(a.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""
           |${ev.value} = graft.functions.Sq8Kernel.absMax($a);
         """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression)
        : FloatAbsMax = copy(child = newChild)
  }

  def sq8Encode(vec: Column): Column = column(Sq8Encode(expression(vec)))

  def floatAbsMax(vec: Column): Column = column(FloatAbsMax(expression(vec)))

  def int8Dot(a: Column, b: Column): Column =
    column(Int8Dot(expression(a), expression(b)))
}

/** SQ8 loops shared by interpreted eval and generated code (the
  * [[LshKernel]] discipline: TOP-LEVEL object so Janino-compiled code can
  * call them as plain Java statics; ONE implementation so interpreted and
  * codegen paths cannot drift). */
object Sq8Kernel {

  /** Round half away from zero — matches Spark's `round()` (HALF_UP) and
    * DuckDB's `round()` on doubles, which is what makes the codes
    * oracle-reproducible. (`Math.round` would differ: it rounds -2.5 to
    * -2, toward +∞.) */
  private def roundHalfAway(q: Double): Long =
    if (q >= 0) math.floor(q + 0.5d).toLong else math.ceil(q - 0.5d).toLong

  // fn labels the throwing SQL function: encode delegates here, and an
  // error blaming float_abs_max from a sq8_encode call would misdirect
  private def absMaxImpl(x: ArrayData, fn: String): Double = {
    val n = x.numElements()
    var amax = 0.0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i))
        throw new IllegalArgumentException(s"$fn: null element at $i")
      val v = math.abs(x.getFloat(i).toDouble)
      if (v > amax) amax = v
      i += 1
    }
    amax
  }

  def absMax(x: ArrayData): Double = absMaxImpl(x, "float_abs_max")

  def encode(x: ArrayData): ArrayData = {
    val n = x.numElements()
    val amax = absMaxImpl(x, "sq8_encode")
    var i = 0
    val out = new Array[Byte](n)
    if (amax > 0.0d) {
      i = 0
      while (i < n) {
        out(i) = roundHalfAway(127.0d * x.getFloat(i).toDouble / amax).toByte
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"int8_dot: length mismatch $n vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"int8_dot: null element at $i")
      acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    acc
  }
}

/** Static per-row loops shared by interpreted eval and generated code (the
  * [[WinnowKernel]] discipline: one monomorphic call per row). TOP-LEVEL
  * object — Scala emits static forwarders only for top-level objects, and
  * the generated (Janino-compiled) code calls these as plain Java
  * statics. */
object LshKernel {
    def seeds(n: Int): Array[Long] = {
      def splitmix64(x0: Long): Long = {
        var x = x0 + 0x9E3779B97F4A7C15L
        x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
        x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
        x ^ (x >>> 31)
      }
      Array.tabulate(n)(g => splitmix64(g.toLong))
    }

    /** Single-probe buckets: one long per table (bit p = sign of the
      * projection on plane p). The interpreted twin of LshBuckets'
      * generated code; multiProbe's probe 0 equals this by construction. */
    def buckets(x: ArrayData, planes: Int, tables: Int,
        planeSeeds: Array[Long]): ArrayData = {
      val n = x.numElements()
      val out = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var p = 0
        while (p < planes) {
          val seed = planeSeeds(t * planes + p)
          var proj = 0.0
          var i = 0
          while (i < n) {
            var v = seed + i.toLong * 0x9E3779B97F4A7C15L
            v = (v ^ (v >>> 30)) * 0xBF58476D1CE4E5B9L
            v = v ^ (v >>> 27)
            proj += x.getFloat(i).toDouble * (if ((v & 1L) == 1L) 1.0 else -1.0)
            i += 1
          }
          if (proj > 0) bucket |= (1L << p)
          p += 1
        }
        out(t) = bucket
        t += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    /** Probe budget ceiling: with ≤ [[SubsetPlanesMax]] planes the full
      * 2^planes perturbation lattice is scored, so every bucket is
      * reachable; wider planes fall back to single-bit flips. */
    val SubsetPlanesMax = 12
    def maxProbes(planes: Int): Int =
      if (planes <= SubsetPlanesMax) 1 << planes else planes + 1

    /** Multi-probe perturbation sequence (Lv et al., VLDB'07): per table,
      * the `probes` bucket ids reached by XOR-ing the base bucket with the
      * flip-SETS of smallest total margin Σ|proj(bit)| — flipping two
      * near-boundary bits is correctly preferred over one far bit (the
      * single-flip shortcut cannot express that). Score-ascending, mask-
      * ascending tie-break; the empty set (the base bucket, score 0) is
      * always probe 0, bit-identical to [[buckets]]. For planes ≤
      * [[SubsetPlanesMax]] the full 2^planes lattice is scored with one DP
      * pass (score(m) = score(m without lowest bit) + |proj(lowest)|), so
      * `probes = 2^planes` probes EVERY bucket of every table — the
      * exhaustive configuration whose candidate set is provably the whole
      * corpus (the q_lsh_topk full-oracle basis). Wider planes fall back
      * to single-bit flips with probes ≤ planes + 1. */
    def multiProbe(x: ArrayData, planes: Int, tables: Int, probes: Int,
        planeSeeds: Array[Long]): ArrayData = {
      val n = x.numElements()
      val out = new Array[Long](tables * probes)
      val proj = new Array[Double](planes)
      val subset = planes <= SubsetPlanesMax
      val nMasks = if (subset) 1 << planes else 0
      val score = if (subset) new Array[Double](nMasks) else null
      val order =
        if (subset) new Array[Int](nMasks) else new Array[Int](planes)
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var p = 0
        while (p < planes) {
          val seed = planeSeeds(t * planes + p)
          var s = 0.0
          var i = 0
          while (i < n) {
            // same splitmix-finalizer ±1 signs as LshBuckets — probe 0 is
            // bit-identical to the single-probe bucket
            var v = seed + i.toLong * 0x9E3779B97F4A7C15L
            v = (v ^ (v >>> 30)) * 0xBF58476D1CE4E5B9L
            v = v ^ (v >>> 27)
            s += x.getFloat(i).toDouble * (if ((v & 1L) == 1L) 1.0 else -1.0)
            i += 1
          }
          proj(p) = s
          if (s > 0) bucket |= (1L << p)
          p += 1
        }
        if (subset) {
          // DP over the subset lattice, then a partial selection of the
          // `probes` smallest (score, mask) — probes is usually ≪ 2^planes
          var m = 1
          score(0) = 0.0
          while (m < nMasks) {
            score(m) = score(m & (m - 1)) +
              math.abs(proj(java.lang.Integer.numberOfTrailingZeros(m)))
            m += 1
          }
          m = 0
          while (m < nMasks) { order(m) = m; m += 1 }
          var j = 0
          while (j < probes) {
            var best = j
            var q = j + 1
            while (q < nMasks) {
              val a = order(q); val b = order(best)
              if (score(a) < score(b) || (score(a) == score(b) && a < b))
                best = q
              q += 1
            }
            val tmp = order(j); order(j) = order(best); order(best) = tmp
            out(t * probes + j) = bucket ^ order(j).toLong
            j += 1
          }
        } else {
          // wide-planes fallback: single lowest-margin bit flips
          var p2 = 0
          while (p2 < planes) { order(p2) = p2; p2 += 1 }
          var j = 0
          while (j < probes - 1) {
            var m = j
            var q = j + 1
            while (q < planes) {
              if (math.abs(proj(order(q))) < math.abs(proj(order(m)))) m = q
              q += 1
            }
            val tmp = order(j); order(j) = order(m); order(m) = tmp
            j += 1
          }
          out(t * probes) = bucket
          j = 1
          while (j < probes) {
            out(t * probes + j) = bucket ^ (1L << order(j - 1))
            j += 1
          }
        }
        t += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
}
