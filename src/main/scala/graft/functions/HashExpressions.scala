package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd signature kernels for near-dup detection. Both consume an
  * `array<long>` of element hashes (produced by the codegen'd built-in
  * `xxhash64` over tokens/shingles) and run a tight primitive loop —
  * the interpreted higher-order formulation costs one boxed lambda call
  * per (element × bit/permutation), which dominated the bench.
  */
object HashExpressions {

  /** splitmix64 — used to derive per-permutation universal-hash params. */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** 64-bit SimHash over element hashes: bit b of the output = sign of
    * Σ_elements (±1 by bit b of the element hash). */
  case class SimHash64(child: Expression)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got $other")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      val n = xs.numElements()
      var i = 0
      while (i < n) {
        val h = xs.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val n = ctx.freshName("n")
        val h = ctx.freshName("h")
        val counts = ctx.freshName("counts")
        val sig = ctx.freshName("sig")
        s"""
           |final int $n = $a.numElements();
           |final int[] $counts = new int[64];
           |for (int $i = 0; $i < $n; $i++) {
           |  final long $h = $a.getLong($i);
           |  for (int $b = 0; $b < 64; $b++) {
           |    $counts[$b] += (($h >>> $b) & 1L) == 1L ? 1 : -1;
           |  }
           |}
           |long $sig = 0L;
           |for (int $b = 0; $b < 64; $b++) {
           |  if ($counts[$b] > 0) $sig |= (1L << $b);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression)
        : SimHash64 = copy(child = newChild)
  }

  /** k-permutation MinHash signature over element hashes. Permutation p is
    * the universal hash h ↦ a_p·h + b_p (a_p odd, both splitmix64-derived
    * from p — deterministic, engine-independent). Output array<long>[k];
    * empty input ⇒ Long.MaxValue sentinels. */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got $other")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    private lazy val (paramsA, paramsB): (Array[Long], Array[Long]) = {
      val a = Array.tabulate(k)(p => splitmix64(2L * p) | 1L)
      val b = Array.tabulate(k)(p => splitmix64(2L * p + 1L))
      (a, b)
    }

    override def nullSafeEval(x: Any): Any = {
      val xs = x.asInstanceOf[ArrayData]
      val n = xs.numElements()
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = xs.getLong(i)
        var p = 0
        while (p < k) {
          val v = paramsA(p) * h + paramsB(p)
          if (v < mins(p)) mins(p) = v
          p += 1
        }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(mins)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("minhashA", paramsA, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", paramsB, "long[]")
      nullSafeCodeGen(ctx, ev, x => {
        val i = ctx.freshName("i")
        val p = ctx.freshName("p")
        val n = ctx.freshName("n")
        val h = ctx.freshName("h")
        val v = ctx.freshName("v")
        val mins = ctx.freshName("mins")
        s"""
           |final int $n = $x.numElements();
           |final long[] $mins = new long[$k];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |for (int $i = 0; $i < $n; $i++) {
           |  final long $h = $x.getLong($i);
           |  for (int $p = 0; $p < $k; $p++) {
           |    final long $v = $aRef[$p] * $h + $bRef[$p];
           |    if ($v < $mins[$p]) $mins[$p] = $v;
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions
           |  .UnsafeArrayData.fromPrimitiveArray($mins);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression)
        : MinHashSig = copy(child = newChild)
  }

  /** Distinct word-n-gram hashes of a token array, SORTED ascending —
    * the set representation every dedup kernel downstream consumes
    * (sorted ⇒ [[JaccardSorted]] is a linear merge-walk). Gram hash =
    * polynomial combination of per-token xxhash64s; shorter inputs
    * collapse to one whole-text gram (mirrors DedupOps.shingles). */
  case class NGramHashes(child: Expression, n: Int)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(org.apache.spark.sql.types.StringType, _) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got $other")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "ngram_hashes"

    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val m = xs.numElements()
      val tokHash = new Array[Long](m)
      var i = 0
      while (i < m) {
        val s = xs.getUTF8String(i)
        tokHash(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        i += 1
      }
      val cnt = if (m < n) 1 else m - n + 1
      val grams = new Array[Long](cnt)
      i = 0
      while (i < cnt) {
        var g = 0L
        var j = 0
        val w = math.min(n, m)
        while (j < w) {
          g = g * 0x100000001B3L + tokHash(i + j)
          j += 1
        }
        grams(i) = g
        i += 1
      }
      java.util.Arrays.sort(grams)
      var uniq = 0
      i = 0
      while (i < cnt) {
        if (i == 0 || grams(i) != grams(i - 1)) { grams(uniq) = grams(i); uniq += 1 }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(grams, uniq))
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val m = ctx.freshName("m"); val w = ctx.freshName("w")
        val g = ctx.freshName("g"); val s = ctx.freshName("s")
        val cnt = ctx.freshName("cnt"); val uniq = ctx.freshName("uniq")
        val tokHash = ctx.freshName("tokHash")
        val grams = ctx.freshName("grams")
        s"""
           |final int $m = $a.numElements();
           |final long[] $tokHash = new long[$m];
           |for (int $i = 0; $i < $m; $i++) {
           |  final org.apache.spark.unsafe.types.UTF8String $s =
           |    $a.getUTF8String($i);
           |  $tokHash[$i] = org.apache.spark.sql.catalyst.expressions.XXH64
           |    .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
           |      $s.numBytes(), 42L);
           |}
           |final int $cnt = ($m < $n) ? 1 : ($m - $n + 1);
           |final long[] $grams = new long[$cnt];
           |final int $w = java.lang.Math.min($n, $m);
           |for (int $i = 0; $i < $cnt; $i++) {
           |  long $g = 0L;
           |  for (int $j = 0; $j < $w; $j++) {
           |    $g = $g * 0x100000001B3L + $tokHash[$i + $j];
           |  }
           |  $grams[$i] = $g;
           |}
           |java.util.Arrays.sort($grams);
           |int $uniq = 0;
           |for (int $i = 0; $i < $cnt; $i++) {
           |  if ($i == 0 || $grams[$i] != $grams[$i - 1]) {
           |    $grams[$uniq++] = $grams[$i];
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions
           |  .UnsafeArrayData.fromPrimitiveArray(
           |    java.util.Arrays.copyOf($grams, $uniq));
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression)
        : NGramHashes = copy(child = newChild)
  }

  /** Jaccard similarity of two SORTED distinct long arrays — one merge
    * walk, no allocation. */
  case class JaccardSorted(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<bigint>), got $other")
      }
    override def dataType: DataType =
      org.apache.spark.sql.types.DoubleType
    override def prettyName: String = "jaccard_sorted"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements(); val ny = y.numElements()
      var i = 0; var j = 0; var inter = 0
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { inter += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      val union = nx + ny - inter
      if (union == 0) 1.0 else inter.toDouble / union.toDouble
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
        s"""
           |final int $nx = $a.numElements();
           |final int $ny = $b.numElements();
           |int $i = 0; int $j = 0; int $inter = 0;
           |while ($i < $nx && $j < $ny) {
           |  final long $xv = $a.getLong($i);
           |  final long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $inter++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |final int $union = $nx + $ny - $inter;
           |${ev.value} = ($union == 0)
           |  ? 1.0 : ((double) $inter) / ((double) $union);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaccardSorted =
      copy(left = newLeft, right = newRight)
  }

  /** Intersection size of two SORTED distinct long arrays — the same
    * merge walk as [[JaccardSorted]] but returning the raw count, for
    * queries that must emit |A∩B| itself (e.g. the n-gram similarity
    * join's n_common column). */
  case class IntersectCountSorted(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<bigint>), got $other")
      }
    override def dataType: DataType =
      org.apache.spark.sql.types.IntegerType
    override def prettyName: String = "intersect_count_sorted"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements(); val ny = y.numElements()
      var i = 0; var j = 0; var inter = 0
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { inter += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      inter
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        val inter = ctx.freshName("inter")
        s"""
           |final int $nx = $a.numElements();
           |final int $ny = $b.numElements();
           |int $i = 0; int $j = 0; int $inter = 0;
           |while ($i < $nx && $j < $ny) {
           |  final long $xv = $a.getLong($i);
           |  final long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $inter++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |${ev.value} = $inter;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): IntersectCountSorted =
      copy(left = newLeft, right = newRight)
  }

  /** Distinct word n-grams of a token array as space-joined strings —
    * bit-identical output to
    * `array_distinct(transform(seq, i -> array_join(slice(toks,i,n),' ')))`
    * (the DuckDB-oracle-matched formulation) but one codegen'd pass:
    * the interpreted higher-order form cost ~5 ms/doc and is evaluated
    * once per join side. First-occurrence order, like array_distinct. */
  case class WordNGrams(child: Expression, n: Int)
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(org.apache.spark.sql.types.StringType, _) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got $other")
      }
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
    override def prettyName: String = "word_ngrams"

    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val m = xs.numElements()
      val toks = new Array[org.apache.spark.unsafe.types.UTF8String](m)
      var i = 0
      while (i < m) { toks(i) = xs.getUTF8String(i); i += 1 }
      val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      val cnt = if (m < n) 1 else m - n + 1
      val w = math.min(n, m)
      val seen =
        new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
      i = 0
      while (i < cnt) {
        val parts = java.util.Arrays.copyOfRange(toks, i, i + w)
        seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        seen.toArray.asInstanceOf[Array[Any]])
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val m = ctx.freshName("m")
        val w = ctx.freshName("w"); val cnt = ctx.freshName("cnt")
        val j = ctx.freshName("j")
        val toks = ctx.freshName("toks"); val seen = ctx.freshName("seen")
        val parts = ctx.freshName("parts"); val sep = ctx.freshName("sep")
        // NOTE no java.util.Arrays.copyOfRange here: its T[] overload is a
        // generic method, and Janino erases generic returns to Object[],
        // which fails to compile against UTF8String[] (silent interpreted
        // fallback at runtime). Slice with an explicit loop instead.
        s"""
           |final int $m = $a.numElements();
           |final org.apache.spark.unsafe.types.UTF8String[] $toks =
           |  new org.apache.spark.unsafe.types.UTF8String[$m];
           |for (int $i = 0; $i < $m; $i++) {
           |  $toks[$i] = $a.getUTF8String($i);
           |}
           |final org.apache.spark.unsafe.types.UTF8String $sep =
           |  org.apache.spark.unsafe.types.UTF8String.fromString(" ");
           |final int $cnt = ($m < $n) ? 1 : ($m - $n + 1);
           |final int $w = java.lang.Math.min($n, $m);
           |final java.util.LinkedHashSet<org.apache.spark.unsafe.types.UTF8String>
           |  $seen = new java.util.LinkedHashSet<
           |    org.apache.spark.unsafe.types.UTF8String>();
           |final org.apache.spark.unsafe.types.UTF8String[] $parts =
           |  new org.apache.spark.unsafe.types.UTF8String[$w];
           |for (int $i = 0; $i < $cnt; $i++) {
           |  for (int $j = 0; $j < $w; $j++) {
           |    $parts[$j] = $toks[$i + $j];
           |  }
           |  $seen.add(org.apache.spark.unsafe.types.UTF8String
           |    .concatWs($sep, $parts));
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util
           |  .GenericArrayData($seen.toArray());
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression)
        : WordNGrams = copy(child = newChild)
  }

  /** Count of array elements contained in a compile-time string set —
    * replaces interpreted `size(filter(toks, t -> array_contains(set, t)))`
    * (O(|toks|·|set|) boxed string compares) with one hashed lookup per
    * token inside codegen. */
  case class InSetCount(child: Expression, set: Seq[String])
      extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(org.apache.spark.sql.types.StringType, _) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got $other")
      }
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def prettyName: String = "in_set_count"

    private lazy val lookup: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
      val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
      set.foreach(w =>
        s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
      s
    }

    override def nullSafeEval(a: Any): Any = {
      val xs = a.asInstanceOf[ArrayData]
      val m = xs.numElements()
      var c = 0
      var i = 0
      while (i < m) {
        if (!xs.isNullAt(i) && lookup.contains(xs.getUTF8String(i))) c += 1
        i += 1
      }
      c
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val setRef = ctx.addReferenceObj("inSet", lookup,
        "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val m = ctx.freshName("m")
        val c = ctx.freshName("c")
        s"""
           |final int $m = $a.numElements();
           |int $c = 0;
           |for (int $i = 0; $i < $m; $i++) {
           |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) {
           |    $c++;
           |  }
           |}
           |${ev.value} = $c;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression)
        : InSetCount = copy(child = newChild)
  }

  def inSetCount(tokens: Column, set: Seq[String]): Column =
    column(InSetCount(expression(tokens), set))

  def wordNGrams(tokens: Column, n: Int): Column =
    column(WordNGrams(expression(tokens), n))

  /** PORTABLE 64-bit string hash: the lower 16 digest bytes of MD5 read
    * little-endian — bit-identical to DuckDB's `md5_number_lower`, which
    * is what makes hash-seeded operators (SimHash signatures, CMS bucket
    * maps) reproducible OUTSIDE this engine and therefore full-oracle
    * verifiable. Slower than `xxhash64` (a cryptographic digest per
    * value), so it is the ORACLE hash family; production paths default
    * to xxhash64 and switch only when cross-engine reproducibility is
    * worth the cycles.
    */
  case class Md5Lower64(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "md5_lower64"

    override def nullSafeEval(s: Any): Any =
      HashKernels.md5Lower64(s.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.HashKernels.md5Lower64($s);")

    override protected def withNewChildInternal(newChild: Expression)
        : Md5Lower64 = copy(child = newChild)
  }

  /** [[Md5Lower64]] as a Column — drop-in for `xxhash64(col)` where the
    * hash must be reproducible in the DuckDB oracle. */
  def md5lo(s: Column): Column = column(Md5Lower64(expression(s)))

  /** Upper MD5 digest half (bytes 0..7 little-endian) — DuckDB's
    * `md5_number_upper`. Paired with [[Md5Lower64]] it gives two
    * independent portable 64-bit hashes per key (the Kirsch–Mitzenmacher
    * double-hashing inputs for the portable CMS). */
  case class Md5Upper64(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got $other")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "md5_upper64"

    override def nullSafeEval(s: Any): Any =
      HashKernels.md5Upper64(s.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.HashKernels.md5Upper64($s);")

    override protected def withNewChildInternal(newChild: Expression)
        : Md5Upper64 = copy(child = newChild)
  }

  /** [[Md5Upper64]] as a Column. */
  def md5hi(s: Column): Column = column(Md5Upper64(expression(s)))

  def simhash64(hashes: Column): Column = column(SimHash64(expression(hashes)))

  def minhashSig(hashes: Column, k: Int): Column =
    column(MinHashSig(expression(hashes), k))

  def ngramHashes(tokens: Column, n: Int): Column =
    column(NGramHashes(expression(tokens), n))

  def jaccardSorted(a: Column, b: Column): Column =
    column(JaccardSorted(expression(a), expression(b)))

  def intersectCountSorted(a: Column, b: Column): Column =
    column(IntersectCountSorted(expression(a), expression(b)))
}

/** Static hash kernels shared by interpreted eval and generated code. */
object HashKernels {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lower 8 MD5 digest bytes (indices 8..15) little-endian, matching
    * DuckDB `md5_number_lower` bit-for-bit. */
  def md5Lower64(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    ((digest(15) & 0xffL) << 56) | ((digest(14) & 0xffL) << 48) |
      ((digest(13) & 0xffL) << 40) | ((digest(12) & 0xffL) << 32) |
      ((digest(11) & 0xffL) << 24) | ((digest(10) & 0xffL) << 16) |
      ((digest(9) & 0xffL) << 8) | (digest(8) & 0xffL)
  }

  /** Upper 8 MD5 digest bytes (indices 0..7) little-endian, matching
    * DuckDB `md5_number_upper` bit-for-bit. */
  def md5Upper64(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    ((digest(7) & 0xffL) << 56) | ((digest(6) & 0xffL) << 48) |
      ((digest(5) & 0xffL) << 40) | ((digest(4) & 0xffL) << 32) |
      ((digest(3) & 0xffL) << 24) | ((digest(2) & 0xffL) << 16) |
      ((digest(1) & 0xffL) << 8) | (digest(0) & 0xffL)
  }
}
