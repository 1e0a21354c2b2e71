package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression, ExpectsInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}

/** Native (whole-stage-codegen) Catalyst expressions for the near-dup hot
  * path. The HOF forms (`transform`/`zip_with` lambdas) execute their
  * lambda INTERPRETED per array element (measured: the dominant cost of
  * the minhash/ngram pipelines); these expressions fuse the same math
  * into one generated Java loop, bit-identical to the HOF results:
  *
  *  - `xxhash64(x)`            = XXH64.hashUTF8String(x, 42)
  *  - `xxhash64(x, y)`         = hashLong(y, hashLong(x, 42))  (chained)
  *  - `xxhash64(null, y)`      = hashLong(y, 42)               (null skipped)
  *
  * Fusing also removes algebraic redundancy the expression tree cannot
  * see: the k seeded rehashes share one `hashLong(h, 42)` per element
  * (the HOF form recomputes it k times).
  *
  * The md5-family twins (DuckDB-checkable) stay on the generic column
  * forms — these expressions only accelerate the xxhash64 production
  * paths, whose equality with the HOF construction is pinned by tests.
  */
object NativeHashExpressions {
  private[functions] val XXH = classOf[XXH64].getName
}

/** MinHash signature over pre-hashed shingles: for i in 0..k-1,
  * sig(i) = min over elements h of xxhash64(h, i) — one fused loop,
  * base-hash `hashLong(h, 42)` computed once per element.
  * Input array<long> (null elements hash like the HOF: skipped → seed),
  * output array<long> of length k (never null elements).
  */
case class XxMinhashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0, s"signature size must be positive, got $k")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "xx_minhash_signature"
  override protected def withNewChildInternal(newChild: Expression): XxMinhashSignature =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = Array.fill(k)(Long.MaxValue)
    val m = arr.numElements()
    var j = 0
    while (j < m) {
      val b = if (arr.isNullAt(j)) 42L else XXH64.hashLong(arr.getLong(j), 42L)
      var i = 0
      while (i < k) {
        // the HOF form is xxhash64(h, lit(i)) with an INT literal — the
        // expression hashes ints via hashInt, not hashLong
        val h = XXH64.hashInt(i, b)
        if (h < acc(i)) acc(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = NativeHashExpressions.XXH
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      s"""
         |long[] $acc = new long[$k];
         |java.util.Arrays.fill($acc, Long.MAX_VALUE);
         |final int $m = $c.numElements();
         |for (int $j = 0; $j < $m; $j++) {
         |  final long $b = $c.isNullAt($j) ? 42L : $xxh.hashLong($c.getLong($j), 42L);
         |  for (int $i = 0; $i < $k; $i++) {
         |    final long $h = $xxh.hashInt($i, $b);  // int literal seed, like xxhash64(h, lit(i))
         |    if ($h < $acc[$i]) $acc[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
         |""".stripMargin
    })
}

/** n-gram shingle hashes straight from the token array: th(j) =
  * xxhash64(tok(j)); shingle(p) = left fold of th(p..p+n-1) with
  * xxhash64(x, y). Output length max(|toks| - n + 1, 0); n = 1 gives the
  * plain per-token hash array. Null tokens hash to the seed (42), exactly
  * like `xxhash64(null)`.
  */
/** Character n-gram shingle hashes STRAIGHT OFF THE STRING — the
  * edit-distance tier's candidate hasher. Bit-identical to
  * `XxShingleHashes(charTokens(text), n)` (each character position
  * hashed as its own UTF8 byte run, then the same n-fold), but in one
  * pass over the string's bytes: no per-char string array, no
  * interpreted `transform` lambda, no substr allocations — measured the
  * dominant cost of the char pipeline (a 3 KB doc is ~3k single-char
  * strings through the HOF form). Walks UTF-8 char boundaries via
  * `numBytesForFirstByte`, so multi-byte characters hash exactly like
  * their substring would.
  */
case class XxCharShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, s"shingle size must be positive, got $n")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "xx_char_shingle_hashes"
  override protected def withNewChildInternal(newChild: Expression): XxCharShingleHashes =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    val m = s.numChars()
    val th = new Array[Long](m)
    var i = 0; var j = 0
    while (i < nb) {
      var len = org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))
      if (len > nb - i) len = nb - i // malformed-tail clamp (substring parity)
      th(j) = XXH64.hashUnsafeBytes(base, off + i, len, 42L)
      i += len; j += 1
    }
    val out = new Array[Long](math.max(m - n + 1, 0))
    var p = 0
    while (p < out.length) {
      var acc = th(p)
      var q = 1
      while (q < n) {
        acc = XXH64.hashLong(th(p + q), XXH64.hashLong(acc, 42L))
        q += 1
      }
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = NativeHashExpressions.XXH
      val u8 = "org.apache.spark.unsafe.types.UTF8String"
      val plat = "org.apache.spark.unsafe.Platform"
      val base = ctx.freshName("base"); val off = ctx.freshName("off")
      val nb = ctx.freshName("nb"); val m = ctx.freshName("m")
      val th = ctx.freshName("th"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val len = ctx.freshName("len"); val p = ctx.freshName("p")
      val q = ctx.freshName("q"); val acc = ctx.freshName("acc")
      s"""
         |final Object $base = $c.getBaseObject();
         |final long $off = $c.getBaseOffset();
         |final int $nb = $c.numBytes();
         |final int $m = $c.numChars();
         |final long[] $th = new long[$m];
         |int $i = 0; int $j = 0;
         |while ($i < $nb) {
         |  int $len = $u8.numBytesForFirstByte($plat.getByte($base, $off + $i));
         |  if ($len > $nb - $i) $len = $nb - $i;
         |  $th[$j] = $xxh.hashUnsafeBytes($base, $off + $i, $len, 42L);
         |  $i += $len; $j += 1;
         |}
         |final long[] $out = new long[java.lang.Math.max($m - $n + 1, 0)];
         |for (int $p = 0; $p < $out.length; $p++) {
         |  long $acc = $th[$p];
         |  for (int $q = 1; $q < $n; $q++) {
         |    $acc = $xxh.hashLong($th[$p + $q], $xxh.hashLong($acc, 42L));
         |  }
         |  $out[$p] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })
}

case class XxShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, s"shingle size must be positive, got $n")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "xx_shingle_hashes"
  override protected def withNewChildInternal(newChild: Expression): XxShingleHashes =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val th = new Array[Long](m)
    var j = 0
    while (j < m) {
      th(j) = if (arr.isNullAt(j)) 42L else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      j += 1
    }
    val out = new Array[Long](math.max(m - n + 1, 0))
    var p = 0
    while (p < out.length) {
      var acc = th(p)
      var q = 1
      while (q < n) {
        acc = XXH64.hashLong(th(p + q), XXH64.hashLong(acc, 42L))
        q += 1
      }
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = NativeHashExpressions.XXH
      val m = ctx.freshName("m")
      val th = ctx.freshName("th")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      val acc = ctx.freshName("acc")
      s"""
         |final int $m = $c.numElements();
         |final long[] $th = new long[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  $th[$j] = $c.isNullAt($j) ? 42L : $xxh.hashUTF8String($c.getUTF8String($j), 42L);
         |}
         |final long[] $out = new long[java.lang.Math.max($m - $n + 1, 0)];
         |for (int $p = 0; $p < $out.length; $p++) {
         |  long $acc = $th[$p];
         |  for (int $q = 1; $q < $n; $q++) {
         |    $acc = $xxh.hashLong($th[$p + $q], $xxh.hashLong($acc, 42L));
         |  }
         |  $out[$p] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })
}

/** Fused SimHash over a token array: h(tok) = xxhash64(tok) (null token →
  * seed 42, like XxShingleHashes n=1); bit b of the result is set iff the
  * count of tokens with bit b set is a strict majority (count·2 > n) —
  * identical to the explode + 64-sum DataFrame construction and the ±1
  * bitsum HOF form, in ONE generated loop with no explode/shuffle.
  * Empty array → 0L (callers filter empty token sets to match the
  * explode form's absent-row behavior).
  */
case class XxSimhash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "xx_simhash"
  override protected def withNewChildInternal(newChild: Expression): XxSimhash =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < m) {
      val h = if (arr.isNullAt(j)) 42L else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var b = 0
      while (b < 64) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > m) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = NativeHashExpressions.XXH
      val m = ctx.freshName("m")
      val counts = ctx.freshName("counts")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |final int $m = $c.numElements();
         |final int[] $counts = new int[64];
         |for (int $j = 0; $j < $m; $j++) {
         |  final long $h = $c.isNullAt($j) ? 42L : $xxh.hashUTF8String($c.getUTF8String($j), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] * 2 > $m) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
         |""".stripMargin
    })
}

/** Fused hyperplane sign codes for ALL LSH bands in one generated loop:
  * out(g) = Σ_i [v · plane(g·ppg+i) >= 0] << i  for i in 0..ppg-1.
  * Replaces the HOF construction (per-plane `aggregate(zip_with(...))`
  * + when/shiftleft reduce), which walks the vector groups·ppg times
  * with interpreted lambdas. Bit-exact parity with the HOF form (pinned
  * by tests): dots accumulate left-to-right in double, `>= 0` sign, bit
  * index local to the group; a null element nulls every dot, so every
  * code collapses to 0 (when(null).otherwise(0)); an input of the wrong
  * length returns null (callers guard with requireDim first, which
  * raises before this is reached).
  */
case class VecBandCodes(child: Expression, planes: Seq[Seq[Double]], planesPerGroup: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(planesPerGroup > 0 && planesPerGroup <= 62,
    s"planesPerGroup must be in 1..62, got $planesPerGroup")
  require(planes.nonEmpty && planes.length % planesPerGroup == 0,
    s"${planes.length} planes do not divide into groups of $planesPerGroup")
  require(planes.forall(_.length == planes.head.length), "ragged plane matrix")
  private val groups = planes.length / planesPerGroup
  private val dim = planes.head.length
  @transient private lazy val flat: Array[Double] = planes.flatten.toArray
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_band_codes"
  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): VecBandCodes =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val out = new Array[Long](groups)
    var j = 0
    while (j < dim) { // null element → all-zero codes, like the HOF form
      if (v.isNullAt(j)) return new GenericArrayData(out)
      j += 1
    }
    val vv = new Array[Double](dim)
    j = 0
    while (j < dim) { vv(j) = v.getDouble(j); j += 1 }
    var g = 0
    while (g < groups) {
      var code = 0L
      var i = 0
      while (i < planesPerGroup) {
        val base = (g * planesPerGroup + i) * dim
        var dot = 0.0
        var p = 0
        while (p < dim) { dot += vv(p) * flat(base + p); p += 1 }
        if (dot >= 0.0) code += (1L << i)
        i += 1
      }
      out(g) = code
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val pl = ctx.addReferenceObj("planesFlat", flat, "double[]")
      val out = ctx.freshName("out")
      val vv = ctx.freshName("vv")
      val hasNull = ctx.freshName("hasNull")
      val g = ctx.freshName("g")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val code = ctx.freshName("code")
      val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      s"""
         |if ($c.numElements() != $dim) { ${ev.isNull} = true; } else {
         |  final long[] $out = new long[$groups];
         |  boolean $hasNull = false;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($c.isNullAt($j)) { $hasNull = true; break; }
         |  }
         |  if (!$hasNull) {
         |    final double[] $vv = new double[$dim];
         |    for (int $j = 0; $j < $dim; $j++) $vv[$j] = $c.getDouble($j);
         |    for (int $g = 0; $g < $groups; $g++) {
         |      long $code = 0L;
         |      for (int $i = 0; $i < $planesPerGroup; $i++) {
         |        final int $base = ($g * $planesPerGroup + $i) * $dim;
         |        double $dot = 0.0;
         |        for (int $p = 0; $p < $dim; $p++) $dot += $vv[$p] * $pl[$base + $p];
         |        if ($dot >= 0.0) $code += (1L << $i);
         |      }
         |      $out[$g] = $code;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
         |""".stripMargin
    })
}

/** Fused cosine similarity over two double arrays: dot product and both
  * norms in ONE generated loop (the HOF form walks each array three
  * times with interpreted lambdas, and recomputes the corpus-side norm
  * for every query pair). Double accumulation matches the DuckDB oracle
  * (CAST AS DOUBLE products) exactly. Null inputs or null elements →
  * null; zero-norm side → 0.0; length mismatch → null.
  */
case class VecCosine(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val m = a.numElements()
    if (m != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < m) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val hasNull = ctx.freshName("hasNull") // raw name would collide across two VecCosines in one codegen scope
      s"""
         |final int $m = $a.numElements();
         |if ($m != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  boolean $hasNull = false;
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $hasNull = true; break; }
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($hasNull) { ${ev.isNull} = true; }
         |  else if ($na == 0.0 || $nb == 0.0) { ${ev.value} = 0.0; }
         |  else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |}
         |""".stripMargin
    })
}

/** Fused min-hash over character n-grams of a string: min over all
  * char positions i of xxhash64 of the `gramChars`-character substring
  * starting at i (windows = max(numChars - gramChars + 1, 1); a
  * shorter-than-gram string hashes once whole) — the winnowing-lite
  * fingerprint (`TextAnalysis.fingerprint`) in ONE generated pass over
  * the UTF8 bytes. Identical values to the HOF form
  * `array_min(transform(sequence(...), i => xxhash64(substr(s, i, n))))`:
  * `substr` slices by character, so the loop first walks the byte
  * boundaries of each code point (one pass, `numBytesForFirstByte`) and
  * then hashes byte ranges in place — no per-window UTF8String
  * allocation, no hash-array materialization (the HOF form allocates
  * both per position; measured the dominant cost of `doc_fingerprint`).
  */
case class XxMinCharGramHash(child: Expression, gramChars: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(gramChars > 0, s"gram width must be positive, got $gramChars")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "xx_min_char_gram_hash"
  override protected def withNewChildInternal(newChild: Expression): XxMinCharGramHash =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val n = s.numChars()
    val nb = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val bnd = new Array[Int](n + 1)
    var bi = 0
    var cnt = 0
    while (bi < nb) {
      bnd(cnt) = bi
      cnt += 1
      bi += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + bi))
    }
    bnd(n) = nb
    val wins = math.max(n - (gramChars - 1), 1)
    var minH = Long.MaxValue
    var i = 0
    while (i < wins) {
      val endChar = math.min(i + gramChars, n)
      val h = XXH64.hashUnsafeBytes(base, off + bnd(i), bnd(endChar) - bnd(i), 42L)
      if (h < minH) minH = h
      i += 1
    }
    minH
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = NativeHashExpressions.XXH
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val platform = "org.apache.spark.unsafe.Platform"
      val n = ctx.freshName("n")
      val nb = ctx.freshName("nb")
      val base = ctx.freshName("base")
      val off = ctx.freshName("off")
      val bnd = ctx.freshName("bnd")
      val bi = ctx.freshName("bi")
      val cnt = ctx.freshName("cnt")
      val wins = ctx.freshName("wins")
      val minH = ctx.freshName("minH")
      val i = ctx.freshName("i")
      val ec = ctx.freshName("ec")
      val h = ctx.freshName("h")
      s"""
         |final int $n = $c.numChars();
         |final int $nb = $c.numBytes();
         |final Object $base = $c.getBaseObject();
         |final long $off = $c.getBaseOffset();
         |final int[] $bnd = new int[$n + 1];
         |int $bi = 0; int $cnt = 0;
         |while ($bi < $nb) {
         |  $bnd[$cnt++] = $bi;
         |  $bi += $utf8.numBytesForFirstByte($platform.getByte($base, $off + $bi));
         |}
         |$bnd[$n] = $nb;
         |int $wins = $n - ${gramChars - 1}; if ($wins < 1) $wins = 1;
         |long $minH = Long.MAX_VALUE;
         |for (int $i = 0; $i < $wins; $i++) {
         |  int $ec = $i + $gramChars; if ($ec > $n) $ec = $n;
         |  final long $h = $xxh.hashUnsafeBytes($base, $off + $bnd[$i], $bnd[$ec] - $bnd[$i], 42L);
         |  if ($h < $minH) $minH = $h;
         |}
         |${ev.value} = $minH;
         |""".stripMargin
    })
}

/** Shared primitive kernels callable from BOTH interpreted eval and
  * generated code (the standard static-helper pattern for logic that
  * doesn't inline well as a codegen template, e.g. a sort).
  */
object GraftExprHelpers {
  /** Max multiplicity of any element of a string array: sort + one
    * run-length pass, nulls counted as their own group. Empty → 0.
    */
  /** Cut spans out of a token array: normalize the (possibly overlapping,
    * possibly out-of-range) span list to disjoint in-range intervals
    * (sort by start, clamp to [0, |toks|-1], merge overlapping/adjacent),
    * then one two-pointer walk over the tokens — O(tokens + spans log
    * spans) per doc, vs the HOF form's O(tokens × spans) per-token
    * `exists`. Returns (tokensRemoved, cleanText): the count is the
    * number of token positions actually removed, so overlapping
    * caller-supplied spans no longer double-count. Null tokens pass
    * through the keep-filter and are skipped by concatWs, matching
    * `concat_ws(" ", filter(...))`.
    */
  def cutSpans(toks: ArrayData, starts: ArrayData, ends: ArrayData): InternalRow = {
    val n = toks.numElements()
    val m = math.min(starts.numElements(), ends.numElements())
    // clamp + drop empty/inverted/out-of-range; keep (start, idx)-encoded
    // sort keys so one primitive long sort orders the pairs
    val keys = new Array[Long](m)
    val endArr = new Array[Long](m)
    var cnt = 0
    var i = 0
    while (i < m) {
      if (!starts.isNullAt(i) && !ends.isNullAt(i)) {
        var s = starts.getLong(i)
        var e = ends.getLong(i)
        if (s < 0) s = 0
        if (e > n - 1) e = n - 1
        if (s <= e) {
          keys(cnt) = (s << 32) | cnt.toLong
          endArr(cnt) = e
          cnt += 1
        }
      }
      i += 1
    }
    java.util.Arrays.sort(keys, 0, cnt)
    // merge overlapping/adjacent into disjoint sorted spans in-place
    val ms = new Array[Long](cnt)
    val me = new Array[Long](cnt)
    var nm = 0
    i = 0
    while (i < cnt) {
      val s = keys(i) >>> 32
      val e = endArr((keys(i) & 0xffffffffL).toInt)
      if (nm > 0 && s <= me(nm - 1) + 1) {
        if (e > me(nm - 1)) me(nm - 1) = e
      } else {
        ms(nm) = s; me(nm) = e; nm += 1
      }
      i += 1
    }
    var removed = 0L
    i = 0
    while (i < nm) { removed += me(i) - ms(i) + 1; i += 1 }
    val kept = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](n)
    var sp = 0
    var t = 0
    while (t < n) {
      while (sp < nm && me(sp) < t) sp += 1
      if (!(sp < nm && t >= ms(sp)))
        kept.add(if (toks.isNullAt(t)) null else toks.getUTF8String(t))
      t += 1
    }
    val clean = org.apache.spark.unsafe.types.UTF8String.concatWs(
      org.apache.spark.unsafe.types.UTF8String.fromString(" "),
      kept.toArray(new Array[org.apache.spark.unsafe.types.UTF8String](kept.size())): _*)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](removed, clean))
  }

  def maxRunLength(arr: ArrayData): Long = {
    val m = arr.numElements()
    if (m == 0) return 0L
    var nulls = 0L
    val a = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](m)
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) nulls += 1 else a.add(arr.getUTF8String(i))
      i += 1
    }
    java.util.Collections.sort(a)
    var best = nulls
    var run = 0L
    var prev: org.apache.spark.unsafe.types.UTF8String = null
    val it = a.iterator()
    while (it.hasNext) {
      val x = it.next()
      run = if (prev != null && x.equals(prev)) run + 1 else 1L
      if (run > best) best = run
      prev = x
    }
    best
  }
}

/** Max multiplicity of any element in a string array — the per-row form
  * of "top count per group" (`CorpusOps.repetitionColumns`'s most-common
  * word/bigram), as ONE compiled sort + run-length pass instead of the
  * `aggregate` HOF fold whose lambda executes interpreted per element.
  * Identical values to the fold (multiset max multiplicity; nulls form
  * their own group); empty array → 0; null array → null.
  */
case class MaxRunLength(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "max_run_length"
  override protected def withNewChildInternal(newChild: Expression): MaxRunLength =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    GraftExprHelpers.maxRunLength(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraftExprHelpers.maxRunLength($c);")
}

/** Span removal over a token array (`TextDedup.removeSpans`'s kernel):
  * given parallel start/end arrays (inclusive token positions, possibly
  * overlapping or out of range — they are merged and clamped first),
  * returns struct(n_dup_tokens, clean_text) where `n_dup_tokens` counts
  * the token positions actually removed and `clean_text` is the
  * space-joined survivors. One compiled two-pointer pass replaces the
  * HOF form's per-token `exists` over the span array, whose cost is
  * O(tokens × spans) per doc — quadratic on a pathological
  * fully-fragmented doc.
  */
case class CutSpans(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_dup_tokens", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))
  override def prettyName: String = "cut_spans"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CutSpans =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def nullSafeEval(toks: Any, starts: Any, ends: Any): Any =
    GraftExprHelpers.cutSpans(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], ends.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2, c3) =>
      s"${ev.value} = graft.functions.GraftExprHelpers.cutSpans($c1, $c2, $c3);")
}

/** Product-quantization encode: for each of `nSub` contiguous subspaces
  * of the input vector, the index of the nearest codebook centroid by
  * squared L2 distance (left-fold double accumulation; ties to the
  * SMALLEST code — matching the DuckDB mirror's
  * `ORDER BY d ASC, j`). One generated loop; the codebook is a literal
  * constant (anchor slices — see `Similarity.pqTopK`), laid out
  * flat as codebook(m * codesPerSub + j). Null input or null element →
  * null; wrong input length → null (callers guard with requireDim).
  * Output: array<int> of length nSub — the 100 TB index payload
  * (nSub small ints ≈ dim/8 bytes vs dim × 4 float bytes raw).
  */
case class PqEncode(child: Expression, codebook: Seq[Seq[Double]],
                    nSub: Int, codesPerSub: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nSub > 0 && codesPerSub > 1, s"bad PQ geometry $nSub x $codesPerSub")
  require(codebook.length == nSub * codesPerSub,
    s"codebook has ${codebook.length} entries, expected ${nSub * codesPerSub}")
  require(codebook.forall(_.length == codebook.head.length), "ragged codebook")
  private val subDim = codebook.head.length
  private val dim = nSub * subDim
  @transient private lazy val flat: Array[Double] = codebook.flatten.toArray
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val vv = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      vv(j) = v.getDouble(j); j += 1
    }
    val out = new Array[Int](nSub)
    var m = 0
    while (m < nSub) {
      var best = 0; var bestD = Double.PositiveInfinity
      var c = 0
      while (c < codesPerSub) {
        val base = (m * codesPerSub + c) * subDim
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val diff = vv(m * subDim + i) - flat(base + i)
          d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict <: ties keep smallest c
        c += 1
      }
      out(m) = best; m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebook", flat, "double[]")
      val vv = ctx.freshName("vv")
      val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      val j = ctx.freshName("j"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != $dim) { ${ev.isNull} = true; } else {
         |  final double[] $vv = new double[$dim];
         |  boolean $hasNull = false;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($v.isNullAt($j)) { $hasNull = true; break; }
         |    $vv[$j] = $v.getDouble($j);
         |  }
         |  if ($hasNull) { ${ev.isNull} = true; } else {
         |    final int[] $out = new int[$nSub];
         |    for (int $m = 0; $m < $nSub; $m++) {
         |      int $best = 0; double $bestD = Double.POSITIVE_INFINITY;
         |      for (int $c = 0; $c < $codesPerSub; $c++) {
         |        final int $base = ($m * $codesPerSub + $c) * $subDim;
         |        double $d = 0.0;
         |        for (int $i = 0; $i < $subDim; $i++) {
         |          final double $diff = $vv[$m * $subDim + $i] - $cb[$base + $i];
         |          $d += $diff * $diff;
         |        }
         |        if ($d < $bestD) { $bestD = $d; $best = $c; }
         |      }
         |      $out[$m] = $best;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
         |""".stripMargin
    })
}

/** Product-quantization lookup table for one query vector: raw dot
  * products of each query subspace slice against every codebook
  * centroid, flat layout lut(m * codesPerSub + j) — computed ONCE per
  * query, then every candidate scores with `nSub` array reads
  * (`PqScore`) instead of `dim` multiplies. Left-fold double dots,
  * mirroring the DuckDB mirror's list_reduce.
  */
case class PqLut(child: Expression, codebook: Seq[Seq[Double]],
                 nSub: Int, codesPerSub: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(codebook.length == nSub * codesPerSub,
    s"codebook has ${codebook.length} entries, expected ${nSub * codesPerSub}")
  require(codebook.forall(_.length == codebook.head.length), "ragged codebook")
  private val subDim = codebook.head.length
  private val dim = nSub * subDim
  @transient private lazy val flat: Array[Double] = codebook.flatten.toArray
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"
  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val vv = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      vv(j) = v.getDouble(j); j += 1
    }
    val out = new Array[Double](nSub * codesPerSub)
    var m = 0
    while (m < nSub) {
      var c = 0
      while (c < codesPerSub) {
        val base = (m * codesPerSub + c) * subDim
        var dot = 0.0
        var i = 0
        while (i < subDim) { dot += vv(m * subDim + i) * flat(base + i); i += 1 }
        out(m * codesPerSub + c) = dot; c += 1
      }
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqLutCodebook", flat, "double[]")
      val vv = ctx.freshName("vv")
      val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      val j = ctx.freshName("j"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val base = ctx.freshName("base")
      s"""
         |if ($v.numElements() != $dim) { ${ev.isNull} = true; } else {
         |  final double[] $vv = new double[$dim];
         |  boolean $hasNull = false;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    if ($v.isNullAt($j)) { $hasNull = true; break; }
         |    $vv[$j] = $v.getDouble($j);
         |  }
         |  if ($hasNull) { ${ev.isNull} = true; } else {
         |    final double[] $out = new double[${nSub * codesPerSub}];
         |    for (int $m = 0; $m < $nSub; $m++) {
         |      for (int $c = 0; $c < $codesPerSub; $c++) {
         |        final int $base = ($m * $codesPerSub + $c) * $subDim;
         |        double $dot = 0.0;
         |        for (int $i = 0; $i < $subDim; $i++)
         |          $dot += $vv[$m * $subDim + $i] * $cb[$base + $i];
         |        $out[$m * $codesPerSub + $c] = $dot;
         |      }
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
         |""".stripMargin
    })
}

/** Asymmetric-distance (ADC) score: given a candidate's PQ codes and a
  * query's `PqLut` table, the approximate query·candidate dot is
  * Σ_m lut(m·codesPerSub + codes(m)) and the candidate's reconstructed
  * norm² is Σ_m norm2(m·codesPerSub + codes(m)) (norm2 is the literal
  * per-centroid ‖c‖², computed once per codebook) — both left-fold, in
  * m order. Returns dot / sqrt(norm²) (0.0 on a zero reconstructed
  * norm); the caller divides by the query's own norm for cosine. Scoring
  * cost per candidate: nSub reads vs dim multiplies.
  */
case class PqScore(left: Expression, right: Expression,
                   norm2: Seq[Double], codesPerSub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with ExpectsInputTypes {
  require(codesPerSub > 1 && norm2.nonEmpty && norm2.length % codesPerSub == 0,
    s"norm2 length ${norm2.length} does not divide into codes of $codesPerSub")
  private val nSub = norm2.length / codesPerSub
  @transient private lazy val n2: Array[Double] = norm2.toArray
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_score"
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqScore =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    if (codes.numElements() != nSub || lut.numElements() != nSub * codesPerSub)
      return null
    var dot = 0.0; var cn2 = 0.0
    var m = 0
    while (m < nSub) {
      if (codes.isNullAt(m)) return null
      val c = codes.getInt(m)
      if (c < 0 || c >= codesPerSub) return null
      val idx = m * codesPerSub + c
      if (lut.isNullAt(idx)) return null
      dot += lut.getDouble(idx); cn2 += n2(idx)
      m += 1
    }
    if (cn2 == 0.0) 0.0 else dot / math.sqrt(cn2)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val nn = ctx.addReferenceObj("pqNorm2", n2, "double[]")
      val dot = ctx.freshName("dot"); val cn2 = ctx.freshName("cn2")
      val m = ctx.freshName("m"); val c = ctx.freshName("c")
      val idx = ctx.freshName("idx"); val bad = ctx.freshName("bad")
      s"""
         |if ($codes.numElements() != $nSub || $lut.numElements() != ${nSub * codesPerSub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $cn2 = 0.0;
         |  boolean $bad = false;
         |  for (int $m = 0; $m < $nSub; $m++) {
         |    if ($codes.isNullAt($m)) { $bad = true; break; }
         |    final int $c = $codes.getInt($m);
         |    if ($c < 0 || $c >= $codesPerSub) { $bad = true; break; }
         |    final int $idx = $m * $codesPerSub + $c;
         |    if ($lut.isNullAt($idx)) { $bad = true; break; }
         |    $dot += $lut.getDouble($idx); $cn2 += $nn[$idx];
         |  }
         |  if ($bad) { ${ev.isNull} = true; }
         |  else if ($cn2 == 0.0) { ${ev.value} = 0.0; }
         |  else { ${ev.value} = $dot / java.lang.Math.sqrt($cn2); }
         |}
         |""".stripMargin
    })
}

/** Raw ADC gather-sum: Σ_m lut(m·codesPerSub + codes(m)), left-fold in
  * m order — the building block `PqScore` fuses with its norm division,
  * exposed bare for RESIDUAL IVF-PQ scoring where the score is assembled
  * from three gathered sums that CANNOT share one fused division:
  * query·residual (lut = the query's `PqLut` against the residual
  * codebook), the candidate's cell-dependent norm correction (lut = the
  * probed cell's precomputed 2·centroidₘ·codebook[m][j] + ‖codebook[m][j]‖²
  * table, a per-cell literal column), and any other per-(m, code)
  * tabulated term. Null on geometry mismatch / out-of-range codes / null
  * elements, matching `PqScore`'s guards. The subspace count is derived
  * from the lut length at eval time (lut length % codesPerSub == 0,
  * codes length == lut length / codesPerSub), so one expression instance
  * serves any geometry.
  */
case class PqAdcSum(left: Expression, right: Expression, codesPerSub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with ExpectsInputTypes {
  require(codesPerSub > 1, s"codesPerSub must be > 1, got $codesPerSub")
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_sum"
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcSum =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val lutLen = lut.numElements()
    if (lutLen == 0 || lutLen % codesPerSub != 0) return null
    val nSub = lutLen / codesPerSub
    if (codes.numElements() != nSub) return null
    var acc = 0.0
    var m = 0
    while (m < nSub) {
      if (codes.isNullAt(m)) return null
      val c = codes.getInt(m)
      if (c < 0 || c >= codesPerSub) return null
      val idx = m * codesPerSub + c
      if (lut.isNullAt(idx)) return null
      acc += lut.getDouble(idx)
      m += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val lutLen = ctx.freshName("lutLen"); val nSub = ctx.freshName("nSub")
      val acc = ctx.freshName("acc"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val idx = ctx.freshName("idx")
      val bad = ctx.freshName("bad")
      s"""
         |final int $lutLen = $lut.numElements();
         |if ($lutLen == 0 || $lutLen % $codesPerSub != 0) { ${ev.isNull} = true; }
         |else {
         |  final int $nSub = $lutLen / $codesPerSub;
         |  if ($codes.numElements() != $nSub) { ${ev.isNull} = true; }
         |  else {
         |    double $acc = 0.0;
         |    boolean $bad = false;
         |    for (int $m = 0; $m < $nSub; $m++) {
         |      if ($codes.isNullAt($m)) { $bad = true; break; }
         |      final int $c = $codes.getInt($m);
         |      if ($c < 0 || $c >= $codesPerSub) { $bad = true; break; }
         |      final int $idx = $m * $codesPerSub + $c;
         |      if ($lut.isNullAt($idx)) { $bad = true; break; }
         |      $acc += $lut.getDouble($idx);
         |    }
         |    if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |  }
         |}
         |""".stripMargin
    })
}
