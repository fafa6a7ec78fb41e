package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Intersection size of two SORTED arrays (string or long elements) as
  * a native codegen expression: a linear merge with zero allocation,
  * replacing the builtin `array_intersect` (which builds a hash set per
  * invocation, interpreted) in the exact-Jaccard verifiers. Inputs must
  * be sorted ascending with distinct non-null elements — the
  * shingle-set projections guarantee that via
  * array_sort(array_distinct(...)). The long-element path lets
  * verifiers merge hashed shingle sets (8-byte compares instead of
  * UTF8String compares — measured ~3x faster on 300-element sets).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  private lazy val longElements: Boolean = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var c = 0
    if (longElements) {
      while (i < na && j < nb) {
        val cmp = java.lang.Long.compare(a.getLong(i), b.getLong(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val cmpExpr =
        if (longElements)
          s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  int $cmp = $cmpExpr;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of a token array as a native codegen expression:
  * tokens hashed once (xxh64, seed 42 — same as the builtin), bit
  * votes accumulated in a primitive int[64], majority folded into the
  * signature long. Replaces the higher-order-function formulation
  * (which allocated a 64-element array per token, interpreted).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < 64) {
        votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  $utf8 $s = $a.getUTF8String($i);
         |  long $h = $xxh.hashUnsafeBytes(
         |    $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $votes[$j] += ((int) (($h >>> $j) & 1L) << 1) - 1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** SQL-replayable 64-bit SimHash (contract twin of [[SimHash64]],
  * VERDICT r4 #4): identical vote/majority semantics, but the token
  * hash is an LCG-style fold over the token's UTF-16 code units —
  * h = ((h + c) * A) mod 2^64 from a fixed seed — instead of xxh64.
  * Modular multiply-add is expressible in DuckDB HUGEINT arithmetic
  * (`list_reduce` over `ascii(substr(...))`), so the whole pipeline
  * hash-checks against a SQL oracle; xxh64 is not, which is why the
  * production [[SimHash64]] stays rows-only + spec-pinned. Exact for
  * BMP text (UTF-16 unit == code point); the synthetic corpus is
  * ASCII.
  */
case class PolySimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      var h = PolySimHash64.Init
      var k = 0
      while (k < s.length) {
        h = (h + s.charAt(k)) * PolySimHash64.A
        k += 1
      }
      var j = 0
      while (j < 64) {
        votes(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val s = ctx.freshName("s")
      val k = ctx.freshName("k"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  String $s = $a.getUTF8String($i).toString();
         |  long $h = ${PolySimHash64.Init}L;
         |  for (int $k = 0; $k < $s.length(); $k++) {
         |    $h = ($h + $s.charAt($k)) * ${PolySimHash64.A}L;
         |  }
         |  for (int $j = 0; $j < 64; $j++) {
         |    $votes[$j] += ((int) (($h >>> $j) & 1L) << 1) - 1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object PolySimHash64 {
  /** Knuth MMIX LCG multiplier — odd, so ×A is a bijection mod 2^64. */
  val A = 6364136223846793005L
  /** Fold seed (shared with the multimodal feature stub's fold). */
  val Init = 1125899906842597L
}

/** The scalar LCG char fold of one STRING — the same (h+c)·A mod 2⁶⁴
  * recurrence [[PolySimHash64]] applies per token, exposed directly so
  * seeded-noise/bucketing operators get a SQL-replayable hash (DuckDB
  * mirrors it in HUGEINT arithmetic). Native because Java's wrapping
  * multiply is the semantics — ANSI-mode Column arithmetic would throw
  * on the intentional overflow.
  */
case class PolyHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash64"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = PolySimHash64.Init
    var k = 0
    while (k < s.length) {
      h = (h + s.charAt(k)) * PolySimHash64.A
      k += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val k = ctx.freshName("k")
      s"""
         |String $s = $a.toString();
         |long $h = ${PolySimHash64.Init}L;
         |for (int $k = 0; $k < $s.length(); $k++) {
         |  $h = ($h + $s.charAt($k)) * ${PolySimHash64.A}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** The SORTED DISTINCT n-gram window hashes of a token array, as one
  * native codegen expression: tokens hashed once (xxh64 seed 42), each
  * window combining its n token hashes by chained hashLong (the same
  * scheme [[MinHashSignature]] mixes into lanes), then sort + dedupe in
  * a primitive long[]. Replaces the builtin shingle-string pipeline
  * (concat_ws per window + array_distinct + array_sort + per-element
  * xxhash — measured ~7 s of a 10 s dedup query at sf0.1) with zero
  * string allocation. |set| and intersection sizes equal the
  * string-shingle formulation up to 64-bit collisions (p ≈ w²/2⁶⁵ per
  * document — far below the 6-decimal rounding applied to Jaccard).
  * Fewer than n tokens yield an empty array.
  */
case class ShingleHashSet(child: Expression, ngram: Int)
    extends UnaryExpression {
  require(ngram > 0)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_set"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val windows = n - ngram + 1
    if (windows <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    val toks = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      toks(i) = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    val hs = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      var h = toks(w)
      var g = 1
      while (g < ngram) { h = XXH64.hashLong(toks(w + g), h); g += 1 }
      hs(w) = h
      w += 1
    }
    java.util.Arrays.sort(hs)
    var k = 1
    var j = 1
    while (j < windows) {
      if (hs(j) != hs(k - 1)) { hs(k) = hs(j); k += 1 }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(hs, k))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val utf8 = classOf[UTF8String].getName
    val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val windows = ctx.freshName("windows")
      val toks = ctx.freshName("toks"); val hs = ctx.freshName("hs")
      val boxed = ctx.freshName("boxed")
      val i = ctx.freshName("i"); val w = ctx.freshName("w")
      val g = ctx.freshName("g"); val h = ctx.freshName("h")
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |int $windows = $n - $ngram + 1;
         |if ($windows <= 0) {
         |  ${ev.value} = new $gad(new java.lang.Long[0]);
         |} else {
         |  long[] $toks = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $utf8 $s = $a.getUTF8String($i);
         |    $toks[$i] = $xxh.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |  long[] $hs = new long[$windows];
         |  for (int $w = 0; $w < $windows; $w++) {
         |    long $h = $toks[$w];
         |    for (int $g = 1; $g < $ngram; $g++) {
         |      $h = $xxh.hashLong($toks[$w + $g], $h);
         |    }
         |    $hs[$w] = $h;
         |  }
         |  java.util.Arrays.sort($hs);
         |  int $k = 1;
         |  for (int $j = 1; $j < $windows; $j++) {
         |    if ($hs[$j] != $hs[$k - 1]) { $hs[$k] = $hs[$j]; $k++; }
         |  }
         |  java.lang.Long[] $boxed = new java.lang.Long[$k];
         |  for (int $j = 0; $j < $k; $j++) {
         |    $boxed[$j] = java.lang.Long.valueOf($hs[$j]);
         |  }
         |  ${ev.value} = new $gad($boxed);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object SetExpressions {
  /** Intersection size of two sorted distinct string arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Sorted distinct n-gram window hashes of a token array. */
  def sortedShingleHashes(tokens: Column, ngram: Int): Column =
    ColumnBridge.column(ShingleHashSet(
      ColumnBridge.expression(tokens), ngram))

  /** 64-bit SimHash of a token array. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** SQL-replayable SimHash twin (LCG token hash). */
  def polySimhash64(tokens: Column): Column =
    ColumnBridge.column(PolySimHash64(ColumnBridge.expression(tokens)))

  /** Scalar LCG char fold of a string (SQL-replayable, wraps mod 2⁶⁴). */
  def polyHash64(s: Column): Column =
    ColumnBridge.column(PolyHash64(ColumnBridge.expression(s)))
}
