package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** k-lane MinHash signature over the n-gram windows of a token array,
  * as ONE native Catalyst expression with whole-stage codegen.
  *
  * Algorithm: each token string is xxh64-hashed exactly once; each
  * n-gram window combines its n token hashes by chained hashLong; each
  * window hash is mixed into k lanes (hashLong with the lane index as
  * seed) and the per-lane minimum is the signature. Duplicated windows
  * cannot change a minimum, so no distinct step is needed — MinHash is
  * set-semantics by construction.
  *
  * This replaces a builtin formulation (transform + aggregate +
  * zip_with over concat_ws shingle strings) that allocated a k-element
  * array per shingle and re-hashed strings per lane — measured 20x
  * slower at sf0.1. Returns NULL when the document has fewer than n
  * tokens (callers filter those out, matching the empty-shingle-set
  * rule).
  */
case class MinHashSignature(child: Expression, numHashes: Int, ngram: Int)
    extends UnaryExpression {
  require(numHashes > 0 && ngram > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // short docs yield NULL
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val windows = n - ngram + 1
    if (windows <= 0) return null
    val toks = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      toks(i) = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var w = 0
    while (w < windows) {
      var h = toks(w)
      var g = 1
      while (g < ngram) { h = XXH64.hashLong(toks(w + g), h); g += 1 }
      var j = 0
      while (j < numHashes) {
        val m = XXH64.hashLong(h, j)
        if (m < sig(j)) sig(j) = m
        j += 1
      }
      w += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val utf8 = classOf[UTF8String].getName
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val windows = ctx.freshName("windows")
      val toks = ctx.freshName("toks")
      val sig = ctx.freshName("sig")
      val boxed = ctx.freshName("boxed")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      val g = ctx.freshName("g")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |int $windows = $n - $ngram + 1;
         |if ($windows <= 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $toks = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $utf8 $s = $a.getUTF8String($i);
         |    $toks[$i] = $xxh.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |  long[] $sig = new long[$numHashes];
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $w = 0; $w < $windows; $w++) {
         |    long $h = $toks[$w];
         |    for (int $g = 1; $g < $ngram; $g++) {
         |      $h = $xxh.hashLong($toks[$w + $g], $h);
         |    }
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $m = $xxh.hashLong($h, (long) $j);
         |      if ($m < $sig[$j]) $sig[$j] = $m;
         |    }
         |  }
         |  java.lang.Long[] $boxed = new java.lang.Long[$numHashes];
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    $boxed[$j] = java.lang.Long.valueOf($sig[$j]);
         |  }
         |  ${ev.value} = new $gad($boxed);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object MinHashExpression {
  /** Column entry point: k-lane n-gram MinHash signature of a token
    * array (NULL for docs shorter than n tokens).
    */
  def minhashSignature(tokens: Column, numHashes: Int,
      ngram: Int): Column =
    ColumnBridge.column(MinHashSignature(
      ColumnBridge.expression(tokens), numHashes, ngram))
}
