package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge

/** SQL registration for graft's native Catalyst expressions, so
  * `spark.sql` users get the same operators as the Column API:
  *
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT vector_dot(a.embedding, b.embedding) ...")
  *
  * Functions: vector_dot(arr, arr), vector_norm(arr),
  * vector_cosine(arr, arr), sorted_intersect_count(arr, arr),
  * simhash64(tokens), minhash_signature(tokens, numHashes, ngram),
  * shingle_hash_set(tokens, ngram),
  * bpe_encode_pieces(text, pieces[, mark_words]),
  * bpe_decode_pieces(pieces).
  *
  * For sessions the library doesn't construct (notebooks, spark-submit
  * with `--conf spark.sql.extensions=graft.GraftExtensions`), the
  * same list installs through [[graft.GraftExtensions]].
  */
object GraftFunctions {

  /** Name → Catalyst builder for every native function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vector_dot" -> (es => VectorDot(es(0), es(1))),
    // norm and cosine as raw Catalyst compositions over VectorDot, so
    // SQL-only users can run similarity without the Scala Column API
    "vector_norm" -> (es => {
      require(es.length == 1, "vector_norm(arr)")
      import org.apache.spark.sql.catalyst.expressions.Sqrt
      Sqrt(VectorDot(es.head, es.head))
    }),
    "vector_cosine" -> (es => {
      require(es.length == 2, "vector_cosine(arr, arr)")
      import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply,
        Sqrt}
      Divide(VectorDot(es(0), es(1)),
        Multiply(Sqrt(VectorDot(es(0), es(0))),
          Sqrt(VectorDot(es(1), es(1)))))
    }),
    "sorted_intersect_count" -> (es => SortedIntersectCount(es(0), es(1))),
    "simhash64" -> (es => SimHash64(es.head)),
    "minhash_signature" -> (es => {
      require(es.length == 3,
        "minhash_signature(tokens, numHashes, ngram)")
      MinHashSignature(es.head,
        es(1).eval().toString.toInt, es(2).eval().toString.toInt)
    }),
    "shingle_hash_set" -> (es => {
      require(es.length == 2, "shingle_hash_set(tokens, ngram)")
      ShingleHashSet(es.head, es(1).eval().toString.toInt)
    }),
    // tokenizer pair: the vocabulary argument must be a foldable
    // array<string> (it ships inside the plan like a literal)
    "bpe_encode_pieces" -> (es => {
      require(es.length == 2 || es.length == 3,
        "bpe_encode_pieces(text, pieces_array[, mark_words])")
      val pieces = es(1).eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          a.toObjectArray(org.apache.spark.sql.types.StringType)
            .map(_.toString).toSeq
        case _ => sys.error(
          "bpe_encode_pieces: pieces must be a foldable array<string>")
      }
      val mark = es.length == 3 && es(2).eval().toString.toBoolean
      BpeEncodePieces(es.head, pieces, mark)
    }),
    "bpe_decode_pieces" -> (es => {
      require(es.length == 1, "bpe_decode_pieces(pieces)")
      // raw Catalyst composition (a Column-built tree would inject
      // unresolved ColumnNode wrappers into the registry)
      import org.apache.spark.sql.catalyst.expressions.{ArrayJoin,
        Literal, StringTranslate, StringTrimLeft}
      StringTrimLeft(StringTranslate(
        ArrayJoin(es.head, Literal(""), None),
        Literal(WordMark.value), Literal(" ")))
    }))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }
}
