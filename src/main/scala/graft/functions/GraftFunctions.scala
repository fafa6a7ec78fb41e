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
  * Functions: vector_dot(arr, arr), sorted_intersect_count(arr, arr),
  * simhash64(tokens), minhash_signature(tokens, numHashes, ngram),
  * shingle_hash_set(tokens, ngram).
  *
  * For sessions the library doesn't construct (notebooks, spark-submit
  * with `--conf spark.sql.extensions=graft.GraftExtensions`), the
  * same list installs through [[graft.GraftExtensions]].
  */
object GraftFunctions {

  /** Name → Catalyst builder for every native function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vector_dot" -> (es => VectorDot(es(0), es(1))),
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
    }))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      ColumnBridge.registerFunction(spark, name, builder)
    }
}
