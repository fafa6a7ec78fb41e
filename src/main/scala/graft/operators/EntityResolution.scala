package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage (the Fellegi-Sunter shape): candidate
  * pairs come ONLY from an equality join on a cheap blocking key —
  * never an all-pairs comparison — and each candidate is scored by
  * string edit distance plus a numeric-attribute tolerance. Cost is
  * O(Σ blockSize_a · blockSize_b): the blocking key is the
  * recall/cost knob exactly as in the blocked-Jaccard dedup, and each
  * block's quadratic work is an independent shuffle partition.
  *
  * `levenshtein` is Spark's built-in codegen'd expression; the whole
  * pipeline is join + projection + aggregation, no UDFs.
  */
object EntityResolution {

  /** Score within-block candidates. Inputs are pre-projected to the
    * standard shape: `a` carries (id_a, blk, s_a, v_a), `b` carries
    * (id_b, blk, s_b, v_b). `matched` = 1 when the edit distance is at
    * most `maxEdit` AND the numeric attributes differ by at most
    * `numTol` — keep/aggregate downstream, or filter `matched = 1`
    * immediately in production (the flag column exists so precision
    * reports can count candidates).
    */
  def scoredCandidates(a: DataFrame, b: DataFrame, maxEdit: Int,
      numTol: Double): DataFrame =
    a.join(b, Seq("blk"))
      .withColumn("edit", levenshtein(col("s_a"), col("s_b")))
      .withColumn("matched",
        (col("edit") <= maxEdit &&
          abs(col("v_a") - col("v_b")) <= numTol).cast("int"))
}
