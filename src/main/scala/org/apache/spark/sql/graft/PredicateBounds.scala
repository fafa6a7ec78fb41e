package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{Cast => NCast, ColumnNode,
  Literal => NLit, UnresolvedAttribute => NAttr,
  UnresolvedFunction => NFn}

/** Conjunct-tree bound extraction from a unified Column predicate —
  * the introspection half of `VersionedTable.readWhere`'s automatic
  * data skipping. Lives in the sql package because the node classes
  * (`org.apache.spark.sql.internal.*` — what `col("k") >= lit(5)`
  * actually builds in Spark 4; catalyst conversion only happens at
  * analysis time) are `private[sql]`.
  *
  * Everything extracted is CONSERVATIVE: strict bounds widen to
  * closed ones, open bounds are the IEEE infinities (a file whose
  * stats hold literal Infinity values must stay admitted), one-sided
  * string lower bounds produce nothing (astral-plane code points
  * sort above any BMP sentinel), and a conjunct the walker cannot
  * parse (OR, arithmetic, UDF) simply contributes no bound — the
  * caller always re-applies the full predicate row-level.
  */
object PredicateBounds {

  /** Per-column conjunctive bounds: numeric [lo, hi] ranges for the
    * `mn_`/`mx_` stats family, string ranges for the lexicographic
    * `smn_`/`smx_` family, and raw equality/IN probe values for the
    * Bloom sidecar.
    */
  case class Bounds(
      numeric: Seq[(String, Double, Double)],
      strings: Seq[(String, String, String)],
      probes: Seq[(String, Seq[Any])])

  def extract(pred: Column): Bounds = {
    def conjuncts(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: NFn if f.functionName.equalsIgnoreCase("and") &&
          f.arguments.length == 2 =>
        f.arguments.flatMap(conjuncts)
      case x => Seq(x)
    }
    def attrName(n: ColumnNode): Option[String] = n match {
      case a: NAttr => a.nameParts.lastOption
      case c: NCast => attrName(c.child)
      case _ => None
    }
    def numVal(n: ColumnNode): Option[Double] = n match {
      case l: NLit => l.value match {
        case v: Number => Some(v.doubleValue)
        case v: java.math.BigDecimal => Some(v.doubleValue)
        case _ => None
      }
      case _ => None
    }
    def strVal(n: ColumnNode): Option[String] = n match {
      case l: NLit => l.value match {
        case v: String => Some(v)
        case _ => None
      }
      case _ => None
    }
    // raw JVM probe value for the Bloom sidecar — restricted to the
    // types `commitWithBloom` hashes losslessly through lit()
    def probeVal(n: ColumnNode): Option[Any] = n match {
      case l: NLit => l.value match {
        case v: java.lang.Long => Some(v)
        case v: java.lang.Integer => Some(v.longValue: java.lang.Long)
        case v: String => Some(v)
        case _ => None
      }
      case _ => None
    }

    val numB = Seq.newBuilder[(String, Double, Double)]
    val strB = Seq.newBuilder[(String, String, String)]
    val probeB = Seq.newBuilder[(String, Seq[Any])]
    val inf = Double.PositiveInfinity
    def cmpAttr(op: String, c: String, l: ColumnNode): Unit = op match {
      case ">" | ">=" =>
        numVal(l).foreach(v => numB += ((c, v, inf)))
      case "<" | "<=" =>
        numVal(l).foreach(v => numB += ((c, -inf, v)))
        strVal(l).foreach(v => strB += ((c, "", v)))
      case "=" =>
        numVal(l).foreach(v => numB += ((c, v, v)))
        strVal(l).foreach(v => strB += ((c, v, v)))
        probeVal(l).foreach(v => probeB += ((c, Seq(v))))
      case _ => ()
    }
    // attribute on either side of the comparison — the op flips
    def cmp(op: String, l: ColumnNode, r: ColumnNode): Unit =
      (attrName(l), attrName(r)) match {
        case (Some(c), None) => cmpAttr(op, c, r)
        case (None, Some(c)) =>
          val flipped = op match {
            case ">" => "<"; case ">=" => "<="
            case "<" => ">"; case "<=" => ">="
            case other => other
          }
          cmpAttr(flipped, c, l)
        case _ => ()
      }
    def inList(a: ColumnNode, vs: Seq[ColumnNode]): Unit =
      attrName(a).foreach { c =>
        if (vs.nonEmpty) {
          val nums = vs.flatMap(numVal)
          if (nums.length == vs.length) numB += ((c, nums.min, nums.max))
          val strs = vs.flatMap(strVal)
          if (strs.length == vs.length) strB += ((c, strs.min, strs.max))
          val probes = vs.flatMap(probeVal)
          if (probes.length == vs.length) probeB += ((c, probes))
        }
      }
    conjuncts(ColumnBridge.node(pred)).foreach {
      case f: NFn =>
        f.functionName match {
          case ">" | ">=" | "<" | "<=" if f.arguments.length == 2 =>
            cmp(f.functionName, f.arguments(0), f.arguments(1))
          case "=" | "==" | "equalTo" if f.arguments.length == 2 =>
            cmp("=", f.arguments(0), f.arguments(1))
          case "in" if f.arguments.nonEmpty =>
            inList(f.arguments.head, f.arguments.tail)
          case "between" if f.arguments.length == 3 =>
            cmp(">=", f.arguments(0), f.arguments(1))
            cmp("<=", f.arguments(0), f.arguments(2))
          case _ => ()
        }
      case _ => () // unparseable conjunct: no bound, still row-filtered
    }
    Bounds(numB.result(), strB.result(), probeB.result())
  }
}
