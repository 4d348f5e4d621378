package graft.gremlin

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The reference's predicate algebra (`Predicate_T`, Grasper
 * `base/type.hpp:412`; evaluation `base/predicate.cpp:100-150`):
 * ANY, NONE, EQ, NEQ, LT, LTE, GT, GTE, INSIDE (exclusive), OUTSIDE,
 * BETWEEN (inclusive), WITHIN (in-list), WITHOUT.
 *
 * Compiled straight to Catalyst `Column` expressions — int/double
 * comparison coercion (`base/predicate.cpp:28-44`) is native Spark
 * behavior, so no custom code is needed for the value type system.
 */
sealed trait Pred {
  /** Build the filter column for a target column. */
  def apply(c: Column): Column

  /** Driver-side evaluation against a stored value — used by the
    * posting-list index to sum matched counts from its count map at
    * PLAN time, with the same int↔double coercion as the Column path
    * (reference `get_count_by_predicate`, `core/index_store.hpp:259`).
    * Returns None on a type mismatch (string vs number → no match). */
  def eval(v: Any): Boolean
}

private object PredEval {
  /** 3-way compare with numeric coercion; None = incomparable types. */
  def cmp(a: Any, l: Lit): Option[Int] = (a, l) match {
    case (s: String, Lit.S(v)) => Some(s.compareTo(v).sign)
    case (n: Number, Lit.I(v)) =>
      Some(java.lang.Double.compare(n.doubleValue(), v.toDouble))
    case (n: Number, Lit.D(v)) =>
      Some(java.lang.Double.compare(n.doubleValue(), v))
    case _ => scala.None
  }
}

object Pred {
  import PredEval.cmp
  /** has(key) — key present, any value. */
  case object Any extends Pred {
    def apply(c: Column): Column = c.isNotNull
    def eval(v: scala.Any): Boolean = v != null
  }
  /** hasNot(key) — key absent. */
  case object None extends Pred {
    def apply(c: Column): Column = c.isNull
    def eval(v: scala.Any): Boolean = v == null
  }
  final case class Eq(v: Lit) extends Pred {
    def apply(c: Column): Column = c === v.column
    def eval(x: scala.Any): Boolean = cmp(x, v).contains(0)
  }
  final case class Neq(v: Lit) extends Pred {
    def apply(c: Column): Column = c =!= v.column
    // incomparable types are simply unequal (value_t compare semantics)
    def eval(x: scala.Any): Boolean = !cmp(x, v).contains(0)
  }
  final case class Lt(v: Lit) extends Pred {
    def apply(c: Column): Column = c < v.column
    def eval(x: scala.Any): Boolean = cmp(x, v).exists(_ < 0)
  }
  final case class Lte(v: Lit) extends Pred {
    def apply(c: Column): Column = c <= v.column
    def eval(x: scala.Any): Boolean = cmp(x, v).exists(_ <= 0)
  }
  final case class Gt(v: Lit) extends Pred {
    def apply(c: Column): Column = c > v.column
    def eval(x: scala.Any): Boolean = cmp(x, v).exists(_ > 0)
  }
  final case class Gte(v: Lit) extends Pred {
    def apply(c: Column): Column = c >= v.column
    def eval(x: scala.Any): Boolean = cmp(x, v).exists(_ >= 0)
  }
  /** inside(lo, hi): lo < x < hi (exclusive both ends). */
  final case class Inside(lo: Lit, hi: Lit) extends Pred {
    def apply(c: Column): Column = c > lo.column && c < hi.column
    def eval(x: scala.Any): Boolean =
      cmp(x, lo).exists(_ > 0) && cmp(x, hi).exists(_ < 0)
  }
  /** outside(lo, hi): x < lo || x > hi. */
  final case class Outside(lo: Lit, hi: Lit) extends Pred {
    def apply(c: Column): Column = c < lo.column || c > hi.column
    def eval(x: scala.Any): Boolean =
      cmp(x, lo).exists(_ < 0) || cmp(x, hi).exists(_ > 0)
  }
  /** between(lo, hi): lo <= x <= hi (inclusive both ends). */
  final case class Between(lo: Lit, hi: Lit) extends Pred {
    def apply(c: Column): Column = c >= lo.column && c <= hi.column
    def eval(x: scala.Any): Boolean =
      cmp(x, lo).exists(_ >= 0) && cmp(x, hi).exists(_ <= 0)
  }
  /** within(v1, v2, …): x ∈ list. */
  final case class Within(vs: Seq[Lit]) extends Pred {
    def apply(c: Column): Column = c.isin(vs.map(_.value): _*)
    def eval(x: scala.Any): Boolean = vs.exists(v => cmp(x, v).contains(0))
  }
  /** without(v1, v2, …): x ∉ list. */
  final case class Without(vs: Seq[Lit]) extends Pred {
    def apply(c: Column): Column = !c.isin(vs.map(_.value): _*)
    def eval(x: scala.Any): Boolean = vs.forall(v => !cmp(x, v).contains(0))
  }
}

/** A literal in a query string: int, double, or string. */
sealed trait Lit {
  def value: scala.Any
  def column: Column = lit(value)
}
object Lit {
  final case class I(v: Long)    extends Lit { def value: scala.Any = v }
  final case class D(v: Double)  extends Lit { def value: scala.Any = v }
  final case class S(v: String)  extends Lit { def value: scala.Any = v }
}
