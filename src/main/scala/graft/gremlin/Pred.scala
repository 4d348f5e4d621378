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
}

object Pred {
  /** has(key) — key present, any value. */
  case object Any extends Pred { def apply(c: Column): Column = c.isNotNull }
  /** hasNot(key) — key absent. */
  case object None extends Pred { def apply(c: Column): Column = c.isNull }
  final case class Eq(v: Lit) extends Pred {
    def apply(c: Column): Column = c === v.column
  }
  final case class Neq(v: Lit) extends Pred {
    def apply(c: Column): Column = c =!= v.column
  }
  final case class Lt(v: Lit) extends Pred {
    def apply(c: Column): Column = c < v.column
  }
  final case class Lte(v: Lit) extends Pred {
    def apply(c: Column): Column = c <= v.column
  }
  final case class Gt(v: Lit) extends Pred {
    def apply(c: Column): Column = c > v.column
  }
  final case class Gte(v: Lit) extends Pred {
    def apply(c: Column): Column = c >= v.column
  }
  /** inside(lo, hi): lo < x < hi (exclusive both ends). */
  final case class Inside(lo: Lit, hi: Lit) extends Pred {
    def apply(c: Column): Column = c > lo.column && c < hi.column
  }
  /** outside(lo, hi): x < lo || x > hi. */
  final case class Outside(lo: Lit, hi: Lit) extends Pred {
    def apply(c: Column): Column = c < lo.column || c > hi.column
  }
  /** between(lo, hi): lo <= x <= hi (inclusive both ends). */
  final case class Between(lo: Lit, hi: Lit) extends Pred {
    def apply(c: Column): Column = c >= lo.column && c <= hi.column
  }
  /** within(v1, v2, …): x ∈ list. */
  final case class Within(vs: Seq[Lit]) extends Pred {
    def apply(c: Column): Column = c.isin(vs.map(_.value): _*)
  }
  /** without(v1, v2, …): x ∉ list. */
  final case class Without(vs: Seq[Lit]) extends Pred {
    def apply(c: Column): Column = !c.isin(vs.map(_.value): _*)
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
