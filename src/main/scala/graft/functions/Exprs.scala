package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

object Exprs {

  /** Let-binding for expression trees: evaluate `value` ONCE per row and
    * bind it as a lambda variable inside `body`.
    *
    * Why: Spark's optimizer (CollapseProject) inlines projected expressions
    * into every use site, and higher-order functions evaluate their
    * argument expressions per lambda application. An expensive derived
    * value (normalized word array, MinHash signature…) referenced k times
    * inside a HOF is recomputed k×rows times. Wrapping it as
    * `transform(array(value), v -> body(v))[0]` forces one evaluation per
    * row; every reference in `body` becomes a cheap lambda-variable lookup.
    */
  def let(value: Column, body: Column => Column): Column =
    transform(array(value), v => body(v)).getItem(0)

  def let2(v1: Column, v2: Column, body: (Column, Column) => Column): Column =
    let(v1, a => let(v2, b => body(a, b)))
}
