package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators
import graft.functions.Aggregators.OrdMetric

/** Typed-Aggregator folds: the order-sensitive / sign-aware cases from
  * test/riemann/folds_test.clj (difference order, product/quotient with
  * zeros and negatives, quotient-sloppy 0/0). */
class AggregatorsSpec extends SparkSpec {

  private def agg2(vals: Seq[Double],
      a: org.apache.spark.sql.expressions.Aggregator[OrdMetric, _, Option[Double]])
      : Option[Double] = {
    val spark0 = spark
    import spark0.implicits._
    val ds = vals.zipWithIndex.map { case (v, i) => OrdMetric(i.toLong, v) }.toDS()
    ds.select(a.toColumn).collect().head
  }

  private def aggP(vals: Seq[Double]): Option[Double] = {
    val spark0 = spark
    import spark0.implicits._
    vals.toDS().select(new Aggregators.Product().toColumn).collect().head
  }

  test("difference honors event order regardless of partitioning (folds.clj:115-126)") {
    assert(agg2(Seq(10.0, 1.0, 2.0), new Aggregators.Difference) == Some(7.0))
    assert(agg2(Seq(1.0), new Aggregators.Difference) == Some(1.0))
    assert(agg2(Seq(), new Aggregators.Difference) == None)
    // repartitioned input, same answer (mergeable buffer)
    val spark0 = spark
    import spark0.implicits._
    val ds = Seq(OrdMetric(0, 10.0), OrdMetric(1, 1.0), OrdMetric(2, 2.0))
      .toDS().repartition(3)
    assert(ds.select(new Aggregators.Difference().toColumn).collect().head
      == Some(7.0))
  }

  test("product handles zero and negative metrics (folds.clj:103-113)") {
    assert(aggP(Seq(2.0, 3.0, 4.0)).map(v => math.round(v * 1e9) / 1e9.toDouble)
      == Some(24.0))
    assert(aggP(Seq(2.0, 0.0, 4.0)) == Some(0.0))
    assert(aggP(Seq(-2.0, 3.0)).map(v => math.round(v * 1e9) / 1e9.toDouble)
      == Some(-6.0))
    assert(aggP(Seq(-2.0, -3.0)).map(v => math.round(v * 1e9) / 1e9.toDouble)
      == Some(6.0))
    assert(aggP(Seq()) == None)
  }

  test("quotient: first / product(rest); sloppy 0/0 -> 0 (folds.clj:128-154)") {
    def r(o: Option[Double]) = o.map(v => math.round(v * 1e9) / 1e9.toDouble)
    assert(r(agg2(Seq(12.0, 3.0, 2.0), new Aggregators.Quotient())) == Some(2.0))
    assert(r(agg2(Seq(0.0, 5.0), new Aggregators.Quotient())) == Some(0.0))
    // double division semantics like the reference: x/0.0 = ±Inf,
    // only 0/0 is NaN
    assert(agg2(Seq(1.0, 0.0), new Aggregators.Quotient())
      == Some(Double.PositiveInfinity))
    assert(agg2(Seq(-1.0, 0.0), new Aggregators.Quotient())
      == Some(Double.NegativeInfinity))
    assert(agg2(Seq(1.0, 0.0, -2.0), new Aggregators.Quotient())
      == Some(Double.NegativeInfinity))
    assert(agg2(Seq(0.0, 0.0), new Aggregators.Quotient()).get.isNaN)
    assert(agg2(Seq(0.0, 0.0), new Aggregators.Quotient(sloppy = true))
      == Some(0.0))
    // sloppy zeroes on ANY zero metric, not just 0/0
    // (folds_test.clj quotient-sloppy-test: [1 0] -> 0)
    assert(agg2(Seq(1.0, 0.0), new Aggregators.Quotient(sloppy = true))
      == Some(0.0))
    assert(r(agg2(Seq(2.0, -3.0), new Aggregators.Quotient(sloppy = true)))
      == Some(-0.666666667))
    assert(r(agg2(Seq(-12.0, 3.0, -2.0), new Aggregators.Quotient())) == Some(2.0))
  }
}
