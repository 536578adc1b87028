package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s for riemann's order-sensitive / sign-aware folds
  * (reference src/riemann/folds.clj:103-154) — the cases a plain
  * `groupBy().agg()` column can't express safely:
  *
  *  - `difference` (folds.clj:115-126): first metric minus the rest in
  *    event order. Mergeable by tracking the minimum-order element plus
  *    an exact decimal total, so partial aggregation still applies
  *    (map-side combine works; no global sort needed).
  *  - `product` (folds.clj:103-113): the log-space column trick
  *    silently corrupts zero/negative metrics; this buffer carries
  *    (zero-count, sign, Σlog|x|) and is exact in sign and zero.
  *  - `quotient` (folds.clj:128-154): first / product(rest), with the
  *    reference's sloppy-zero variant (0/0 → 0) as a flag.
  *
  * All buffers are tiny case classes → tungsten-encoded, merge is
  * associative+commutative, so these run as ordinary two-phase
  * hash aggregates at any scale.
  */
object Aggregators {

  case class OrdMetric(ord: Long, metric: Double)

  // ------------------------------------------------------------ difference
  case class DiffBuf(firstOrd: Long, firstVal: Double, total: BigDecimal,
      n: Long)

  /** first − Σrest in `ord` order; null result on empty input. */
  class Difference extends Aggregator[OrdMetric, DiffBuf, Option[Double]] {
    def zero: DiffBuf = DiffBuf(Long.MaxValue, 0.0, BigDecimal(0), 0L)
    def reduce(b: DiffBuf, e: OrdMetric): DiffBuf = {
      val (fo, fv) =
        if (e.ord < b.firstOrd) (e.ord, e.metric) else (b.firstOrd, b.firstVal)
      DiffBuf(fo, fv, b.total + BigDecimal(e.metric), b.n + 1)
    }
    def merge(a: DiffBuf, b: DiffBuf): DiffBuf = {
      val (fo, fv) = if (a.firstOrd <= b.firstOrd) (a.firstOrd, a.firstVal)
        else (b.firstOrd, b.firstVal)
      DiffBuf(fo, fv, a.total + b.total, a.n + b.n)
    }
    def finish(b: DiffBuf): Option[Double] =
      if (b.n == 0) None
      else Some((BigDecimal(b.firstVal) * 2 - b.total).toDouble)
    def bufferEncoder: Encoder[DiffBuf] = Encoders.product[DiffBuf]
    def outputEncoder: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  // --------------------------------------------------------------- product
  case class ProdBuf(zeros: Long, negs: Long, logAbs: Double, n: Long)

  /** Exact-in-sign product: handles zeros and negatives the log-space
    * column trick cannot. Magnitude via Σlog|x| (overflow-free). */
  class Product extends Aggregator[Double, ProdBuf, Option[Double]] {
    def zero: ProdBuf = ProdBuf(0, 0, 0.0, 0)
    def reduce(b: ProdBuf, x: Double): ProdBuf =
      if (x == 0.0) b.copy(zeros = b.zeros + 1, n = b.n + 1)
      else ProdBuf(b.zeros, b.negs + (if (x < 0) 1 else 0),
        b.logAbs + math.log(math.abs(x)), b.n + 1)
    def merge(a: ProdBuf, b: ProdBuf): ProdBuf =
      ProdBuf(a.zeros + b.zeros, a.negs + b.negs, a.logAbs + b.logAbs,
        a.n + b.n)
    def finish(b: ProdBuf): Option[Double] =
      if (b.n == 0) None
      else if (b.zeros > 0) Some(0.0)
      else Some((if (b.negs % 2 == 1) -1.0 else 1.0) * math.exp(b.logAbs))
    def bufferEncoder: Encoder[ProdBuf] = Encoders.product[ProdBuf]
    def outputEncoder: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  // -------------------------------------------------------------- quotient
  case class QuotBuf(firstOrd: Long, firstVal: Double, prod: ProdBuf)

  /** first / product(rest) in `ord` order. `sloppy` reproduces
    * quotient-sloppy (folds.clj:146-154), whose rule is broader than
    * 0/0: ANY zero metric anywhere (`some zero?`) makes the result 0 —
    * "the ratio of two constant values [rates] should be zero". */
  class Quotient(sloppy: Boolean = false)
      extends Aggregator[OrdMetric, QuotBuf, Option[Double]] {
    private val p = new Product
    def zero: QuotBuf = QuotBuf(Long.MaxValue, 0.0, p.zero)
    def reduce(b: QuotBuf, e: OrdMetric): QuotBuf = {
      val (fo, fv) =
        if (e.ord < b.firstOrd) (e.ord, e.metric) else (b.firstOrd, b.firstVal)
      QuotBuf(fo, fv, p.reduce(b.prod, e.metric))
    }
    def merge(a: QuotBuf, b: QuotBuf): QuotBuf = {
      val (fo, fv) = if (a.firstOrd <= b.firstOrd) (a.firstOrd, a.firstVal)
        else (b.firstOrd, b.firstVal)
      QuotBuf(fo, fv, p.merge(a.prod, b.prod))
    }
    def finish(b: QuotBuf): Option[Double] = {
      if (b.prod.n == 0) return None
      if (sloppy && b.prod.zeros > 0) return Some(0.0)
      // product of the REST = product(all) / first
      val restZeros = b.prod.zeros - (if (b.firstVal == 0.0) 1 else 0)
      val restNegs = b.prod.negs - (if (b.firstVal < 0) 1 else 0)
      if (restZeros > 0)
        // IEEE double division like the reference's (/ a 0.0):
        // 0/0 -> NaN, else ±Inf with the sign of first/rest-product
        // (a zero product carries the sign of its negative count)
        return Some(
          if (b.firstVal == 0.0) Double.NaN
          else (if ((b.firstVal < 0) ^ (restNegs % 2 == 1))
            Double.NegativeInfinity else Double.PositiveInfinity))
      if (b.firstVal == 0.0)
        return Some(0.0) // 0 / nonzero-product
      val restLog = b.prod.logAbs - math.log(math.abs(b.firstVal))
      val rest = (if (restNegs % 2 == 1) -1.0 else 1.0) * math.exp(restLog)
      Some(b.firstVal / rest)
    }
    def bufferEncoder: Encoder[QuotBuf] = Encoders.product[QuotBuf]
    def outputEncoder: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
