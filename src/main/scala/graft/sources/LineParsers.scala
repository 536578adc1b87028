package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JVM line parsers behind codegen'd Catalyst expressions —
  * the hot path of the graphite/OpenTSDB telnet decoders
  * (transport/graphite.clj:37-160, transport/opentsdb.clj:24-145).
  *
  * The column-expression pipeline in [[LineProtocols]] is the readable
  * spec of the semantics, but it evaluates interpreted higher-order
  * lambdas (the k=v dedup is O(n²) `exists` probes) and the
  * trim+split subtree again under every pushed-down filter. Each
  * parser here makes ONE pass over the line and returns a 0-or-1
  * element array of structs, consumed with `inline(...)`: invalid
  * lines vanish in the Generate, so no separate filter re-evaluates
  * the parse, and the operator stays a narrow projection
  * (PlanSpec "no exchange before the parse").
  *
  * Exactness: numeric conversions call the same machinery as
  * `try_cast` — [[UTF8String.toLong]] for strings → long and
  * java parseDouble + [[Cast.processFloatingPointSpecialLiterals]]
  * for strings → double — so outputs are bit-identical to the column
  * pipeline (LineParsersParitySpec property-checks this).
  */
object LineParsers {

  val graphiteStruct: StructType = StructType(Seq(
    StructField("service", StringType),
    StructField("metric", DoubleType),
    StructField("time_s", LongType),
    StructField("attributes", MapType(StringType, StringType))))

  val opentsdbStruct: StructType = StructType(Seq(
    StructField("description", StringType),
    StructField("service", StringType),
    StructField("time_s", LongType),
    StructField("metric", DoubleType),
    StructField("attributes", MapType(StringType, StringType)),
    StructField("host", StringType)))

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Java-regex `\s` (the column pipeline's trim/split class):
    * ASCII space, tab, \n, \x0B, \f, \r — NOT unicode spaces. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || (c >= '\t' && c <= '\r')

  /** `regexp_replace(line, "^\s+|\s+$", "")` + `split("\s+")` in one
    * scan. Empty input yields a single empty token (Java split
    * semantics), which every caller's arity check then drops. */
  private def splitWs(s: String): Array[String] = {
    var i = 0
    var j = s.length
    while (i < j && isWs(s.charAt(i))) i += 1
    while (j > i && isWs(s.charAt(j - 1))) j -= 1
    if (i == j) return Array("")
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    var k = i
    while (k < j) {
      var e = k
      while (e < j && !isWs(s.charAt(e))) e += 1
      out += s.substring(k, e)
      k = e
      while (k < j && isWs(s.charAt(k))) k += 1
    }
    out.toArray
  }

  /** `try_cast(s as double)`: Cast's exact string→double path —
    * Double.parseDouble, falling back to the trimmed-lowercase
    * inf/nan literal table; null when neither applies. */
  private def castDouble(s: String): java.lang.Double =
    try java.lang.Double.valueOf(java.lang.Double.parseDouble(s))
    catch {
      case _: NumberFormatException =>
        Cast.processFloatingPointSpecialLiterals(s, false)
          .asInstanceOf[java.lang.Double]
    }

  /** `try_cast(s as long)`: the ANSI string→long path. NOT
    * UTF8String.toLong(wrapper) — that one tolerates a fractional part
    * ("1.9" → 1) where ANSI rejects it; toLongExact is the strict
    * method the SQL cast calls. */
  private def castLong(s: String): java.lang.Long =
    try java.lang.Long.valueOf(UTF8String.fromString(s).toLongExact())
    catch { case _: NumberFormatException => null }

  /** ANSI double→long (the graphite timestamp's second try_cast):
    * truncate toward zero; NaN / out-of-range → null. */
  private def doubleToLong(d: java.lang.Double): java.lang.Long =
    if (d == null) null
    else if (java.lang.Math.floor(d) <= Long.MaxValue.toDouble &&
      java.lang.Math.ceil(d) >= Long.MinValue.toDouble)
      java.lang.Long.valueOf(d.doubleValue.toLong)
    else null

  /** The k=v tag map of LineProtocols.kvMap: split each pair on its
    * FIRST '=' (no '=' → null value), keep the LAST pair per duplicate
    * key at its last-occurrence position. `rename` applies the
    * OpenTSDB `service=` → `servicetag=` prefix rewrite first. */
  private def kvMap(pairs: Iterator[String], rename: Boolean)
      : java.util.LinkedHashMap[String, String] = {
    val m = new java.util.LinkedHashMap[String, String]
    for (t0 <- pairs) {
      val t = if (rename && t0.startsWith("service="))
        "servicetag=" + t0.substring(8) else t0
      val i = t.indexOf('=')
      val k = if (i < 0) t else t.substring(0, i)
      val v = if (i < 0) null else t.substring(i + 1)
      // remove-then-put moves a duplicate key to its last position,
      // matching the column pipeline's keep-last filter order
      if (m.containsKey(k)) m.remove(k)
      m.put(k, v)
    }
    m
  }

  private def mapData(m: java.util.LinkedHashMap[String, String]): ArrayBasedMapData = {
    val n = m.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = if (e.getValue == null) null else UTF8String.fromString(e.getValue)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  @inline private def one(fields: Array[Any]): ArrayData =
    new GenericArrayData(Array[Any](new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields)))

  /** `service[;k=v...] metric timestamp` → 0-or-1 [[graphiteStruct]]. */
  def parseGraphite(line: UTF8String): ArrayData = {
    if (line == null) return null
    val toks = splitWs(line.toString)
    if (toks.length != 3 || toks(0).isEmpty) return Empty
    val isNan = toks(1).toLowerCase == "nan"
    val metric = if (isNan) null else castDouble(toks(1))
    if (metric == null && !isNan) return Empty
    val ts = doubleToLong(castDouble(toks(2)))
    if (ts == null) return Empty
    val head = toks(0).split(";", -1)
    one(Array[Any](
      UTF8String.fromString(head(0)),
      metric,
      ts,
      mapData(kvMap(head.iterator.drop(1), rename = false))))
  }

  /** `put <metric> <ts> <value> [k=v ...]` → 0-or-1 [[opentsdbStruct]]. */
  def parseOpenTsdb(line: UTF8String): ArrayData = {
    if (line == null) return null
    val toks = splitWs(line.toString)
    if (toks.length < 4 || toks(0) != "put") return Empty
    if (toks(2).toLowerCase.contains("nan") ||
      toks(3).toLowerCase.contains("nan")) return Empty
    val ts = castLong(toks(2))
    if (ts == null) return Empty
    val metric = castDouble(toks(3))
    if (metric == null) return Empty
    val description = toks(1)
    // tag string minus host= appended to the service name
    val sb = new java.lang.StringBuilder(description)
    var i = 4
    while (i < toks.length) {
      if (!toks(i).startsWith("host=")) { sb.append(' '); sb.append(toks(i)) }
      i += 1
    }
    val m = kvMap(toks.iterator.drop(4), rename = true)
    val host = m.remove("host")
    one(Array[Any](
      UTF8String.fromString(description),
      UTF8String.fromString(sb.toString),
      ts,
      metric,
      mapData(m),
      if (host == null) null else UTF8String.fromString(host)))
  }
}

/** `parse(line)`: array of 0-or-1 parsed structs; consumed via
  * `inline`. Codegen is a single static call — the expression sits
  * inside the whole-stage span. */
abstract class LineParseExpr extends UnaryExpression {
  protected def struct: StructType
  protected def staticCall: String
  override def dataType: DataType = ArrayType(struct, containsNull = false)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$staticCall($c)")
}

case class GraphiteParse(child: Expression) extends LineParseExpr {
  override protected def struct: StructType = LineParsers.graphiteStruct
  override protected def staticCall: String = "graft.sources.LineParsers.parseGraphite"
  override protected def nullSafeEval(input: Any): Any =
    LineParsers.parseGraphite(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class OpenTsdbParse(child: Expression) extends LineParseExpr {
  override protected def struct: StructType = LineParsers.opentsdbStruct
  override protected def staticCall: String = "graft.sources.LineParsers.parseOpenTsdb"
  override protected def nullSafeEval(input: Any): Any =
    LineParsers.parseOpenTsdb(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
