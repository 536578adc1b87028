package graft.query

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, ExpressionInfo, Literal, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface for the riemann query language: makes
  * `riemann_query('metric > 5 and tagged "prod"')` usable anywhere a
  * boolean expression is legal in Spark SQL — the analog of the
  * reference's Msg{query} entry point (transport.clj:167-189) for users
  * living in `spark.sql(...)`.
  *
  * Spark-first shape: the function call resolves to a placeholder
  * expression, and an injected analyzer rule expands it against the
  * child relation's schema (field vs attributes-map resolution needs
  * the schema, which a FunctionBuilder never sees). After expansion the
  * predicate is ordinary Catalyst — codegen, pushdown and pruning all
  * apply as if the user had written the WHERE clause by hand.
  *
  * Activate per session with
  * `.config("spark.sql.extensions", "graft.query.RiemannExtensions")`.
  */
object RiemannSql {

  /** Unresolved marker for a `riemann_query('...')` call. Stays
    * `resolved = false` so analysis fails loudly (instead of silently
    * executing) if the resolution rule is not installed. */
  case class RiemannQueryExpr(query: Expression) extends Unevaluable {
    override def children: Seq[Expression] = Seq(query)
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false
    override lazy val resolved: Boolean = false
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(query = newChildren.head)
  }

  private def queryString(e: Expression): String = e match {
    case Literal(s: UTF8String, StringType) if s != null => s.toString
    case other => throw QueryLanguage.ParseException(
      s"riemann_query expects a string literal, got: $other")
  }

  /** FunctionRegistry builder: validates arity and syntax eagerly (a
    * bad query fails at the call site with the parser's message), then
    * defers compilation to the analyzer rule. */
  val builder: Seq[Expression] => Expression = { args =>
    if (args.length != 1)
      throw QueryLanguage.ParseException(
        s"riemann_query takes exactly one argument, got ${args.length}")
    args.head match {
      case lit @ Literal(s: UTF8String, StringType) if s != null =>
        QueryLanguage.parse(s.toString) // syntax check only
        RiemannQueryExpr(lit)
      case other => RiemannQueryExpr(other) // rejected at resolution
    }
  }

  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("riemann_query"),
      new ExpressionInfo(classOf[RiemannQueryExpr].getName, "riemann_query"),
      builder)

  /** Compile a query string to a RESOLVED Catalyst expression bound to
    * the given output attributes: analyze the compiled Column against an
    * empty relation carrying the same schema (public API — the
    * Column→Expression converter is private[sql]), then remap its
    * attribute references onto the real child's attributes by name. */
  private def compileBound(spark: SparkSession, query: String,
      out: Seq[AttributeReference]): Expression = {
    val schema = StructType(out.map(a => StructField(a.name, a.dataType, a.nullable)))
    val empty = spark.createDataFrame(
      new java.util.ArrayList[Row](), schema)
    val analyzed = empty.select(QueryLanguage.predicate(query, schema))
      .queryExecution.analyzed
    val expr = analyzed match {
      case Project(Seq(a: Alias), _) => a.child
      case Project(Seq(e), _) => e
      case other => throw QueryLanguage.ParseException(
        s"unexpected shape compiling riemann_query: $other")
    }
    // group, not toMap: a join child can expose the same name on both
    // sides, and binding to an arbitrary one would silently pick a side
    // where hand-written SQL raises an ambiguity error
    val byName = out.distinct.groupBy(_.name)
    expr.transform {
      case ar: AttributeReference => byName.get(ar.name) match {
        case Some(Seq(single)) => single
        case Some(many) if many.length > 1 =>
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "AMBIGUOUS_REFERENCE",
            messageParameters = Map(
              "name" -> s"`${ar.name}`",
              "referenceNames" -> many.map(a => s"`${a.qualifiedName}`")
                .sorted.mkString("[", ", ", "]")))
        case _ => ar
      }
    }
  }

  /** Expand placeholders once the child relation is resolved: compile
    * the query AST against the child schema and splice the bound
    * Catalyst expression in — downstream it behaves exactly like a
    * hand-written WHERE clause (codegen, pushdown, pruning). */
  case class ResolveRiemannQuery(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperatorsUp {
        case p if p.childrenResolved &&
            p.expressions.exists(_.exists(_.isInstanceOf[RiemannQueryExpr])) =>
          val out = p.children.flatMap(_.output)
            .collect { case a: AttributeReference => a }
          p.transformExpressionsUp {
            case RiemannQueryExpr(q) =>
              compileBound(spark, queryString(q), out)
          }
      }
  }

  /** True when the current session has the riemann_query surface. */
  def isInstalled(spark: SparkSession): Boolean =
    spark.sessionState.functionRegistry
      .functionExists(FunctionIdentifier("riemann_query"))
}

/** `spark.sql.extensions` entry point. */
class RiemannExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction(RiemannSql.functionDescription)
    extensions.injectResolutionRule(RiemannSql.ResolveRiemannQuery)
  }
}
