package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions injector for the engine's SQL surface: a
  * deployment sets `spark.sql.extensions=graft.GraftExtensions` and
  * every session — spark-sql shell, Thrift server, notebook — gets the
  * ClickHouse-compat functions without calling
  * [[functions.ChCompat.registerAll]] in code. Same builders, same
  * codegen'd Catalyst expressions; this is only the registration
  * channel Spark provides for cluster-wide function surfaces.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    (functions.ChCompat.builders.toSeq.map((_, functions.ChCompat.getClass)) ++
      functions.PipelineFunctions.builders.toSeq
        .map((_, functions.PipelineFunctions.getClass)))
      .foreach { case ((name, builder), owner) =>
        ext.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo(owner.getCanonicalName, name),
          builder))
      }
    // parser front-end for the CH call shapes Spark's grammar rejects
    // or mis-parses (quoted-unit dateDiff, curried quantile(p)(x),
    // bare count(), FROM t FINAL, LIMIT n BY, CH comma-form
    // position/extract). The rewrite is lexical and
    // string-literal-safe; the SQL-standard forms POSITION(x IN y)
    // and EXTRACT(YEAR FROM ts) (no top-level comma) pass through to
    // the Spark built-ins. ONE documented divergence remains: the
    // comma-form `position(a, b)` is ambiguous between Spark
    // (substr, str) and CH (haystack, needle) and an extensions
    // session resolves it with CH semantics — that IS the dialect the
    // extension opts the session into; a session that wants Spark's
    // comma-form position simply doesn't configure the extension.
    ext.injectParser((_, delegate) => new ChRewriteParser(delegate))
    // the projection auto-rewrite (CH optimize_use_projections
    // analogue) — execution is conf-gated on
    // spark.graft.projections.auto, see graft.plans.ProjectionRewrite
    ext.injectOptimizerRule(session => new plans.ProjectionRewrite(session))
  }
}

/** ParserInterface wrapper: [[functions.ChSqlRewrite]] on the query
  * text, then delegate. Only plan parsing is intercepted —
  * expressions, identifiers, and DDL strings go straight through.
  */
class ChRewriteParser(delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
    extends org.apache.spark.sql.catalyst.parser.ParserInterface {
  import org.apache.spark.sql.catalyst.{FunctionIdentifier => FI, TableIdentifier => TI}
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.types.{DataType, StructType}

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(functions.ChSqlRewrite(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(functions.ChSqlRewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TI =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FI =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
