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
  override def apply(ext: SparkSessionExtensions): Unit =
    (functions.ChCompat.builders.toSeq.map((_, functions.ChCompat.getClass)) ++
      functions.PipelineFunctions.builders.toSeq
        .map((_, functions.PipelineFunctions.getClass)))
      .foreach { case ((name, builder), owner) =>
        ext.injectFunction((
          FunctionIdentifier(name),
          new ExpressionInfo(owner.getCanonicalName, name),
          builder))
      }
}
