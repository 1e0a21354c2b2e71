package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Installable entry point: the whole SQL surface (8 scalar functions +
  * all 11 `unique_*` window TVFs + the LLM curation TVFs) wired into
  * every session of a cluster via
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * — the Spark-native analog of dropping the reference's extension jar on
  * the classpath and having `@Extension(namespace="unique")` register
  * itself declaratively (SURVEY.md §2.2 "UDx surface";
  * `UniqueEverWindowProcessor.java:63-65`). The injected builders are the
  * SAME definition lists `GraftSql.register` uses, so the two paths
  * cannot drift: extension-injected functions resolve to identical
  * Catalyst expression trees / logical plans.
  *
  * Functions injected here live in the session's base registry (present
  * in fresh sessions cloned from the builder), whereas
  * `GraftSql.register` adds temp functions to one live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    GraftSql.scalarBuilders.foreach { case (name, builder) =>
      extensions.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(GraftSql.getClass.getCanonicalName, name), builder))
    }
    GraftSql.tableBuilders.foreach { case (name, builder) =>
      extensions.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo(GraftSql.getClass.getCanonicalName, name), builder))
    }
  }
}
