package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point (`spark.sql.extensions` /
  * `Builder.withExtensions`) registering the engine's custom Catalyst
  * expressions — currently the WKB geometry decoders (X6).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.register(ext)
}
