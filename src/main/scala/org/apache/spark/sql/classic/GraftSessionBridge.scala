package org.apache.spark.sql.classic

/** Bridge into the `private[classic]` SparkSession constructor: build a
  * SIBLING session on an existing SparkContext + SharedState with its
  * own SparkSessionExtensions. Analyzer extension points (post-hoc
  * resolution rules, parser) bind only at session construction — unlike
  * optimizer rules, they have no experimental runtime-injection arm —
  * so a host application whose primary session lacks GraftExtensions
  * activates the SQL DML front door through this sibling (catalog and
  * temp state shared via SharedState). Exposed publicly through
  * [[org.apache.spark.sql.graft.ColumnBridge.sessionWithExtensions]]. */
object GraftSessionBridge {
  def withExtensions(base: org.apache.spark.sql.SparkSession,
      f: org.apache.spark.sql.SparkSessionExtensions => Unit)
      : org.apache.spark.sql.SparkSession = {
    val cls = base.asInstanceOf[SparkSession]
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    f(exts)
    // the 6-arg constructor is Scala-signature-private beyond even this
    // package; its BYTECODE is public (qualified-private erasure), so
    // plain reflection is the stable way in — same class, same jar
    val ctor = classOf[SparkSession].getDeclaredConstructors
      .find(_.getParameterCount == 6)
      .getOrElse(throw new IllegalStateException(
        "SparkSession 6-arg constructor not found - Spark version drift"))
    ctor.setAccessible(true)
    ctor.newInstance(cls.sparkContext, Some(cls.sharedState), None, exts,
      Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[org.apache.spark.sql.SparkSession]
  }
}
