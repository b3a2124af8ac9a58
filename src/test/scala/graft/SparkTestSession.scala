package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object SparkTestSession {
  lazy val get: SparkSession = GraftSession.get(
    master = "local[4]", shufflePartitions = 4, appName = "graft-test")
}
