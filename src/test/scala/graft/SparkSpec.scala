package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft-warehouse").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // the application-wide injection path (same as every graft main):
      // GraftExtensionsSpec proves kernels resolve in a newSession()
      // whose temp registry never saw register()
      .withExtensions(new GraftExtensions)
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
