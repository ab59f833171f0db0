package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession per suite (guide: one session, lazy). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // keep derby + warehouse artifacts out of the repo working dir
    val scratch = java.nio.file.Files.createTempDirectory("graft-test-wh")
    System.setProperty("derby.system.home", scratch.toString)
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
