package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one JVM-wide session (Spark's
  * getOrCreate) so the suite doesn't pay session startup per class.
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("4")
  def sf(name: String): String = s"/root/testdata/$name"
}
