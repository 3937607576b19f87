package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. One session per suite class;
  * small shuffle partition count keeps tiny-data tests fast.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      s"/tmp/graft-test-warehouse-${sys.props.getOrElse("user.name", "u")}")
    // see Verify.scala: Spark 4.1 union-partitioning propagation +
    // AQE breaks co-partitioned-union plans at execution
    .config("spark.sql.unionOutputPartitioning", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    // session is shared across suites in one forked JVM; do not stop
    super.afterAll()
  }
}
