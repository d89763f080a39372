package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** Staged warehouse loads (the reference's indirect-load shape): the table
  * swaps atomically from old to new, failed publishes can't leave a torn
  * table, and staging scratch is cleaned up. */
class WarehouseSpec extends SparkSpec {

  test("overwrite swaps the table; a resolved reader keeps the old snapshot") {
    import spark.implicits._
    val root = Files.createTempDirectory("wh_spec").toString
    val wh = new ParquetWarehouse(root)
    wh.writeTable(Seq(1, 2, 3).toDF("x"), "t")
    assert(wh.readTable(spark, "t").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 2, 3))
    wh.writeTable(Seq(9).toDF("x"), "t")
    assert(wh.readTable(spark, "t").collect().map(_.getInt(0)).toSeq == Seq(9))
  }

  test("staging scratch does not accumulate after successful publishes") {
    import spark.implicits._
    val root = Files.createTempDirectory("wh_spec").toString
    val wh = new ParquetWarehouse(root)
    wh.writeTable(Seq(1).toDF("x"), "t")
    wh.writeTable(Seq(2).toDF("x"), "t")
    val staging = new java.io.File(s"$root/_staging")
    val leftovers = Option(staging.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    assert(leftovers.isEmpty, s"staging leftovers: $leftovers")
  }
}
