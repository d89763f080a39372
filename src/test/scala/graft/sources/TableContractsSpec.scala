package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TableContractsSpec extends SparkSpec {

  test("current testdata matches the contract at every scale factor") {
    for (sf <- Seq("0.001", "0.01")) {
      val d = TableContracts.divergences(spark, s"/root/testdata/sf$sf")
      assert(d.isEmpty, s"sf$sf:\n${d.mkString("\n")}")
    }
  }

  test("a drifted column type is reported as one clear line") {
    val dir = Files.createTempDirectory("contracts_spec_").toString
    // region with r_regionkey drifted int32 → string
    spark.range(2)
      .select(col("id").cast("string").as("r_regionkey"),
        lit("EU").as("r_name"))
      .write.parquet(s"$dir/region.parquet")
    val d = TableContracts.divergences(spark, dir)
    assert(d.exists(l => l.contains("r_regionkey") && l.contains("StringType")), d)
    // the other nine tables are absent → reported unreadable, not thrown
    assert(d.exists(_.startsWith("events:")), d)
  }
}
