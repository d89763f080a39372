// Plan-quality audit for the round-18 features (run via spark-shell -i or
// sbt console paste): verifies (a) the row-id scan's base-id join is a
// BROADCAST hash join with no shuffle on the data side, and (b) predicate
// pushdown still reaches the parquet scan through a renamed table's
// display-overlay Project. Throwaway evidence script — the durable gates
// live in PlanShapeSpec-style asserts inside the specs.
import graft.sources.TxnLake
import org.apache.spark.sql.functions._
val spark = graft.GraftSession.local()
import spark.implicits._
val t = java.nio.file.Files.createTempDirectory("audit").resolve("t").toString
TxnLake.commit(spark, (0L until 100000L).map(i => (i, s"v$i")).toDF("k", "v").repartition(4), t, "append")
TxnLake.renameColumn(spark, t, "v", "val")
println("=== readWithRowIds plan ===")
TxnLake.readWithRowIds(spark, t).explain("formatted")
println("=== renamed readWhere plan (pushdown check) ===")
TxnLake.readWhere(spark, t, col("k") === 5L).explain("formatted")
spark.stop()
