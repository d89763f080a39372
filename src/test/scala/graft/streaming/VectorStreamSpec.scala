package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.sources.TxnLake
import org.apache.spark.sql.functions._

/** [[VectorStream]]'s incremental cell-scoped SemDeDup gate — the
  * batch-grain decisions the x39 driver query exercises end to end,
  * pinned here on handcrafted vectors where every cosine is exact by
  * construction. */
class VectorStreamSpec extends SparkSpec {

  private def emb(id: Long, label: Int, v: Seq[Double]) =
    (id, v.map(_.toFloat) ++ Seq.fill(64 - v.size)(0.0f), label)

  test("arrivals near a committed cell-mate drop; far or cross-cell ones keep") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("vec_stream_spec").toString
    val table = s"$base/t"
    // committed corpus: e1 in cell 0, e2 (orthogonal to e1) in cell 1
    val corpus = Seq(
      emb(1L, 0, Seq(1.0, 0.0)),
      emb(2L, 1, Seq(0.0, 1.0))).toDF("vec_id", "embedding", "label")
    TxnLake.commitOnce(s, VectorStream.curateVecBatch(corpus, table, 0L),
      table, "append", "spec_vec", 0L)
    // batch 1 arrivals:
    //  10: same cell 0, cosine 1.0 to e1            -> dropped
    //  11: same cell 0, orthogonal to e1 (cos 0.0)  -> kept
    //  12: cell 1, cosine 1.0 to e1's DIRECTION but
    //      its cell-mate e2 is orthogonal            -> kept (cell-scoped!)
    val batch = Seq(
      emb(10L, 0, Seq(2.0, 0.0)),
      emb(11L, 0, Seq(0.0, 3.0)),
      emb(12L, 1, Seq(4.0, 0.0))).toDF("vec_id", "embedding", "label")
    val kept = VectorStream.curateVecBatch(batch, table, 1L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 12L), s"gate decisions: kept $kept")
  }

  test("a committed cell over maxCell skips the probe (mega-cell guard)") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("vec_stream_spec3").toString
    val table = s"$base/t"
    // two committed cell-mates in cell 0 — over a cap of 1
    val corpus = Seq(
      emb(1L, 0, Seq(1.0, 0.0)),
      emb(2L, 0, Seq(1.0, 0.1))).toDF("vec_id", "embedding", "label")
    TxnLake.commitOnce(s, VectorStream.curateVecBatch(corpus, table, 0L),
      table, "append", "spec_vec_cap", 0L)
    // an arrival identical to e1: dropped under the default cap, KEPT
    // (conservative) when the cell is over the cap
    val batch = Seq(emb(10L, 0, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding", "label")
    assert(VectorStream.curateVecBatch(batch, table, 1L).count() == 0)
    assert(VectorStream.curateVecBatch(batch, table, 1L, maxCell = 1)
      .count() == 1)
  }

  test("the probe scan prunes to the batch's cells at file grain") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("vec_stream_spec4").toString
    val table = s"$base/t"
    // founding corpus spans four labels; the label-range-clustered commit
    // writes files with tight label stats
    val corpus = (0 until 4).flatMap(l => Seq(
      emb(l * 10L, l, Seq(1.0, 0.0)),
      emb(l * 10L + 1, l, Seq(0.0, 1.0))))
      .toDF("vec_id", "embedding", "label")
    TxnLake.commitOnce(s, VectorStream.curateVecBatch(corpus, table, 0L),
      table, "append", "spec_vec_prune", 0L)
    val (_, total) = TxnLake.skippingStats(s, table, lit(true))
    assert(total >= 2, s"fixture needs a multi-file layout, got $total")
    // a delta touching ONE cell must scan fewer files than the table has
    val batch = Seq(emb(100L, 2, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding", "label")
    val kept = VectorStream.curateVecBatch(batch, table, 1L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.isEmpty, s"arrival 100 cosines 1.0 to cell-mate 20: $kept")
    val (probeKept, probeTotal) = VectorStream.lastProbeSkipping
    assert(probeTotal == total && probeKept < probeTotal,
      s"probe must skip untouched cells' files: $probeKept/$probeTotal")
  }

  test("a zero-norm embedding is kept, not a DIVIDE_BY_ZERO abort") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("vec_stream_spec5").toString
    val table = s"$base/t"
    val corpus = Seq(
      emb(1L, 0, Seq(1.0, 0.0)),
      emb(2L, 0, Seq(0.0))) // all-zero committed vector in the same cell
      .toDF("vec_id", "embedding", "label")
    TxnLake.commitOnce(s, VectorStream.curateVecBatch(corpus, table, 0L),
      table, "append", "spec_vec_zero", 0L)
    // one all-zero arrival (cosine undefined vs everything -> NULL ->
    // kept), one near-dup of e1 (still dropped despite the degenerate
    // cell-mate also being probed)
    val batch = Seq(
      emb(10L, 0, Seq(0.0)),
      emb(11L, 0, Seq(2.0, 0.0))).toDF("vec_id", "embedding", "label")
    val kept = VectorStream.curateVecBatch(batch, table, 1L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L), s"NULL-cosine row must be kept: $kept")
  }

  test("the first batch founds the corpus ungated") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("vec_stream_spec2").toString
    // two IDENTICAL vectors in one founding batch: within-batch near-dups
    // are NOT collapsed (d32's batch job — orthogonal gates)
    val batch = Seq(
      emb(1L, 0, Seq(1.0, 0.0)),
      emb(2L, 0, Seq(1.0, 0.0))).toDF("vec_id", "embedding", "label")
    val out = VectorStream.curateVecBatch(batch, s"$base/t", 0L)
    assert(out.count() == 2)
    assert(out.columns.toSeq ==
      Seq("vec_id", "embedding", "label", "ingest_batch"))
  }
}
