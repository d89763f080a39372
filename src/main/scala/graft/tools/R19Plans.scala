package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Round-19 optimization evidence: dump `.explain("formatted")` for the
  * plans the round changed, into plans/r19/<name>_{before,after}.txt.
  *
  * The curation-gate change lives INSIDE the foreachBatch sink (invisible
  * in any registered query's returned plan), so the curator frame is
  * dumped directly: `after` is the live `CurationStream.curateBatch`
  * output over a sample batch against an empty table (exactly the batch-0
  * path the profile flagged); `before` is the pre-r19 gate shape
  * reconstructed verbatim from commit 0260621 (unpinned gate + canon
  * groupBy + doc_id left-semi join — the plan whose gate subtree appears
  * twice and re-ran once more per downstream action).
  * Run: sbt "runMain graft.tools.R19Plans" */
object R19Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val out = Paths.get("/root/repo/plans/r19")
    Files.createDirectories(out)
    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(out.resolve(s"$name.txt"), plan)
      println(s"[r19plans] wrote $name (${plan.linesIterator.size} lines)")
    }
    val batch = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")

    // ---- x32-family curator (shared by x32/x33/x34/x37/x40/x42/x43/
    // x46/x47/x63/x64/x70): batch-0 shape -------------------------------
    // BEFORE (reconstructed from 0260621): gate inline, evaluated once
    // per consumer and TWICE inside this one plan (canon + probe side)
    import graft.functions.TextFunctions._
    val scrubbed = batch.select(col("doc_id"),
      regexp_replace(
        graft.expressions.TextExpressions.nfcNormalize(col("text")),
        graft.functions.TextFunctions.CtrlClassSpark, "").as("text"))
    val gatedOld = scrubbed
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("alpha_ratio",
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("double")
          / length(col("text")))
      .filter(col("n_tokens") >= 20 && col("alpha_ratio") >= 0.5
        && langId(col("toks")) =!= "und")
      .withColumn("fp", fingerprint(col("text")))
      .select("doc_id", "fp", "n_tokens", "text")
    val canonOld = gatedOld.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
    val curatorOld = gatedOld
      .join(canonOld.select("doc_id"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("fp"), col("n_tokens"),
        lit(0).cast("int").as("ingest_batch"))
    dump("x32_curator_before", curatorOld)

    // AFTER: the live path — gate pinned once; every downstream action
    // (this plan included) reads the checkpoint
    val tmp = Files.createTempDirectory("r19plans").toString
    val curatorNew = graft.streaming.CurationStream
      .curateBatch(batch, s"$tmp/t", 0L)
    dump("x32_curator_after", curatorNew)

    // The PIN job's own plan (what the one gate evaluation executes):
    // where does the spread exchange sit relative to the gate projection?
    val spreadGate = scrubbedOf(batch
        .repartition(spark.sparkContext.defaultParallelism))
    dump("x32_gate_pin_job", spreadGate)

    // ---- removeCoveredTokens (shared by d51/d53/x34/x42/x43/x47/x64/
    // x70): token-grain vs doc-grain excision -------------------------
    // BEFORE (reconstructed from b5f550e): posexplode -> (doc_id,pos)
    // join -> per-doc running-max window over TOKEN rows -> sorted
    // collect_list rebuild -> join back to docs
    import org.apache.spark.sql.expressions.Window
    val docsT = batch.select(col("doc_id"), tokens(col("text")).as("toks"))
    val spans = docsT.select(col("doc_id"), lit(3L).as("pos"),
      lit(7L).as("__end"))
    val tokRows = docsT.select(col("doc_id"),
        posexplode(col("toks")).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keptOld = tokRows.join(spans, Seq("doc_id", "pos"), "left")
      .withColumn("__reach", max(col("__end")).over(w))
      .filter(coalesce(col("__reach") > col("pos"), lit(false)) === false)
    val aggOld = keptOld.groupBy("doc_id")
      .agg(count(lit(1)).as("__n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("cleaned_text"))
    val beforeExcise = docsT
      .select(col("doc_id"), size(col("toks")).as("__n_toks"))
      .join(aggOld, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("__n_toks").cast("int").as("n_toks"),
        (col("__n_toks") - coalesce(col("__n_kept"), lit(0L))).cast("int")
          .as("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
    dump("d51_excise_before", beforeExcise)
    // AFTER: the live doc-grain path (span-grain groupBy + one join +
    // the ExciseCovered kernel)
    dump("d51_excise_after",
      graft.operators.SuffixArray.removeCoveredTokens(docsT, spans))

    spark.stop()
  }

  private def scrubbedOf(src: DataFrame): DataFrame = {
    import graft.functions.TextFunctions._
    src.select(col("doc_id"),
      regexp_replace(
        graft.expressions.TextExpressions.nfcNormalize(col("text")),
        graft.functions.TextFunctions.CtrlClassSpark, "").as("text"))
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("alpha_ratio",
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("double")
          / length(col("text")))
      .filter(col("n_tokens") >= 20 && col("alpha_ratio") >= 0.5
        && langId(col("toks")) =!= "und")
      .withColumn("fp", fingerprint(col("text")))
      .select("doc_id", "fp", "n_tokens", "text")
  }
}
