package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimum-label propagation connected components over an undirected edge
  * list — the canonical last step of near-duplicate detection: pair edges
  * (A~B, B~C) collapse into clusters so one canonical document survives
  * per component, not merely per pair.
  *
  * Pregel-style supersteps: every node starts labeled with its own id;
  * each round every node takes the min of its label and its neighbors'
  * labels; stop when a round changes nothing. Each superstep is a
  * distributed join+aggregate (shuffled on node id); the only driver-side
  * value per round is the scalar converged-check. `localCheckpoint`
  * truncates the growing lineage so round N doesn't replay rounds 1..N-1.
  * Rounds needed = graph diameter in label-hops (≤ log for typical dedup
  * graphs of small dense clusters).
  */
object ConnectedComponents {

  /** Components of the undirected graph given by (src, dst) pairs.
    * Returns one row per node: (id, cluster_id) where cluster_id is the
    * smallest node id in the component — a deterministic canonical
    * representative. */
  def components(pairs: DataFrame, src: String = "src", dst: String = "dst"): DataFrame = {
    val fwd = pairs.select(col(src).as("e_src"), col(dst).as("e_dst"))
    val edges = fwd
      .union(fwd.select(col("e_dst").as("e_src"), col("e_src").as("e_dst")))
      .distinct()
      .cache() // probed every superstep
    var labels = edges.select(col("e_src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges
        .join(labels.select(col("id").as("e_src"), col("lbl")), Seq("e_src"))
        .groupBy(col("e_dst").as("id"))
        .agg(min(col("lbl")).as("nbr_lbl"))
      val step = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("lbl"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("new_lbl"))
        .localCheckpoint()
      changed = step.filter(col("new_lbl") < col("lbl")).count()
      labels = step.select(col("id"), col("new_lbl").as("lbl"))
    }
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }
}
