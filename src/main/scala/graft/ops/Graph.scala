package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a DataFrame edge list — the
  * missing last stage of the dedup story: LSH candidate PAIRS become
  * duplicate CLUSTERS, and one canonical document per cluster survives.
  * (Reference surface reconstruction: postpy has no graph ops; this is a
  * north-star LLM-pipeline operator — near-dup dedup at corpus scale is
  * pair-generation → components → keep-one, per the standard MinHash-LSH
  * pipeline literature.)
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node takes the minimum label among
  * itself and its neighbors; at fixpoint all nodes of a component carry
  * the component's minimum id. Each round is ONE hash-shuffle join on id
  * plus a groupBy — fully distributed, no driver-side row data (the only
  * per-round action is a scalar changed-count). Lineage is truncated every
  * round with localCheckpoint so the plan stays O(1) deep regardless of
  * iteration count; on a real cluster with preemptible executors use
  * reliable checkpoint() instead. Superseded per-round checkpoint blocks
  * are dropped by reference: once a round's frame goes unreferenced,
  * Spark's ContextCleaner reclaims its blocks asynchronously (driver-GC
  * triggered), so storage stays bounded by the live frame, not the round
  * count.
  *
  * Scale shape: rounds = component DIAMETER, and near-dup clusters are
  * shallow (dozens of members, diameter a few hops), so 3-5 rounds settle
  * a 100 TB corpus. For adversarial path-shaped graphs switch to the
  * alternating large-star/small-star doubling scheme (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — same join
  * primitive, O(log²) rounds; not needed for the dedup workload this
  * serves.
  */
object Graph {

  /** Components of the undirected graph given by (src, dst) edge rows.
    * Returns (id, component) for every node that appears in an edge;
    * component = the minimum node id of the connected component.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    // Materialize the (possibly expensive) edge DAG ONCE before
    // symmetrizing — union(e, e.swapped) over an uncheckpointed frame
    // evaluates the upstream plan in both branches (exchange reuse only
    // recovers the shuffle stages, not the map-side work). A NULL
    // endpoint is dropped (it denotes "no edge", not a node — and the
    // recursive-CTE oracle would never reach it through a NULL join key).
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint()
    val sym = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // min neighbor label per node: one shuffle join + one partial-agg'd groupBy
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nbr_min"))
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
                least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint()
      changed = next.filter(col("label") =!= col("old_label")).count()
      labels = next.select(col("id"), col("label"))
      iter += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("id"), col("label").as("component"))
  }
}
