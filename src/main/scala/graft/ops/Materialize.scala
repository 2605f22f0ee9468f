package graft.ops

import org.apache.spark.sql.DataFrame

/** Eager materialization point for a BOUNDED derived frame that more than
  * one downstream branch consumes (quantile cutoffs, bucket offsets,
  * fingerprint streams, count tables). Without it every consumer branch
  * re-plans — and re-executes — the whole upstream subtree, which is
  * exponential in chain depth for composed pipelines (the r20 plan audit
  * measured d_pipeline_pack re-planning its documents scan 12× in one
  * plan).
  *
  * `spark.graft.materialize=false` turns it into the identity: the
  * plan-shape test suite pins the derived frames' LOGICAL structure
  * (aggregate-fed single-partition offsets windows, guards riding the
  * broadcast side), which a materialized `Scan ExistingRDD` would hide
  * from the inspected plan. Bench/production run with it ON (default) —
  * the pinned structure executes unchanged inside the checkpoint's own
  * job. Unconditional checkpoints (loop lineage truncation, frames shared
  * across separately-submitted jobs) stay plain `.localCheckpoint()`.
  */
private[graft] object Materialize {
  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materialized: DataFrame =
      if (df.sparkSession.conf.getOption("spark.graft.materialize")
          .exists(_.equalsIgnoreCase("false"))) df
      else df.localCheckpoint()
  }
}
