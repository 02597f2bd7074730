package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization policy for CORPUS-SIZED intermediate relations (the
  * hashed shingle relation, candidate-edge inputs — anything O(total
  * tokens)). Small reused relations keep plain `localCheckpoint()`;
  * big ones route through [[bigRel]], whose storage level is
  * `spark.graft.bigRelStorage`:
  *
  *  - `disk` (default): `localCheckpoint` at `DISK_ONLY`. The r14
  *    third-decade root-cause probe (SURVEY §6.1) measured the
  *    deserialized default storing a 2 GB / 26M-row shingle relation in
  *    145 s of near-SERIAL wall (putIterator unroll-accounting under the
  *    memory-manager lock across 14 tasks) and then dragging ~200 s of
  *    GC across the key's downstream stages (24 GB heap): deserialized
  *    row objects are exactly the wrong resident for a relation that is
  *    written once and scanned three times. DISK_ONLY streams
  *    serialized blocks out without unroll accounting, reads back at
  *    page-cache speed, and holds ZERO heap residency — the same
  *    posture a 100 TB executor wants for once-per-job intermediates
  *    whose storage memory is better spent on shuffle/agg state.
  *  - `memser`: `MEMORY_AND_DISK_SER` — serialized heap blocks (packed
  *    bytes, no per-row objects), spill past storage-pool pressure.
  *  - `mem`: the pre-r14 behavior (deserialized MEMORY_AND_DISK) — kept
  *    as the control arm of the scaling experiment.
  *  - `none`: no materialization — every consumer recomputes the
  *    subtree (the right choice when recompute is cheaper than a
  *    round-trip, e.g. a projection-only lineage).
  *
  * Results are storage-level-invariant; only wall clock and memory
  * posture move. The knob exists so the §6.1 experiments are one conf
  * away from any variant, on any corpus.
  */
object Mat {

  def bigRel(df: DataFrame): DataFrame =
    df.sparkSession.conf
      .getOption("spark.graft.bigRelStorage").getOrElse("disk") match {
      case "none"   => df
      case "mem"    => df.localCheckpoint()
      case "memser" =>
        df.localCheckpoint(eager = true,
                           storageLevel = StorageLevel.MEMORY_AND_DISK_SER)
      case _        =>
        df.localCheckpoint(eager = true,
                           storageLevel = StorageLevel.DISK_ONLY)
    }
}
