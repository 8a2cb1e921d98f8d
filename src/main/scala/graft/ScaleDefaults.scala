package graft

/**
 * Shared defaults for the one-box scale-probe mains (Throughput, the
 * `*Scale` harnesses). NOT used by Bench/Verify: the battery runs at
 * partitions == cores deliberately — that shape is the committed,
 * round-over-round-comparable artifact.
 */
object ScaleDefaults {

  /**
   * Shuffle partitions for scale probes: 4× cores, overridable via
   * `SPARK_GRAFT_SHUFFLE`.
   *
   * Why not partitions == cores (the pre-r13 default): per-task
   * aggregation/sort state scales with groups-per-partition, and the
   * 6-step 250M-row sequence probe measured a 1-in-3
   * UNABLE_TO_ACQUIRE_MEMORY flake at the default 8g heap with
   * partitions == cores that is 3/3 clean at 4× (BENCH.md §"Sequence at
   * reference scale", r12 margin note). Real clusters run partitions >>
   * cores for exactly this reason — the probes should default to the
   * shape whose memory story transfers to the 1000-executor target, not
   * the one that happens to minimize scheduling overhead on one box.
   */
  def shuffleParts(cpus: Int): Int =
    sys.env.get("SPARK_GRAFT_SHUFFLE").map(_.toInt).getOrElse(4 * cpus)
}
