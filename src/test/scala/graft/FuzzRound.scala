package graft

/**
 * Round-rotated fuzz seeding. Every fuzz family derives its default seed
 * from the build-round counter below, so each round's committed run
 * explores a DISTINCT deterministic slice of the configuration space
 * instead of re-running round 7's seed forever — coverage accumulates
 * across rounds while any failure stays reproducible (the failing seed is
 * printed by the assertion and can be replayed via GRAFT_FUZZ_SEED).
 * Policy: bump [[Round]] once per build round; never reuse a value. Any
 * divergence a new seed uncovers gets a PINNED regression case (explicit
 * seed) in the relevant spec before the fix lands.
 */
object FuzzRound {
  /** Build-round counter — bump once per round. */
  val Round = 18

  /** Default seed for a fuzz family; families add small offsets per test. */
  val seed: Long = 20260800L + Round * 1000003L
}
