"""Pure (non-Ray) vectorizable functions: stemming, normalization keys,
text analytics. Everything here is deterministic and picklable so it can
run inside ``map_batches`` tasks and actors."""
