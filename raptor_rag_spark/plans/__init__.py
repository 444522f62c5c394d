"""Driver-side plans: the level loop (tree build) and the benchmark pipeline."""
