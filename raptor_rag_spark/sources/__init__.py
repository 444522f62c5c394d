"""Sources & sinks: testdata loaders, synthetic page generator, checkpoints."""
