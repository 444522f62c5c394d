"""Pure-python/numpy kernels (no Spark imports here).

These are the deterministic computational cores that the Spark layer wraps in
vectorized Arrow UDFs. Each kernel mirrors a reference behavior (cited in its
docstring) but is written from scratch for columnar/batched execution.
"""
