"""raptor_rag_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Recasts the reference RAPTOR pipeline (latentsp/raptor-rag, read-only at
/root/reference) as hierarchical geospatial tiling over web-page tables:

- web-page embeddings (vectorized Arrow UDFs) are reduced to 2D coordinates and
  indexed into hierarchical quadkey cells ("H3/S2-style") at successive
  resolutions; each coarser resolution level plays the role of a RAPTOR tree
  layer (reference: raptor/cluster_tree_builder.py:50-131),
- GMM soft-clustering (reference: raptor/cluster_utils.py:46-52) becomes soft
  multi-cell assignment with exact point-in-polygon tests against cell boundary
  polygons,
- collapsed-tree / tree-traversal retrieval (reference:
  raptor/tree_retriever.py:127-182) become cell-pruned broadcast kNN joins.

Everything is idiomatic PySpark DataFrame + vectorized pandas/Arrow UDFs; all
numeric kernels are from-scratch numpy (no umap/sklearn/scipy/faiss/tiktoken).
"""

__version__ = "0.1.0"
