"""spark-submit entry point: build the tile tree and run retrieval.

Ships the engine as a --py-files package (north rule):

    python scripts/make_pyfiles.py                       # -> dist/raptor_rag_spark.zip
    spark-submit --master local[8] \
        --py-files dist/raptor_rag_spark.zip \
        scripts/submit_job.py \
        --input /root/testdata/sf0.001/documents.parquet \
        --checkpoint /tmp/tree_ckpt --query "spark join data"

On a cluster, swap --master (YARN/k8s/standalone); the job is identical —
the engine has no local-mode assumptions beyond session defaults, which
spark-submit overrides via --conf.
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    p.add_argument("--checkpoint", default=None, help="tree checkpoint dir (resume-able)")
    p.add_argument("--query", action="append", default=[], help="retrieval query (repeatable)")
    p.add_argument("--max-tokens", type=int, default=64)
    p.add_argument("--num-layers", type=int, default=3)
    p.add_argument("--max-resolution", type=int, default=8)
    p.add_argument("--top-k", type=int, default=5)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from raptor_rag_spark.api import RetrievalAugmentation
    from raptor_rag_spark.config import ClusterTreeConfig

    spark = SparkSession.builder.appName("raptor-rag-spark-job").getOrCreate()
    docs = spark.read.parquet(args.input)
    ra = RetrievalAugmentation(
        spark,
        config=ClusterTreeConfig(
            max_tokens=args.max_tokens,
            num_layers=args.num_layers,
            max_resolution=args.max_resolution,
        ),
    )
    ra.add_documents(docs, checkpoint_dir=args.checkpoint)
    print(f"tree built: {ra.tree.count()} nodes across "
          f"{ra.tree.select('level').distinct().count()} levels")
    if args.query:
        out = ra.retrieve(list(args.query), top_k=args.top_k)
        for r in out.orderBy("query_id").collect():
            print(f"query {r['query_id']}: context[:120]={r['context'][:120]!r}")
    spark.stop()


if __name__ == "__main__":
    main()
