"""spark-submit job: term embeddings with a REAL sentence encoder.

Proves the one-expression model swap documented in
``pyobo_spark/operators/embeddings.py`` (the reference loads
sentence-transformers/all-MiniLM-L6-v2 once behind @lru_cache,
``src/pyobo/api/embedding.py:117-118``): the ONLY difference between
the deterministic stand-in path and a production run is the loader
passed to :func:`cached_encoder` — the Spark plan, Arrow batching, and
per-worker weight caching are identical.

This sandbox has no model libraries, so the job resolves its encoder in
order:
1. ``sentence_transformers`` (if installed: the reference's MiniLM),
2. any module named by $PYOBO_SPARK_ENCODER as ``module:factory``
   (factory() -> callable(list[str]) -> ndarray (n, dim)),
3. the built-in deterministic numpy stand-in (still exercising the
   same cached_encoder machinery).

Usage:
  spark-submit --master 'local[8]' jobs/embed_real_model_job.py \
      [sf_dir=/root/testdata/sf0.001] [out=/tmp/term_embeddings] [dim=384]

On a cluster, add ``--py-files dist/pyobo_spark.zip`` (built by
build_pyfiles.sh) so executor Python workers can import the package.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def resolve_loader(dim: int | None):
    """Returns (loader, source_name, dim). ``loader`` is a zero-arg
    callable building the encoder — passed to cached_encoder so the
    weights load once per Python worker regardless of task count.

    ``dim=None`` means "the encoder's native width": MiniLM is 384-wide
    regardless of any requested dim (term_embeddings validates the
    model's output shape against dim, so advertising anything else
    would fail the job), the stand-in defaults to 8."""
    try:
        import sentence_transformers  # noqa: F401

        def loader():
            from sentence_transformers import SentenceTransformer

            m = SentenceTransformer("sentence-transformers/all-MiniLM-L6-v2")

            def enc(texts):
                return m.encode(texts, convert_to_numpy=True)

            return enc

        return loader, "sentence-transformers/all-MiniLM-L6-v2", 384
    except ImportError:
        pass

    spec = os.environ.get("PYOBO_SPARK_ENCODER")
    if spec:
        if dim is None:
            raise SystemExit(
                "PYOBO_SPARK_ENCODER is set: pass dim=<encoder width> "
                "(term_embeddings validates the model's output shape)"
            )
        mod_name, factory = spec.split(":")

        def loader():
            import importlib

            return getattr(importlib.import_module(mod_name), factory)()

        return loader, spec, dim

    dim = 8 if dim is None else dim

    def loader():
        from pyobo_spark.operators.embeddings import numpy_hash_model

        return numpy_hash_model(dim)

    return loader, "numpy_hash_model (deterministic stand-in)", dim


def main() -> None:
    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    sf_dir = args.get("sf_dir", "/root/testdata/sf0.001")
    out = args.get("out", "/tmp/term_embeddings")
    dim = int(args["dim"]) if "dim" in args else None

    from pyspark.sql import SparkSession

    from pyobo_spark.operators.embeddings import cached_encoder, term_embeddings
    from pyobo_spark.sources import tpch_adapter as tp

    spark = SparkSession.builder.appName("embed_real_model").getOrCreate()
    loader, source, dim = resolve_loader(dim)
    print(f"encoder: {source} (dim={dim})", file=sys.stderr)

    terms = tp.terms(spark, sf_dir)
    df = term_embeddings(
        terms, dim=dim, model=cached_encoder(loader, key=f"job-{source}-{dim}")
    )
    df.write.mode("overwrite").parquet(out)
    print(f"wrote {spark.read.parquet(out).count()} embeddings to {out}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
