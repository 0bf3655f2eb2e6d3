"""A PySpark-native lakehouse engine with Write-Audit-Publish semantics.

Re-implements, Spark-first, the capabilities of the reference
``BauplanLabs/no-jvm-wap-with-iceberg`` (see /root/reference):

- an Iceberg-inspired table format (Parquet data files + versioned JSON
  metadata with per-file column statistics),
- a Nessie-inspired catalog with git-like branches over the lake
  (reference: ``src/serverless/pyiceberg_patch_nessie.py``),
- the Write-Audit-Publish pipeline (reference: ``src/serverless/app.py``),
- a declarative audit-check library (generalizing the reference's
  swappable quality check, ``src/serverless/app.py:182-232``),
- large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing) layered on the same engine.

All heavy data movement is expressed with the Spark DataFrame API so
Catalyst/Tungsten pick the physical plan; the catalog layer is small
driver-side metadata (exactly like Iceberg/Nessie, where metadata is
KBs while data is TBs).
"""

# Lazy re-export (PEP 562): this package __init__ runs inside every
# fresh Python worker that unpickles any of our classes; an eager
# session import pulls the full pyspark.sql chain before the worker
# has done any work. `get_spark` resolves on first access instead.
__all__ = ["get_spark"]
__version__ = "0.1.0"


def __getattr__(name: str):
    if name == "get_spark":
        from no_jvm_wap_with_iceberg_spark.session import get_spark

        return get_spark
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
