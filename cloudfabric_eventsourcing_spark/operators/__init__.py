"""Large-scale training-data pipeline operators (SURVEY.md §7 step 9).

These extend the engine beyond the reference's query surface with the
operations a 100 TB text/multimodal pipeline needs: deduplication families,
similarity search, text analysis, multimodal column plumbing. All hot paths
are built from JVM-side `pyspark.sql.functions` (whole-stage codegen);
Python appears only where Spark genuinely lacks the primitive (numpy bit
packing for simhash, matrix projection for hyperplane LSH) and then always
as Arrow-batched Pandas UDFs.
"""

from cloudfabric_eventsourcing_spark.operators import (
    behavior,
    bpe,
    classify,
    curation,
    dedup,
    graph,
    index_maintenance,
    multimodal,
    packing,
    sampling,
    similarity,
    skew,
    text,
    temporal,
)

__all__ = [
    "behavior",
    "bpe",
    "classify",
    "curation",
    "dedup",
    "graph",
    "index_maintenance",
    "similarity",
    "text",
    "multimodal",
    "packing",
    "temporal",
    "skew",
    "sampling",
]
