"""cloudfabric_eventsourcing_spark — a PySpark-native analytics engine with the
capabilities of Tech-Fabric/CloudFabric.EventSourcing.

Built from scratch on the public Apache Spark DataFrame/SQL/Structured
Streaming APIs. The reference (C#/.NET) is used only as a behavioral
specification; see SURVEY.md for the capability inventory and the
file:line citations kept in docstrings throughout this package.

Layout:
    queries/      Filter AST, ProjectionQuery, sv1_ query-string codec, DSL
    plans/        AST -> pyspark Column / DataFrame translation
    schema.py     ProjectionDocumentSchema <-> StructType
    eventstore/   append-only event store (parquet + in-memory backends)
    domain/       AggregateBase / AggregateRepository (event folds)
    projections/  projection builders, repositories, rebuild engine
    streaming/    Structured Streaming projection maintenance
    operators/    large-scale data-pipeline operators (dedup, ANN, text, multimodal)
    functions/    scalar helpers (hash-to-uuid, decimals, json)
"""

__version__ = "0.1.0"
