"""PySpark-native analytics/pipeline engine with the query semantics of the
reference metadata-driven streaming-ETL stack (Kafka envelope -> typed views
-> XREF latest-by-key upsert snapshots -> FGAC refined joins/masking ->
quarantine anti-joins), plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design: everything is declared through the DataFrame / Spark SQL API so that
Catalyst performs predicate pushdown, column pruning, join planning and
whole-stage codegen.  Python touches row data only in the explicitly
Arrow-batched extension operators (multimodal decode stubs); every parity
operator stays JVM-side.
"""

__version__ = "0.1.0"
