"""Training-data pipeline functions: text analysis, deduplication,
similarity search, multimodal plumbing.

All hot paths are JVM-side ``pyspark.sql.functions`` expressions
(whole-stage codegen); Python appears only in Arrow-batched pandas UDFs
where built-ins cannot express the semantics (winnowing fingerprints,
vectorized ANN re-ranking)."""
