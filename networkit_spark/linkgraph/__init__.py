"""Link-graph ingest (synthetic Iceberg-shaped source table → edges) and
the superstep execution core."""
