"""Sources/sinks: Parquet/Lance readers for the interleaved documents
table and adapters from flat text tables."""
