"""Column-level function library: text statistics, quality scoring,
fingerprinting, language-ID — the per-document metrics a training-data
pipeline computes at ingest. Spark expressions are JVM-side; the paired
DuckDB SQL fragments exist so the driver's oracle can verify them."""
