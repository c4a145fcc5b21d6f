"""Spark operators: detect/convert (pandas-UDF stages), triple extraction
(JVM regex), entity linking (MinHash/LSH as DataFrame ops), connected
components (iterative joins), canonicalization, plus the training-data
operators (dedup, similarity search, text analysis, multimodal plumbing)."""
