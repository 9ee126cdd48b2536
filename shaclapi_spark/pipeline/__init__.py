"""Training-data pipeline operators over the documents/embeddings tables.

Beyond the reference's own operator set (SURVEY.md §2): deduplication,
similarity search, text analysis, and multimodal-column plumbing — the ops a
100 TB training-data pipeline needs, built Spark-first (JVM expressions
everywhere; Arrow UDFs only where built-ins genuinely can't express the
semantics)."""
