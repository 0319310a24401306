"""Training-data pipeline functions: dedup, similarity search, text analysis,
multimodal plumbing — the large-scale corpus operations layered on the same
Spark-first engine (see each module's docstring for the scale design)."""
