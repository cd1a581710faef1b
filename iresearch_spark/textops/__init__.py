"""Large-scale training-data operators over the corpus tables.

First-class components alongside the index engine (SURVEY.md §2):
deduplication (exact / MinHash-LSH / SimHash / shingle-Jaccard),
embedding similarity search (brute-force + hyperplane-LSH ANN), text
analysis (token stats, quality scoring, language markers, winnowing
fingerprints) and multimodal binary-column plumbing. Every operator is
stock DataFrame / JVM expression code — no Python on the hot path —
and each has a DuckDB-oracle twin generated from the same frozen spec
(`iresearch_spark.textops.sqlgen`)."""
