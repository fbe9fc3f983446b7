"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication (exact, MinHash-LSH, SimHash, n-gram
Jaccard), similarity search (brute-force + LSH-bucketed ANN), text
analysis (tokens, quality, language-ID, fingerprints), and multimodal
column plumbing.

Spark-first: everything expressible with built-in functions stays JVM-side;
numpy/Arrow UDFs only for the hashing kernels Spark lacks.
"""
