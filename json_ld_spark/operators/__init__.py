"""Training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine), similarity search (brute-force + LSH),
text analysis (tokens / quality / language-ID / fingerprints), multimodal
plumbing, and skew-aware aggregation."""
