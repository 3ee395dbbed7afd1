"""Training-data-pipeline operators beyond the reference's inventory:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (lang-ID, quality, token counts, fingerprints), and
multimodal binary-column plumbing."""
