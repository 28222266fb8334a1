"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard."""
