"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN."""
