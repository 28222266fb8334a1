"""Structured Streaming: file-source ingestion, watermarked windows, dedup."""
