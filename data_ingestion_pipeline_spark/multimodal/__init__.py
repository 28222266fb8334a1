"""Multimodal (image/audio/video) column plumbing with stubbed codecs."""
