"""Assembled signal pipelines (receiver, waterfall, GPS, decoders)."""
