"""Structured Streaming surface.

The reference reserves a ``checkpoint_base`` for streaming but never
uses it (writer.py:18, sources.yaml:5 in /root/reference); this package
is the [EXT] realization: windowed aggregations shared between batch
and streaming (identical F.window/session_window plans), watermarked
late-data handling, stateful dedup, and a foreachBatch upsert sink that
reuses the batch HUB writer.
"""
