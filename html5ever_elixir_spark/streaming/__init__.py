"""Structured Streaming surface: continuous ingest of pages into the
extraction pipeline (the batch north-rule job is primary; this covers
the streaming-ingest deployment mode)."""
