"""Change-event sources.

The engine's native log format is parquet/json files of
``CHANGE_EVENT_SCHEMA`` rows (schemas.py). This package adds adapters from
external CDC wire formats to that schema — the analogue of the reference
accepting NiFi FlowFile JSON batches as its ingest envelope
(ReorderFiles.kt:359-366) while the engine's core stays format-agnostic.
"""
