"""Structured Streaming layer (SURVEY.md §2.10 stretch).

The reference has no streaming operators — its "events" are S3
notifications chained through Lambda/EventBridge (ref
lambda/ingestion_trigger/handler.py:328+, pipeline_orchestrator). This
package replaces that orchestration idiom natively: a file-source
stream on the bronze landing path with ``trigger(availableNow=True)``
(process-everything-then-stop, the batch-friendly trigger), and
watermarked windowed aggregation for late events.
"""
