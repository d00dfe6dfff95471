"""Structured Streaming surface (SURVEY.md §2.10).

The reference's incremental model is queues + 5-second staging flushes
(Server/__init__.py:48-56); its Spark expression is:

- events_stream:  event-time analytics as real streams — watermarked
  tumbling/sliding windows, session windows, stateful dedup. Each
  builder mirrors a batch operator in operators/events.py; with
  trigger(availableNow) over the same input the results agree (tested).
- crawl_stream:   the continuous crawl loop as a rate-source +
  foreachBatch driver around Engine.crawl_once/hash_once — the
  reference's server loop with checkpointed restarts instead of claim
  resets (O10).
"""

from . import crawl_stream, events_stream  # noqa: F401
