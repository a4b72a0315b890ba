"""Structured-Streaming surfaces of the engine.

The crawl itself is an iterative batch ("wave") job by design — BFS order
parity REQUIRES a barrier between waves (SURVEY §1.4/O11). What streams is
the telemetry: every wave appends parquet under <ckpt>/visited/wave=K/, which
is exactly a file-source stream. `visited_stream` tails it with readStream
and produces live per-wave/status aggregates; `run_to_memory` drives it to
completion synchronously for tests.
"""

from .telemetry import run_to_memory, visited_stream  # noqa: F401
