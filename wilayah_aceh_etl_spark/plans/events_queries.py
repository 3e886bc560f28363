"""Event-stream analytics (batch semantics of the streaming ops).

SURVEY §2.11 declares streaming absent in the reference; the engine
adds tumbling/sliding/session windows, watermark policy and stateful
dedup (wilayah_aceh_etl_spark/streaming/). Each batch-equivalent
query here is oracle-checked; the streaming twins are pytest-covered.
"""

from __future__ import annotations

# Queries registered in a follow-up commit.
