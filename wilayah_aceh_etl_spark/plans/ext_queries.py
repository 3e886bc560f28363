"""EXT training-data-pipeline operators (BASELINE.json:6 mandate).

Deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + LSH-bucketed),
multimodal binary-column plumbing, and text analysis — each with a
DuckDB oracle where the computation is deterministic and
SQL-expressible on both engines.
"""

from __future__ import annotations

# Queries registered in a follow-up commit.
