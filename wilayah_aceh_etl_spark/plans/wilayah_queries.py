"""Reference-parity wilayah queries re-bound to the star schema.

The driver's correctness gate runs over the synthetic star tables,
so each reference operator (SURVEY §2) is exercised here on a
wilayah-shaped hierarchy DERIVED from region→nation→customer→orders:
the same dotted-code derivation rules (SURVEY §1.4 /
reference server.js:160-185), prefix fetches, search, status pivot,
length-dispatch and upsert semantics — just with star-schema keys as
the source material. The true GeoJSON ETL path is covered by
operators/wilayah.py + tests/ on the real reference corpus.
"""

from __future__ import annotations

# Queries registered in a follow-up commit.
