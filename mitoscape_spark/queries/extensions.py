"""E-series / training-data-pipeline query registry (filled in incrementally)."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
