"""MitoScape-parity domain query registry (filled in incrementally)."""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
