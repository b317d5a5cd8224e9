"""Enrichment-lookup operator: the Spark form of the reference's
per-event HTTP point queries (get_editcount scanner.py:199-218,
get_text scanner.py:178-196).

The preferred form is a dimension-table join (scanner.scan does that).
This module is the *lookup-function* form for when no dimension table
exists: an Arrow-batched ``mapInPandas`` stage that

- deduplicates keys within each batch (each user/revid fetched once
  per batch — the reference re-fetches per event);
- calls a pluggable ``fetch(keys) -> dict`` (pooled HTTP session in
  production; injected fake in tests — no network in this
  environment);
- maps failures to NULL instead of failing the query (C1 semantics:
  QueryRaceCondition => skip, scanner.py:78-81); callers filter
  ``isNotNull`` to drop, or keep for side-channel inspection.

Placement matters: Catalyst does not cost Python stages, so callers
must put this AFTER the cheap filters, like the reference's manual
cheap-before-expensive order (scanner.py:131-141, SURVEY.md §4.1).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def lookup_enrich(
    df: DataFrame,
    key_col: str,
    out_col: str,
    out_type: str,
    fetch: Callable[[list[Any]], dict[Any, Any]],
) -> DataFrame:
    """Append ``out_col`` by batch-looking-up ``key_col``.

    ``fetch`` receives the batch's *distinct* keys and returns
    {key: value}; missing keys and raised per-batch exceptions become
    NULL (never a query failure).
    """
    schema = ", ".join(
        [f"{name} {dtype}" for name, dtype in df.dtypes] + [f"{out_col} {out_type}"]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = pdf[key_col].dropna().unique().tolist()
            try:
                values = fetch(keys) or {}
            except Exception:
                values = {}
            yield pdf.assign(**{out_col: pdf[key_col].map(values)})

    return df.mapInPandas(op, schema=schema)


def http_json_fetcher(
    url_template: str, extract: Callable[[Any], Any], timeout: float = 10.0
) -> Callable[[list[Any]], dict[Any, Any]]:
    """Production fetcher: pooled-session HTTP GET per distinct key.

    Mirrors the reference's API shape (one GET per key,
    scanner.py:192,214) but with connection reuse and batch-level key
    dedup.  Gated behind an import-try: requests may be absent and no
    network exists in the test environment.
    """
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("requests not available in this environment") from e

    session = requests.Session()

    def fetch(keys: list[Any]) -> dict[Any, Any]:
        out: dict[Any, Any] = {}
        for k in keys:
            try:
                resp = session.get(url_template.format(key=k), timeout=timeout)
                out[k] = extract(resp.json())
            except Exception:
                out[k] = None  # C1: per-record containment
        return out

    return fetch
