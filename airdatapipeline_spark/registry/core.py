"""Registry core: the QUERIES/ORACLES dicts and the @register decorator
every family module feeds (split out of the monolithic registry.py in r6;
behavior unchanged).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}
# query -> registry module basename ("text", "simsearch", ...): the seam
# tools/quick_gate.py uses to map a changed file to the parity subset it
# must re-prove (VERDICT-r11 item 8)
QUERY_MODULE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        QUERY_MODULE[name] = fn.__module__.rsplit(".", 1)[-1]
        return fn

    return deco
