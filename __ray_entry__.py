"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.
Neither this module nor the library calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship quality-filter pipeline over sf0.001 documents: normalize ->
    fused Scorer actor pool (sentiment/PII/gate/langid/ppl/keep/scrub)."""
    from reddacted_ray.pipelines.quality_filter import build_docs

    return build_docs("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (+ graft additions: dedup family, ANN, text analysis, windowed agg)."""
    from reddacted_ray.pipelines.queries import registry

    return registry()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per SQL-expressible query. Rows-only queries
    (model-based sentiment/perplexity, MinHash/SimHash/embedding dedup,
    the synthetic-image flagship) are intentionally absent."""
    from reddacted_ray.pipelines.queries import oracle_sqls

    return oracle_sqls()
