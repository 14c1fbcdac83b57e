"""Comment-table source analogs of the reference's readers (S1-S5).

The reference pulls 5-field comment records from Reddit (HTTP/PRAW) with
server-side sort, limit, and text-search (``api/scraper.py:23-119``,
``api/reddit.py:155-191, 299-345, 348-415``). In the batch engine the same
record shape lives in a table ``(id, text, upvotes, downvotes, permalink)``
and the source semantics become scan + filter + sort + limit pushed onto a
Dataset:

  * ``sort="new"``   — input order (reference: listing order)
  * ``sort="top"``   — upvotes descending
  * ``sort="controversial"`` — downvotes descending
  * ``sort="hot"``   — (upvotes - downvotes) descending ("score")
  * ``limit``: 0 = unlimited (reference ``sentiment.py:56-58``)
  * ``text_match``: case-insensitive substring keep (F4)
  * ``time_filter``: "all" | "hour" | "day" | "week" | "month" | "year" —
    keep comments whose ``created_utc`` falls inside the trailing window
    (reference ``api/reddit.py:348-382`` ``time_filter``/``t=`` param and
    config key ``time``, ``cli_config.py:19-25``). ``now`` anchors the
    window explicitly so runs are deterministic/reproducible.

The normalize step (F1, whitespace collapse + zero-width-entity strip +
drop empty bodies) matches the readers' record cleanup
(``api/scraper.py:56-66``).
"""

from __future__ import annotations

import datetime as _dt
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.textnorm import normalize_array
from .tables import read_table

COMMENT_COLUMNS = ["id", "text", "upvotes", "downvotes", "permalink"]

TIME_WINDOWS: dict[str, _dt.timedelta] = {
    "hour": _dt.timedelta(hours=1),
    "day": _dt.timedelta(days=1),
    "week": _dt.timedelta(weeks=1),
    "month": _dt.timedelta(days=30),
    "year": _dt.timedelta(days=365),
}


def read_comments(
    path,
    limit: int = 100,
    sort: str = "new",
    text_match: Optional[str] = None,
    time_filter: str = "all",
    now: Optional[_dt.datetime] = None,
    ts_col: str = "created_utc",
) -> rd.Dataset:
    """S1-S5 analog: read + (time window) + normalize + (filter) + sort +
    limit."""
    if time_filter not in ("all", *TIME_WINDOWS):
        raise ValueError(
            f"time_filter must be one of all/{'/'.join(TIME_WINDOWS)},"
            f" got {time_filter!r}"
        )
    columns = COMMENT_COLUMNS
    filter_expr = None
    if time_filter != "all":
        if now is None:
            raise ValueError("time_filter requires an explicit 'now' anchor")
        import pyarrow.dataset as pads

        from .tables import coerce_anchor

        cutoff = coerce_anchor(now, path, ts_col) - TIME_WINDOWS[time_filter]
        # pushed to the parquet scan: qualifying row groups only
        filter_expr = pads.field(ts_col) >= pa.scalar(cutoff)
        columns = COMMENT_COLUMNS + [ts_col]
    ds = read_table(path, columns=columns, filter_expr=filter_expr)
    if time_filter != "all":
        # the window column was only needed by the scan predicate; the
        # record shape stays the reference's 5 fields
        ds = ds.drop_columns([ts_col])

    def clean(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"])
        t = t.set_column(t.schema.get_field_index("text"), "text", norm)
        t = t.filter(pc.not_equal(t["text"], pa.scalar("")))
        if text_match:
            t = t.filter(pc.match_substring(t["text"], text_match, ignore_case=True))
        return t

    ds = ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)
    if sort == "top":
        ds = ds.sort(["upvotes", "id"], descending=[True, False])
    elif sort == "controversial":
        ds = ds.sort(["downvotes", "id"], descending=[True, False])
    elif sort == "hot":
        ds = ds.map_batches(
            lambda t: t.append_column(
                "score", pc.subtract(t["upvotes"], t["downvotes"])
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sort(["score", "id"], descending=[True, False]).drop_columns(["score"])
    # "new": preserve input order (no sort)
    if limit:
        ds = ds.limit(limit)
    return ds
