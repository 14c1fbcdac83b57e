"""Source extension seam (reference §2.10: abstract ``API`` with
``parse_listing``/``parse_user``, ``api/api.py:5-32``).

In the batch engine a source is anything that yields a ``ray.data.Dataset``
of a known schema. Two implementations ship (table reader, comment reader);
plug in new ones (e.g. a real Lance scanner, a warehouse export) by
implementing the protocol.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import ray.data as rd


@runtime_checkable
class Source(Protocol):
    """A pluggable dataset source."""

    def dataset(self, **kwargs) -> rd.Dataset:  # pragma: no cover - protocol
        ...


class TableSource:
    """Reads one table path (Lance or Parquet) with column pruning."""

    def __init__(self, path, columns=None) -> None:
        self.path = path
        self.columns = columns

    def dataset(self, **kwargs) -> rd.Dataset:
        from .tables import read_table

        return read_table(self.path, columns=self.columns, **kwargs)


class CommentSource:
    """Comment-table reader with the reference's sort/limit/text_match
    semantics (see ``sources.comments``)."""

    def __init__(self, path, **opts) -> None:
        self.path = path
        self.opts = opts

    def dataset(self, **kwargs) -> rd.Dataset:
        from .comments import read_comments

        return read_comments(self.path, **{**self.opts, **kwargs})
