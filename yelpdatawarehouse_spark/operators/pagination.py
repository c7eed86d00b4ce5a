"""Pagination envelope — the reference's LIMIT/OFFSET + total-count pattern
(webapp/mysql_routes.py:99,106-118,656-683) as one reusable operator.

The filtered/sorted DataFrame is evaluated twice (count + page); callers on
hot paths should pass a cached DataFrame. Total order must be deterministic:
callers supply sort keys that end in a unique key.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame


@dataclass
class Page:
    rows: list
    total: int
    page: int
    limit: int

    @property
    def pages(self) -> int:
        return math.ceil(self.total / self.limit) if self.limit else 0

    def as_dict(self) -> dict:
        return {
            "rows": [r.asDict() for r in self.rows],
            "pagination": {
                "total": self.total,
                "page": self.page,
                "limit": self.limit,
                "pages": self.pages,
            },
        }


def paginate(df: DataFrame, *order: Column, page: int = 1, limit: int = 20) -> Page:
    """Order → offset → limit, plus the total-count envelope."""
    total = df.count()
    rows = df.orderBy(*order).offset((page - 1) * limit).limit(limit).collect()
    return Page(rows=rows, total=total, page=page, limit=limit)
