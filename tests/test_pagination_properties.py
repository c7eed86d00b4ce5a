"""Property-based model twin for operators/pagination.fetch_page: on random
frames, random mixed-direction order specs, and random page sizes, every
strategy must reproduce the Python-sorted reference pagination exactly —
the strategy (wide offset / deferred join / cursor seek) is a performance
choice, never a semantics choice."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from yelpdatawarehouse_spark.operators.pagination import fetch_page

_rows = st.lists(
    st.tuples(
        # NULLs mixed in (ADVICE r7): Spark sorts asc NULLS FIRST / desc
        # NULLS LAST, and the seek predicate must keep iterating through
        # (and past) cursor rows carrying NULL key values.
        st.one_of(st.none(), st.integers(min_value=0, max_value=5)),  # v
        st.one_of(st.none(), st.integers(min_value=0, max_value=3)),  # w
    ),
    min_size=1,
    max_size=30,
)


def _colkey(val, direction):
    """Python sort key matching Spark's default null ordering."""
    if direction == "asc":  # NULLS FIRST
        return (val is not None, val if val is not None else 0)
    return (val is None, -val if val is not None else 0)  # desc: NULLS LAST


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=_rows,
    v_dir=st.sampled_from(["asc", "desc"]),
    w_dir=st.sampled_from(["asc", "desc"]),
    limit=st.integers(min_value=1, max_value=7),
)
def test_all_strategies_match_python_model(spark, rows, v_dir, w_dir, limit):
    data = [(v, w, i) for i, (v, w) in enumerate(rows)]  # id = unique key
    df = spark.createDataFrame(data, "v int, w int, id int")
    order = [("v", v_dir), ("w", w_dir), ("id", "asc")]

    def key(t):
        return (_colkey(t[0], v_dir), _colkey(t[1], w_dir), t[2])

    model = sorted(data, key=key)
    n_pages = (len(data) + limit - 1) // limit
    cursor = None
    for page in range(1, n_pages + 1):
        want = [t[2] for t in model[(page - 1) * limit : page * limit]]
        for strategy in ("offset", "jump", "seek"):
            if strategy == "offset":
                got_df, env = fetch_page(df, order, page, limit, use_offset=True)
            elif strategy == "jump":
                got_df, env = fetch_page(df, order, page, limit)
            else:
                # cursor iteration skips the COUNT scan (ADVICE r7)
                got_df, env = fetch_page(
                    df, order, page, limit, cursor=cursor, with_total=False
                )
            got = [r.id for r in got_df.collect()]
            assert got == want, (strategy, page, order)
            if strategy == "seek":
                assert env["total"] is None and env["pages"] is None
            else:
                assert env["total"] == len(data)
        # derive the next cursor from the MODEL (independent of Spark),
        # so the seek strategy is checked against a reference cursor
        last = model[min(page * limit, len(model)) - 1]
        cursor = {"v": last[0], "w": last[1], "id": last[2]}
