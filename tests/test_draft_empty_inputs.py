"""Empty-input robustness for the DRAFT layer — the same zero-row sweep
test_empty_inputs.py runs over the registry, applied before registration
(see that module's docstring for why empty input is a production path,
not a corner case, at 100 TB)."""

from __future__ import annotations

from tests.test_empty_inputs import empty_sf_dir  # noqa: F401 (fixture)
from yelpdatawarehouse_spark.queries.draft_layer import all_drafts

DRAFTS = all_drafts()


def test_every_draft_survives_empty_input(spark, empty_sf_dir):  # noqa: F811
    failures = []
    for name, (fn, _) in sorted(DRAFTS.items()):
        try:
            rows = fn(spark, empty_sf_dir).collect()
            assert isinstance(rows, list)
        except Exception as e:  # noqa: BLE001 — collecting a full report
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)
