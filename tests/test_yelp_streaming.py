"""Yelp streaming consumer tests: T1 demux, T2 dim upsert, T3 idempotent
fact append (cross-batch duplicate events are no-ops), T4/T5 additive summary
maintenance, and the batch/stream convergence invariant (SURVEY.md §5.5):
after any event sequence, the maintained summary equals the batch rebuild
over (initial ∪ streamed) facts."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from yelpdatawarehouse_spark.sources.etl import business_summary
from yelpdatawarehouse_spark.streaming.yelp_consumer import (
    YelpStreamApplier,
    yelp_event_file_stream,
)


def _ev(topic, **kw):
    return {"topic": topic, **kw}


BATCH1 = [
    _ev("yelp-reviews", review_id="r7", business_id="b4", user_id="u1", stars=4,
        date="2023-05-01T12:00:00", text="streamed", useful=0, funny=0, cool=0),
    # duplicate of an EXISTING review — must be a no-op (exactly-once effect)
    _ev("yelp-reviews", review_id="r1", business_id="b1", user_id="u1", stars=5,
        date="2019-01-15T08:00:00", text="replayed", useful=1, funny=0, cool=0),
    _ev("yelp-businesses", business_id="b5", name="Stream Biz", city="Springfield",
        state="IL", postal_code="62701", stars=3.5, review_count=0, is_open=1),
    _ev("yelp-users", user_id="u4", name="Dee", review_count=0,
        yelping_since="2023-01-01", fans=0, average_stars=0.0),
    _ev("yelp-checkins", business_id="b5", date="2023-05-02T18:00:00", count=3),
]

BATCH2 = [
    # duplicate of a review streamed in the PREVIOUS batch — still a no-op
    _ev("yelp-reviews", review_id="r7", business_id="b4", user_id="u1", stars=4,
        date="2023-05-01T12:00:00", text="replayed again", useful=0, funny=0, cool=0),
    _ev("yelp-reviews", review_id="r8", business_id="b5", user_id="u4", stars=2,
        date="2023-05-03T09:00:00", text="new", useful=0, funny=0, cool=0),
    _ev("yelp-checkins", business_id="b1", date="2023-05-04T10:30:00", count=1),
    # re-announcement of an existing business — dim upsert must not duplicate
    _ev("yelp-businesses", business_id="b1", name="Cafe One", city="Springfield",
        state="IL", postal_code="62701", stars=4.5, review_count=10, is_open=1),
]


@pytest.fixture(scope="module")
def applied(spark, wh, tmp_path_factory):
    whd = str(tmp_path_factory.mktemp("stream_wh"))
    src = str(tmp_path_factory.mktemp("stream_src"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))

    # seed the warehouse from the batch ETL fixture
    for t in ("fact_review", "fact_checkin", "dim_business", "dim_user"):
        wh[t].write.mode("overwrite").parquet(os.path.join(whd, t))
    seed = (
        wh["fact_review"]
        .groupBy("business_id")
        .agg(
            F.count("*").cast("long").alias("total_reviews"),
            F.sum("stars").cast("double").alias("stars_sum"),
            F.lit(0).cast("long").alias("total_checkins"),
            F.lit(0).cast("long").alias("total_tips"),
        )
        .unionByName(
            wh["fact_checkin"].groupBy("business_id").agg(
                F.lit(0).cast("long").alias("total_reviews"),
                F.lit(0.0).alias("stars_sum"),
                F.sum("checkin_count").cast("long").alias("total_checkins"),
                F.lit(0).cast("long").alias("total_tips"),
            )
        )
        .unionByName(
            wh["fact_tip"].groupBy("business_id").agg(
                F.lit(0).cast("long").alias("total_reviews"),
                F.lit(0.0).alias("stars_sum"),
                F.lit(0).cast("long").alias("total_checkins"),
                F.count("*").cast("long").alias("total_tips"),
            )
        )
        .groupBy("business_id")
        .agg(*[F.sum(c).alias(c) for c in
               ("total_reviews", "stars_sum", "total_checkins", "total_tips")])
    )
    seed.write.mode("overwrite").parquet(os.path.join(whd, "summary_state"))

    # two micro-batches (maxFilesPerTrigger=1 → processed in order)
    for i, batch in enumerate([BATCH1, BATCH2]):
        with open(os.path.join(src, f"batch_{i}.json"), "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")

    applier = YelpStreamApplier(spark, whd)
    q = applier.start(yelp_event_file_stream(spark, src), ckpt)
    q.awaitTermination(120)
    return applier, whd


def test_idempotent_fact_append(spark, applied):
    _, whd = applied
    fr = spark.read.parquet(os.path.join(whd, "fact_review"))
    ids = [r.review_id for r in fr.collect()]
    assert sorted(ids) == ["r1", "r2", "r4", "r5", "r6", "r7", "r8"]  # no dups
    r1 = fr.filter(F.col("review_id") == "r1").collect()
    assert len(r1) == 1 and r1[0].text == "great"  # original kept, replay dropped


def test_dim_upsert_no_duplicates(spark, applied):
    _, whd = applied
    biz = spark.read.parquet(os.path.join(whd, "dim_business"))
    assert biz.filter(F.col("business_id") == "b1").count() == 1
    assert biz.filter(F.col("business_id") == "b5").count() == 1
    usr = spark.read.parquet(os.path.join(whd, "dim_user"))
    assert usr.filter(F.col("user_id") == "u4").count() == 1


def test_stream_batch_convergence(spark, wh, applied):
    applier, whd = applied
    final_reviews = spark.read.parquet(os.path.join(whd, "fact_review"))
    final_checkins = spark.read.parquet(os.path.join(whd, "fact_checkin"))
    final_biz = spark.read.parquet(os.path.join(whd, "dim_business"))
    expected = business_summary(
        final_biz.select("business_id", "stars"),
        final_reviews,
        final_checkins,
        wh["fact_tip"],
    )
    got = {r.business_id: r for r in applier.summary().collect()}
    want = {r.business_id: r for r in expected.collect()}
    assert set(got) == set(want)
    for bid, w in want.items():
        g = got[bid]
        assert (g.total_reviews, g.total_checkins, g.total_tips) == (
            w.total_reviews, w.total_checkins, w.total_tips
        ), bid
        assert abs(g.avg_rating - w.avg_rating) < 1e-9, bid


def test_summary_values(applied):
    applier, _ = applied
    s = {r.business_id: r for r in applier.summary().collect()}
    # b4: batch review r6 (5) + streamed r7 (4) → 2 reviews avg 4.5
    assert s["b4"].total_reviews == 2 and abs(s["b4"].avg_rating - 4.5) < 1e-9
    # b5: streamed only — 1 review (2 stars), 3 checkins
    assert s["b5"].total_reviews == 1 and s["b5"].total_checkins == 3
    # b1: replayed r1 did NOT bump the counter (the reference would have)
    assert s["b1"].total_reviews == 2 and s["b1"].total_checkins == 4
    # b3: zero-filled, avg falls back to business stars
    assert s["b3"].total_reviews == 0 and s["b3"].avg_rating == 3.0
