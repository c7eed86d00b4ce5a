"""Yelp Academic Dataset entity schemas + readers (SURVEY.md §1.1).

Explicit StructTypes for the five JSON-lines entities — inference is never
relied on (schema drift across dataset versions is silent otherwise).
Field lists mirror exactly what the reference consumes:

* business  init/mysql_loader.py:368-429, webapp/mongodb_routes.py:176-274
* user      init/mysql_loader.py:514-536
* review    init/mysql_loader.py:626-687
* checkin   init/mysql_loader.py:791-802 (polymorphic `date`!)
* tip       init/mysql_loader.py:936-992

Schema-flexible fields (`attributes`, `hours`) are MapType(string,string):
top-level keys with raw/stringified values, preserving the reference's mixed
encodings (True vs "True" vs "u'casual'", webapp/mongodb_routes.py:188-269)
for value-normalizing predicates. The checkin `date` field is read as a raw
string and branch-parsed in the ETL (it is either a comma-joined timestamp
string or a {day: "times"} object depending on dataset vintage).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as S

BUSINESS_SCHEMA = S.StructType(
    [
        S.StructField("business_id", S.StringType()),
        S.StructField("name", S.StringType()),
        S.StructField("address", S.StringType()),
        S.StructField("city", S.StringType()),
        S.StructField("state", S.StringType()),
        S.StructField("postal_code", S.StringType()),
        S.StructField("latitude", S.DoubleType()),
        S.StructField("longitude", S.DoubleType()),
        S.StructField("stars", S.DoubleType()),
        S.StructField("review_count", S.IntegerType()),
        S.StructField("is_open", S.IntegerType()),
        S.StructField("categories", S.StringType()),  # comma-separated
        S.StructField("attributes", S.MapType(S.StringType(), S.StringType())),
        S.StructField("hours", S.MapType(S.StringType(), S.StringType())),
    ]
)

USER_SCHEMA = S.StructType(
    [
        S.StructField("user_id", S.StringType()),
        S.StructField("name", S.StringType()),
        S.StructField("review_count", S.IntegerType()),
        S.StructField("yelping_since", S.StringType()),  # YYYY-MM-DD[ HH:MM:SS]
        S.StructField("fans", S.IntegerType()),
        S.StructField("average_stars", S.DoubleType()),
        S.StructField("friends", S.ArrayType(S.StringType())),
    ]
)

REVIEW_SCHEMA = S.StructType(
    [
        S.StructField("review_id", S.StringType()),
        S.StructField("business_id", S.StringType()),
        S.StructField("user_id", S.StringType()),
        S.StructField("stars", S.IntegerType()),
        S.StructField("date", S.StringType()),  # YYYY-MM-DD[ HH:MM:SS]
        S.StructField("text", S.StringType()),
        S.StructField("useful", S.IntegerType()),
        S.StructField("funny", S.IntegerType()),
        S.StructField("cool", S.IntegerType()),
    ]
)

CHECKIN_SCHEMA = S.StructType(
    [
        S.StructField("business_id", S.StringType()),
        # polymorphic: comma-joined "ts, ts, ..." OR {"Mon": "times", ...};
        # read raw and branch-parse in etl.checkin_facts
        S.StructField("date", S.StringType()),
    ]
)

TIP_SCHEMA = S.StructType(
    [
        S.StructField("business_id", S.StringType()),
        S.StructField("user_id", S.StringType()),
        S.StructField("text", S.StringType()),
        S.StructField("date", S.StringType()),
        S.StructField("compliment_count", S.IntegerType()),
    ]
)

ENTITY_SCHEMAS = {
    "business": BUSINESS_SCHEMA,
    "user": USER_SCHEMA,
    "review": REVIEW_SCHEMA,
    "checkin": CHECKIN_SCHEMA,
    "tip": TIP_SCHEMA,
}

# canonical file names, init/utils.py:36-43
ENTITY_FILES = {
    "business": "yelp_academic_dataset_business.json",
    "user": "yelp_academic_dataset_user.json",
    "review": "yelp_academic_dataset_review.json",
    "checkin": "yelp_academic_dataset_checkin.json",
    "tip": "yelp_academic_dataset_tip.json",
}


def read_entity(
    spark: SparkSession, raw_dir: str, entity: str, limit: int | None = None
) -> DataFrame:
    """S1: JSON-lines scan with explicit schema; malformed lines dropped
    (reference skips them line-by-line, init/mysql_loader.py:358-364)."""
    path = os.path.join(raw_dir, ENTITY_FILES[entity])
    if not os.path.exists(path):  # allow plain <entity>.json fixture names
        path = os.path.join(raw_dir, f"{entity}.json")
    df = (
        spark.read.schema(ENTITY_SCHEMAS[entity])
        .option("mode", "DROPMALFORMED")
        .json(path)
    )
    return df.limit(limit) if limit else df


def read_entity_with_quarantine(
    spark: SparkSession, raw_dir: str, entity: str
) -> tuple[DataFrame, DataFrame]:
    """S1/S2 with an audit trail: (good rows, quarantined raw lines).

    The reference silently skips malformed JSON lines
    (init/mysql_loader.py:358-364 try/except around json.loads);
    DROPMALFORMED reproduces that in `read_entity`. At production scale
    silent drops hide upstream breakage, so this variant reads PERMISSIVE
    with a corrupt-record column: well-formed rows come back typed, and
    every malformed line survives VERBATIM in the quarantine frame for
    alerting/replay. One scan feeds both frames (the split is two lazy
    filters over the same read, not two file passes).
    """
    path = os.path.join(raw_dir, ENTITY_FILES[entity])
    if not os.path.exists(path):
        path = os.path.join(raw_dir, f"{entity}.json")
    schema = S.StructType(
        ENTITY_SCHEMAS[entity].fields
        + [S.StructField("_corrupt_record", S.StringType())]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # Spark leaves _corrupt_record unqueryable without a materialization
    # barrier when it is filtered standalone; caching the one scan is also
    # what makes the two branches share it.
    raw = raw.cache()
    good = raw.filter(raw["_corrupt_record"].isNull()).drop("_corrupt_record")
    bad = raw.filter(raw["_corrupt_record"].isNotNull()).select(
        raw["_corrupt_record"].alias("raw_line")
    )
    return good, bad
