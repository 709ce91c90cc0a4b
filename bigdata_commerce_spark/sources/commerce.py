"""Commerce schemas + seeded fixture generator (FIXTURES.md family A).

Mirrors the reference's data model (``commons/src/main/scala/commons/
model/DataModel.scala:26-71``) and mock value domains
(``mock/src/main/scala/MockDataGenerate.scala:27-197``) with two
deliberate deviations the new engine's docs call out:

- generation is **seeded** (the reference's unseeded Random makes its
  fixtures irreproducible — SURVEY.md §5);
- hours are zero-padded proper timestamps (the reference emits
  ``"2024-1-1 5:..."`` and leans on lenient Joda parsing —
  SURVEY.md §2.12/10).

The sentinel conventions are kept (-1 longs / null strings, CSV id
lists, JSON extend_info) because the *ingest* layer is what
normalizes them — that round trip is part of what we test.
"""

from __future__ import annotations

import random
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_commerce_spark.functions import csv_to_array, nullif_sentinel

USER_VISIT_ACTION_SCHEMA = T.StructType(
    [
        T.StructField("date", T.StringType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("page_id", T.LongType(), True),
        T.StructField("action_time", T.StringType(), True),
        T.StructField("search_keyword", T.StringType(), True),
        T.StructField("click_category_id", T.LongType(), True),
        T.StructField("click_product_id", T.LongType(), True),
        T.StructField("order_category_ids", T.StringType(), True),
        T.StructField("order_product_ids", T.StringType(), True),
        T.StructField("pay_category_ids", T.StringType(), True),
        T.StructField("pay_product_ids", T.StringType(), True),
        T.StructField("city_id", T.LongType(), True),
    ]
)

USER_INFO_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("username", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("age", T.IntegerType(), True),
        T.StructField("professional", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("sex", T.StringType(), True),
    ]
)

PRODUCT_INFO_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.LongType(), True),
        T.StructField("product_name", T.StringType(), True),
        T.StructField("extend_info", T.StringType(), True),
    ]
)

# city dim hard-coded in the reference (``AreaTop3Stat.scala:166-174``)
CITY_INFO = [
    (0, "Beijing", "North"),
    (1, "Shanghai", "East"),
    (2, "Guangzhou", "South"),
    (3, "Shenzhen", "South"),
    (4, "Hangzhou", "East"),
    (5, "Chengdu", "West"),
    (6, "Wuhan", "Center"),
    (7, "Xian", "Northwest"),
    (8, "Nanjing", "East"),
    (9, "Chongqing", "West"),
]

SEARCH_KEYWORDS = [
    "hotpot", "cake", "chongqing spicy", "sushi", "new year gift",
    "pins", "guitar", "tissue", "tea table", "bicycle",
]

ACTIONS = ("search", "click", "order", "pay")


def generate_commerce_tables(
    spark: SparkSession,
    num_users: int = 100,
    sessions_per_user: int = 11,
    max_actions_per_session: int = 30,
    date: str = "2024-03-08",
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Seeded twin of MockDataGenerate: user_visit_action, user_info,
    product_info DataFrames with the reference's value domains."""
    rng = random.Random(seed)
    u = uuid.UUID(int=rng.getrandbits(128))  # namespace for session ids

    actions = []
    for user_id in range(num_users):
        for s in range(sessions_per_user):
            session_id = uuid.uuid5(u, f"{user_id}:{s}").hex
            base_hour = rng.randint(0, 23)
            for a in range(rng.randint(1, max_actions_per_session)):
                ts = f"{date} {base_hour:02d}:{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
                kind = ACTIONS[rng.randint(0, 3)]
                search_kw = None
                click_cat = click_prod = -1
                order_cats = order_prods = pay_cats = pay_prods = None
                if kind == "search":
                    search_kw = SEARCH_KEYWORDS[rng.randint(0, 9)]
                elif kind == "click":
                    click_cat = rng.randint(0, 99)
                    click_prod = rng.randint(0, 99)
                elif kind == "order":
                    order_cats = ",".join(str(rng.randint(0, 99)) for _ in range(rng.randint(1, 3)))
                    order_prods = ",".join(str(rng.randint(0, 99)) for _ in range(rng.randint(1, 3)))
                else:
                    pay_cats = ",".join(str(rng.randint(0, 99)) for _ in range(rng.randint(1, 3)))
                    pay_prods = ",".join(str(rng.randint(0, 99)) for _ in range(rng.randint(1, 3)))
                actions.append(
                    (
                        date, user_id, session_id, rng.randint(0, 9), ts, search_kw,
                        click_cat, click_prod, order_cats, order_prods, pay_cats,
                        pay_prods, rng.randint(0, 9),
                    )
                )

    users = [
        (
            i, f"user{i}", f"name{i}", rng.randint(0, 59), f"professional{rng.randint(0, 99)}",
            f"city{rng.randint(0, 9)}", "male" if rng.random() < 0.5 else "female",
        )
        for i in range(num_users)
    ]
    products = [
        (i, f"product{i}", '{"product_status": %d}' % rng.randint(0, 1))
        for i in range(100)
    ]

    return {
        "user_visit_action": spark.createDataFrame(actions, USER_VISIT_ACTION_SCHEMA),
        "user_info": spark.createDataFrame(users, USER_INFO_SCHEMA),
        "product_info": spark.createDataFrame(products, PRODUCT_INFO_SCHEMA),
        "city_info": spark.createDataFrame(
            CITY_INFO, "city_id long, city_name string, area string"
        ),
    }


def normalize_actions(raw: DataFrame) -> DataFrame:
    """Typed ingest boundary (SURVEY.md §1.4): -1/null sentinels ->
    real NULLs, CSV id strings -> array<bigint>, string times ->
    TimestampType. Downstream operators never see the legacy encoding."""
    return raw.select(
        F.to_date("date").alias("action_date"),
        "user_id",
        "session_id",
        "page_id",
        F.to_timestamp("action_time").alias("action_time"),
        "search_keyword",
        nullif_sentinel("click_category_id").alias("click_category_id"),
        nullif_sentinel("click_product_id").alias("click_product_id"),
        csv_to_array("order_category_ids").alias("order_category_ids"),
        csv_to_array("order_product_ids").alias("order_product_ids"),
        csv_to_array("pay_category_ids").alias("pay_category_ids"),
        csv_to_array("pay_product_ids").alias("pay_product_ids"),
        "city_id",
    )
