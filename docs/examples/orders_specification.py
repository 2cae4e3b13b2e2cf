"""Example data specification, runnable with pytest.

The Spark-native analog of the reference's example specification
(/root/reference/docs/examples/twitch_specification.py): requirements
are declared at module import time, ``collect_data_tests`` turns every
constraint into a parametrized pytest case, and the ``datajudge_engine``
fixture supplies the execution engine — here a SparkSession instead of a
SQLAlchemy engine; everything else reads the same.

Run:  PYTHONPATH=/root/repo python -m pytest docs/examples/orders_specification.py -v
"""

import os

import pytest

from datajudge_spark import (
    BetweenRequirement,
    Condition,
    WithinRequirement,
    get_spark,
)
from datajudge_spark.pytest_integration import collect_data_tests

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def datajudge_engine():
    return get_spark("orders-specification")


# 1. Sanity checks on the new orders snapshot based on domain knowledge.
orders_req = WithinRequirement.from_parquet(f"{SF_DIR}/orders.parquet", "orders")

orders_req.add_varchar_regex_constraint(
    column="o_orderpriority",
    regex="^[0-9]-[A-Z ]+$",
)
orders_req.add_null_absence_constraint(column="o_orderkey")
orders_req.add_uniqueness_constraint(columns=["o_orderkey"])
orders_req.add_numeric_min_constraint(column="o_totalprice", min_value=0.0)
orders_req.add_n_rows_min_constraint(
    n_rows_min=100,
    condition=Condition(raw_string="o_orderstatus = 'F'"),
)

# 2. Consistency between the fact table and its dimension.
li_orders_req = BetweenRequirement.from_parquets(
    f"{SF_DIR}/lineitem.parquet",
    f"{SF_DIR}/orders.parquet",
    name1="lineitem",
    name2="orders",
)

# every order key referenced by a lineitem must exist in orders
li_orders_req.add_uniques_subset_constraint(
    columns1=["l_orderkey"],
    columns2=["o_orderkey"],
)
# lineitem is a multi-row detail table: it must not shrink below orders
li_orders_req.add_n_rows_min_gain_constraint(constant_min_relative_gain=0.0)

# 3. Distribution stability between two event-type populations.
events_req = BetweenRequirement.from_parquets(
    f"{SF_DIR}/events.parquet",
    f"{SF_DIR}/events.parquet",
    name1="events_click",
    name2="events_view",
)
events_req.add_ks_2sample_constraint(
    column1="value",
    column2="value",
    condition1=Condition(raw_string="event_type = 'click'"),
    condition2=Condition(raw_string="event_type = 'view'"),
    significance_level=0.001,
)

test_constraint = collect_data_tests(
    [orders_req, li_orders_req, events_req]
)
