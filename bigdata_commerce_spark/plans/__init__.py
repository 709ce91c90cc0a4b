"""Query catalog: the reference's ten requirements (plus the
relational and training-data operator suites) as (Spark, oracle-SQL)
pairs over the shared testdata."""

from bigdata_commerce_spark.plans import (  # noqa: F401
    catalog,
    catalog_dataops,
    catalog_relational_ext,
)
from bigdata_commerce_spark.plans.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
