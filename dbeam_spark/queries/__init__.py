from dbeam_spark.queries.registry import ORACLES, QUERIES, register

# Importing the modules populates the registry.
from dbeam_spark.queries import tpch  # noqa: F401,E402
from dbeam_spark.queries import events  # noqa: F401,E402
from dbeam_spark.queries import llm  # noqa: F401,E402
from dbeam_spark.queries import streaming  # noqa: F401,E402

__all__ = ["QUERIES", "ORACLES", "register"]
