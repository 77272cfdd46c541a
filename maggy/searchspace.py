"""Module-shaped alias matching `from maggy.searchspace import Searchspace`."""

from maggy_spark.searchspace import CATEGORICAL, DISCRETE, DOUBLE, INTEGER, Searchspace

__all__ = ["Searchspace", "DOUBLE", "INTEGER", "DISCRETE", "CATEGORICAL"]
