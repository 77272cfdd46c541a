"""Drop-in compatibility facade over maggy_spark.

Reference user code runs unchanged against the Spark-native engine:

    from maggy import Searchspace, experiment
    from maggy.config import HyperparameterOptConfig
    result = experiment.lagom(train_fn, config)

Every name forwards to maggy_spark (the actual implementation); the
public import shapes mirror `/root/reference/maggy/__init__.py` and
its submodules without sharing any code with them.
"""

from maggy_spark.searchspace import Searchspace
from maggy_spark.trial import Trial

from maggy import searchspace  # noqa: F401  (module-shaped alias)

__all__ = ["Searchspace", "Trial"]
