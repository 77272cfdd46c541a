"""Module-shaped alias matching `from maggy.trial import Trial`."""

from maggy_spark.trial import Trial, trial_id_for_params

__all__ = ["Trial", "trial_id_for_params"]
