"""`from maggy.callbacks import KerasBatchEnd, KerasEpochEnd`."""

from maggy_spark.callbacks import KerasBatchEnd, KerasEpochEnd

__all__ = ["KerasBatchEnd", "KerasEpochEnd"]
