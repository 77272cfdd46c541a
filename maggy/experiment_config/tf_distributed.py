"""Legacy module path (`from maggy.experiment_config.tf_distributed
import TfDistributedConfig`) used by the reference's Databricks iris
notebook."""

from maggy_spark.config import TfDistributedConfig

__all__ = ["TfDistributedConfig"]
