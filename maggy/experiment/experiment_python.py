"""Python-mode experiment entry (reference
`maggy/experiment/experiment_python.py`). The engine runs Spark in
local mode for the same effect; the import path and entry contract
are preserved."""

from maggy.experiment.experiment_pyspark import lagom, lagom_driver

__all__ = ["lagom", "lagom_driver"]
