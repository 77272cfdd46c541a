from maggy_spark.sources.sinks import (
    read_experiment,
    read_trial_summaries,
    write_experiment_result,
    write_trial_artifacts,
)

__all__ = [
    "read_experiment",
    "read_trial_summaries",
    "write_experiment_result",
    "write_trial_artifacts",
]
