"""`from maggy.ablation import AblationStudy` (+ ablator submodule)."""

from maggy_spark.ablation import LOCO, AblationStudy, AbstractAblator

from maggy.ablation import ablator  # noqa: F401  (module-shaped alias)

__all__ = ["AblationStudy", "AbstractAblator", "LOCO"]
