"""`from maggy.ablation.ablationstudy import AblationStudy` (reference
module path). Features/Layers/Model are the reference's public class
names for the collection types on an AblationStudy."""

from maggy_spark.ablation import AblationStudy
from maggy_spark.ablation import _IncludeSet as Features
from maggy_spark.ablation import _Layers as Layers
from maggy_spark.ablation import _Model as Model

__all__ = ["AblationStudy", "Features", "Layers", "Model"]
