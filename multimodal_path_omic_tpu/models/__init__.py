from multimodal_path_omic_tpu.models.mcat import MCAT  # noqa: F401
from multimodal_path_omic_tpu.models.nacagat import NaCAGaT  # noqa: F401
from multimodal_path_omic_tpu.models.ge_nacagat import GENaCAGaT  # noqa: F401
from multimodal_path_omic_tpu.models.common import (  # noqa: F401
    MODEL_SIZES,
    SurvivalOutput,
    build_model,
)
