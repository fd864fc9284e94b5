from multimodal_path_omic_tpu.data.tables import MultimodalTable, GeneExprTable  # noqa: F401
from multimodal_path_omic_tpu.data.bags import (  # noqa: F401
    BagStore,
    H5BagStore,
    NpyBagStore,
    PtBagStore,
    open_bag_store,
    bucket_for,
    pad_bag,
)
from multimodal_path_omic_tpu.data.dataset import MultimodalDataset, GeneExprDataset  # noqa: F401
from multimodal_path_omic_tpu.data.pipeline import BucketBatcher, prefetch  # noqa: F401
