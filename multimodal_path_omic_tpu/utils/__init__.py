from multimodal_path_omic_tpu.utils.hdf5 import (  # noqa: F401
    get_cnv_size_from_dataset,
    get_omics_sizes_from_dataset,
    get_rnaseq_size_from_dataset,
)
