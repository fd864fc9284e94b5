from multimodal_path_omic_tpu.ops import losses as losses  # noqa: F401
