from multimodal_path_omic_tpu.parallel.mesh import (  # noqa: F401
    batch_spec,
    make_mesh,
    replicate,
    shard_batch,
)
