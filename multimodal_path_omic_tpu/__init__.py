"""multimodal_path_omic_tpu — TPU-native multimodal pathology+omics framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
`mattiagualtieri/multimodal-path-omic` (survival prediction from whole-slide
image patch bags fused with RNA-seq signature groups), designed TPU-first:

* batched, bucketed+masked ragged WSI bags instead of batch-size-1 loops
* one jitted train step per bucket with `lax.scan` gradient accumulation
* Pallas kernels for the co-attention / self-attention hot paths
* `jax.sharding.Mesh` + `shard_map` data parallelism over ICI

Reference parity map lives in SURVEY.md §2; each module cites the reference
file:line it covers.
"""

__version__ = "0.1.0"

from multimodal_path_omic_tpu import config as config  # noqa: F401
