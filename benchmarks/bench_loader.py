"""Host input-pipeline throughput: native C++ batch loader vs pure Python.

Prints JSON lines:
  {"metric": "loader_bags_per_sec", "backend": "native"|"python", "value": ...}
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from multimodal_path_omic_tpu.data import BucketBatcher, MultimodalDataset
    from multimodal_path_omic_tpu.data.pipeline import survival_extras
    from multimodal_path_omic_tpu.data.synthetic import (
        make_synthetic_cohort,
        synthetic_config_dict,
    )

    tmp = tempfile.mkdtemp()
    csv, sig, patches = make_synthetic_cohort(
        tmp, n_patients=256, bag_lengths=(300, 400, 500), n_genes=40,
        n_signatures=4, seed=0,
    )
    cfg = synthetic_config_dict(csv, sig, patches)
    ds = MultimodalDataset(csv, cfg, use_signatures=True, verbose=False)

    for backend in ("pipelined", "native", "python"):
        batcher = BucketBatcher(ds, survival_extras, 32, (512,), shuffle=False)
        if backend == "python":
            batcher._native = None
        elif batcher._native is None:
            continue  # toolchain unavailable
        if backend == "pipelined":
            # C++ slot-ring executor: worker threads fill batches ahead of
            # consumption (the consumer copies before advancing, per the
            # aliasing contract the Trainer implements)
            batcher.use_native_pipeline = True
        # warm page cache
        for _ in batcher.batches():
            pass
        t0 = time.perf_counter()
        n = 0
        for batch in batcher.batches():
            n += int(batch["weight"].sum())
            batch["wsi"][0, 0, 0]  # touch (pipelined batches alias slots)
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "loader_bags_per_sec",
                    "backend": backend,
                    "value": round(n / dt, 1),
                    # the pipelined executor needs >= 2 host CPUs to overlap;
                    # on a single-CPU host its thread ping-pong stalls (which
                    # is why the Trainer's auto-engage gates on cpu_count)
                    "host_cpus": os.cpu_count(),
                }
            )
        )


if __name__ == "__main__":
    main()
