"""Serving-path latency benchmark: HTTP round-trip on the scoring server.

The reference has NO serving surface (its only inference is an offline loop
printing to stdout, reference mcat/main.py:158-183); this measures what the
rebuild adds: multimodal_path_omic_tpu/server.py on top of serve.Predictor
(bucketed, padded, jitted-per-bucket inference).

Starts the stdlib HTTP server in-process on a random port, then POSTs
``/predict_npz`` (the binary path real embedding sizes need) with bags of
several sizes and reports per-size p50/p95 round-trip latency — request
serialization + HTTP + pad-to-bucket + H2D + jitted forward + D2H + JSON
response. First request per bucket pays the compile; it is timed separately.

Run:  python benchmarks/bench_serving.py [--sizes 500,4000,20000] [--n 20]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OMIC_SIZES = [100, 200, 300, 400, 500, 600]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="500,4000,20000")
    ap.add_argument("--n", type=int, default=20, help="timed requests per size")
    ap.add_argument(
        "--payload-dtype", default="f32", choices=["f32", "f16"],
        help="wire dtype of the wsi npz entry (f16 halves payload bytes; "
        "the server casts to f32 — pinned by test_server.py)",
    )
    ap.add_argument(
        "--transfer-dtype", default="auto", choices=["auto", "float32", "bfloat16", "int8"],
        help="tpu.transfer_dtype for the serving Trainer (H2D bytes per bag)",
    )
    ap.add_argument(
        "--batch", type=int, default=0,
        help="send N bags per request through /predict_batch_npz instead of "
        "one bag per /predict_npz request; reports per-BAG p50/p95",
    )
    ap.add_argument(
        "--concurrency", type=int, default=1,
        help="N client threads issuing requests at once (the threaded server "
        "overlaps payload parse with device compute; 1 = serial latency)",
    )
    ap.add_argument(
        "--dynamic-batch", type=int, default=0,
        help="server-side DynamicBatcher: co-batch up to N concurrent "
        "single-bag requests into one device dispatch (pair with "
        "--concurrency >= N); also sizes tpu.batch_size to N so the batched "
        "program matches the group size",
    )
    ap.add_argument("--batch-wait-ms", type=float, default=5.0)
    ap.add_argument(
        "--bundle", action="store_true",
        help="serve from an AOT deployment bundle (deploy.export_model + "
        "server --bundle) instead of the config+Predictor path — measures "
        "the framework-free serving process and its cold start",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from multimodal_path_omic_tpu.config import config_from_dict
    from multimodal_path_omic_tpu.data.synthetic import (
        make_synthetic_cohort,
        synthetic_config_dict,
    )
    from multimodal_path_omic_tpu.serve import Predictor
    from multimodal_path_omic_tpu.server import make_server

    # minimal cohort just to build a config/model (weights are fresh — serving
    # latency does not depend on training state)
    wd = tempfile.mkdtemp(prefix="bench_serving_")
    csv, sig, patches = make_synthetic_cohort(
        wd, n_patients=8, bag_lengths=(64,), n_genes=60,
        n_signatures=len(OMIC_SIZES), seed=0,
    )
    raw = synthetic_config_dict(csv, sig, patches)
    raw["model"]["model_size"] = "medium"
    raw["tpu"] = {
        "bag_buckets": sorted({1 << (s - 1).bit_length() for s in sizes}),
        "transfer_dtype": args.transfer_dtype,
    }
    if args.dynamic_batch > 1:
        # right-size the batched program: predict_bags pads every group to
        # tpu.batch_size rows, so a 32-row default would waste compute on
        # 4-request groups
        raw["tpu"]["batch_size"] = args.dynamic_batch
    cfg = config_from_dict(raw)
    predictor = Predictor.from_config(cfg)
    omic_sizes = list(predictor._t.omic_sizes)

    if args.bundle:
        from multimodal_path_omic_tpu.deploy import export_model
        from multimodal_path_omic_tpu.server import make_bundle_server

        bundle_dir = os.path.join(wd, "bundle")
        t_exp = time.perf_counter()
        export_model(
            predictor._t,
            bundle_dir,
            batch_sizes=(max(1, args.batch),),
            max_bag=max(sizes),
        )
        print(json.dumps({"bundle_export_s": round(time.perf_counter() - t_exp, 2)}))
        server = make_bundle_server(
            bundle_dir, port=0,
            dynamic_batch=args.dynamic_batch, batch_wait_ms=args.batch_wait_ms,
        )
    else:
        server = make_server(
            predictor, port=0,
            dynamic_batch=args.dynamic_batch, batch_wait_ms=args.batch_wait_ms,
        )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    rng = np.random.default_rng(0)
    rows = []
    compiled_buckets = set()
    for m in sizes:
        wire = np.float16 if args.payload_dtype == "f16" else np.float32
        buf = io.BytesIO()
        if args.batch:
            # one bag reused for every wsi_i: latency does not depend on bag
            # content, and N independent 20k-patch draws would stage multiple
            # GB on this small host
            bag = rng.normal(size=(m, 1024)).astype(wire)
            np.savez(
                buf,
                **{f"wsi_{i}": bag for i in range(args.batch)},
                **{
                    f"omic_{i}_{j}": rng.normal(size=(s,)).astype(np.float32)
                    for i in range(args.batch)
                    for j, s in enumerate(omic_sizes)
                },
            )
            endpoint = "/predict_batch_npz"
        else:
            np.savez(
                buf, wsi=rng.normal(size=(m, 1024)).astype(wire),
                **{
                    f"omic_{i}": rng.normal(size=(s,)).astype(np.float32)
                    for i, s in enumerate(omic_sizes)
                },
            )
            endpoint = "/predict_npz"
        payload = buf.getvalue()
        per_bag = max(1, args.batch)

        def roundtrip():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{endpoint}", data=payload,
                headers={"Content-Type": "application/octet-stream"},
            )
            t0 = time.perf_counter()
            with urllib.request.urlopen(req, timeout=600) as r:
                body = json.loads(r.read())
            assert "risk" in body or "probs" in body, body
            return (time.perf_counter() - t0) / per_bag

        bucket = 1 << (m - 1).bit_length()
        is_compile = bucket not in compiled_buckets
        compiled_buckets.add(bucket)
        # first_request_s reports the REQUEST's wall time (the cold-start a
        # client actually sees), not the per-bag figure roundtrip() returns
        first = roundtrip() * per_bag  # compile iff this bucket is fresh
        rps = None
        if args.concurrency > 1:
            # aggregate throughput under concurrent clients: wall time for
            # n requests issued from N threads (parse overlaps compute);
            # per-request latencies rise (queueing) — rps is the headline
            import concurrent.futures

            t0 = time.perf_counter()
            with concurrent.futures.ThreadPoolExecutor(args.concurrency) as pool:
                lat = sorted(pool.map(lambda _: roundtrip(), range(args.n)))
            rps = args.n * per_bag / (time.perf_counter() - t0)
        else:
            lat = sorted(roundtrip() for _ in range(args.n))
        import math

        p95_i = min(len(lat) - 1, math.ceil(0.95 * len(lat)) - 1)
        row = {
            "patches": m,
            "payload_mb": round(len(payload) / 1e6, 1),
            "p50_ms": round(lat[len(lat) // 2] * 1e3, 1),
            "p95_ms": round(lat[p95_i] * 1e3, 1),
        }
        if args.batch:
            row["bags_per_request"] = args.batch  # latencies are per BAG
        if rps is not None:
            row["concurrency"] = args.concurrency
            if args.dynamic_batch:
                row["dynamic_batch"] = args.dynamic_batch
            row["bags_per_sec"] = round(rps, 1)
        if is_compile:
            row["first_request_s"] = round(first, 2)
        rows.append(row)
        print(json.dumps(rows[-1]))
    server.shutdown()
    print(
        json.dumps(
            {
                "metric": "serving_http_roundtrip",
                "serving": "bundle" if args.bundle else "config",
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
