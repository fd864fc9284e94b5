"""Measure the PyTorch reference's CPU training throughput (bags/sec) for
all three models — the vs_baseline denominators used by bench.py.

Same methodology as the round-1 MCAT measurement (BASELINE.md): build the
reference model from /root/reference, run the training hot loop — per-bag
forward + loss/32 + backward, adam step every 32 bags — on a 500x1024 random
bag (+ 6 signature groups [100..600] for the survival models), warmup 3
bags, timed 32 bags, torch single-threaded (container default). Losses match
each model's reference driver default: ces for MCAT (mcat/main.py:277),
cesar for NaCAGaT (nacagat/main.py:292-294 + config), ce for GE-NaCAGaT
(ge_nacagat/main.py:223-225).

Usage: python benchmarks/torch_cpu_baseline.py [mcat|nacagat|ge] ...
Prints one JSON line per model.
"""

import json
import sys
import time

import torch

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/models/mcat")
sys.path.insert(0, "/root/reference/models/nacagat")
sys.path.insert(0, "/root/reference/models/ge_nacagat")

OMIC_SIZES = [100, 200, 300, 400, 500, 600]
BAG = 500
GRAD_ACC = 32


def _bench(model, make_inputs, compute_loss, n_warm=3, n_timed=32):
    optimizer = torch.optim.Adam(model.parameters(), lr=2e-4, weight_decay=1e-5)
    model.train()

    def one_bag(i, step):
        inputs = make_inputs(i)
        loss = compute_loss(model, inputs)
        (loss / GRAD_ACC).backward()
        if step:
            optimizer.step()
            optimizer.zero_grad()

    for i in range(n_warm):
        one_bag(i, step=False)
    optimizer.zero_grad()
    t0 = time.perf_counter()
    for i in range(n_timed):
        one_bag(i, step=(i + 1) % GRAD_ACC == 0)
    dt = time.perf_counter() - t0
    return n_timed / dt


def bench_mcat():
    from mcat import MultimodalCoAttentionTransformer

    torch.manual_seed(0)
    model = MultimodalCoAttentionTransformer(omic_sizes=OMIC_SIZES)
    loss_fn = __import__("models.loss", fromlist=["loss"]).CrossEntropySurvivalLoss()

    def make_inputs(i):
        g = torch.Generator().manual_seed(i)
        return (
            torch.randn(BAG, 1024, generator=g),
            [torch.randn(s, generator=g) for s in OMIC_SIZES],
            torch.tensor([[i % 4]], dtype=torch.int64),
            torch.tensor([float(i % 2)]),
        )

    def compute(model, inputs):
        wsi, omics, y, c = inputs
        hazards, survs, _, _ = model(wsi=wsi, omics=omics)
        return loss_fn(hazards, survs, y, c=c)

    return _bench(model, make_inputs, compute)


def bench_nacagat():
    from nacagat import NarrowContextualAttentionGateTransformer

    from models.loss import CrossEntropySurvivalAttnRegLoss

    torch.manual_seed(0)
    model = NarrowContextualAttentionGateTransformer(omic_sizes=OMIC_SIZES)
    loss_fn = CrossEntropySurvivalAttnRegLoss()

    def make_inputs(i):
        g = torch.Generator().manual_seed(i)
        return (
            torch.randn(BAG, 1024, generator=g),
            [torch.randn(s, generator=g) for s in OMIC_SIZES],
            torch.tensor([[i % 4]], dtype=torch.int64),
            torch.tensor([float(i % 2)]),
        )

    def compute(model, inputs):
        wsi, omics, y, c = inputs
        hazards, survs, _, attn = model(wsi=wsi, omics=omics)
        loss, _ = loss_fn(hazards, survs, y, c=c, attention=attn["coattn"])
        return loss

    return _bench(model, make_inputs, compute)


def bench_ge():
    from ge_nacagat import GeneExprNarrowContextualAttentionGateTransformer

    torch.manual_seed(0)
    model = GeneExprNarrowContextualAttentionGateTransformer()
    loss_fn = torch.nn.CrossEntropyLoss()

    def make_inputs(i):
        g = torch.Generator().manual_seed(i)
        return (
            torch.randn(BAG, 1024, generator=g),
            torch.tensor([i % 3], dtype=torch.int64),
        )

    def compute(model, inputs):
        wsi, y = inputs
        Y, _ = model(wsi=wsi)
        return loss_fn(Y.unsqueeze(0), y)

    return _bench(model, make_inputs, compute)


if __name__ == "__main__":
    which = sys.argv[1:] or ["mcat", "nacagat", "ge"]
    fns = {"mcat": bench_mcat, "nacagat": bench_nacagat, "ge": bench_ge}
    for name in which:
        bps = fns[name]()
        print(
            json.dumps(
                {
                    "metric": f"torch_cpu_{name}_train_bags_per_sec",
                    "value": round(bps, 2),
                    "unit": "bags/sec",
                }
            ),
            flush=True,
        )
