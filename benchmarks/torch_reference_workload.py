"""PyTorch reference-equivalent MAML workload for baseline measurement.

The reference (Yalt8826/WeatherForecast_STGCN_MAML) publishes no performance
numbers (BASELINE.md), so this module measures the reference-equivalent
workload with PyTorch on the host CPU to create the missing comparison
point. It reproduces the reference's *computation structure* — the thing
that determines its speed — without copying its code:

  * hybrid forward = 4 graph convs over the flattened [W*N, C] window
    followed by a **per-node Python loop** over N sequential
    nn.LSTM(256->128, 4 layers) calls (the reference's dominant cost,
    hybrid_model.py:94-102), then a linear head;
  * graph conv is applied as a dense normalized-adjacency matmul (PyG is
    not installed here; dense is *faster* than scatter at N=441 on CPU, so
    this favors the baseline);
  * MAML epoch = 4 tasks x (deepcopy + 6 inner epochs x 15 batches of
    size 1, SGD lr=0.01 + grad clip) + 1 query fwd/bwd + AdamW step every
    2 tasks (train_hybrid_maml_v5.py:110-184).

Because a full meta epoch takes minutes on CPU, `measure()` times single
inner/query steps (after warmup) and composes the meta-epoch time
arithmetically — documented extrapolation, recorded in the output JSON.
"""

from __future__ import annotations

import copy
import json
import time


def build_torch_workload(
    num_nodes: int = 441,
    window: int = 24,
    horizon: int = 8,
    in_channels: int = 24,
    hidden: int = 256,
    lstm_hidden: int = 128,
    lstm_layers: int = 4,
    out_channels: int = 12,
):
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class TorchHybrid(nn.Module):
        def __init__(self):
            super().__init__()
            self.convs = nn.ModuleList(
                [nn.Linear(in_channels if i == 0 else hidden, hidden) for i in range(4)]
            )
            self.lstm = nn.LSTM(
                hidden, lstm_hidden, num_layers=lstm_layers, batch_first=True,
                dropout=0.2,
            )
            self.head = nn.Linear(lstm_hidden, out_channels * horizon)
            self.drop = nn.Dropout(0.2)

        def forward(self, x, a_hat):
            # x: [W*N, C]; graph mixing via dense normalized adjacency on the
            # flattened rows (block-diagonal per time slice).
            h = x
            for i, conv in enumerate(self.convs):
                h = conv(h)
                h = h.view(window, num_nodes, hidden)
                h = torch.einsum("nm,tmc->tnc", a_hat, h).reshape(-1, hidden)
                h = torch.relu(h)
                if i < 3:
                    h = self.drop(h)
            h = h.view(window, num_nodes, hidden).permute(1, 0, 2)  # [N, W, H]
            outs = []
            for node in range(num_nodes):  # the reference's per-node loop
                seq = h[node : node + 1]
                lstm_out, _ = self.lstm(seq)
                outs.append(lstm_out[0, -1])
            feats = torch.stack(outs)
            return self.head(self.drop(feats)).view(num_nodes * horizon, out_channels)

    model = TorchHybrid()
    a_hat = torch.rand(num_nodes, num_nodes)
    a_hat = a_hat / a_hat.sum(dim=1, keepdim=True)
    x = torch.randn(window * num_nodes, in_channels)
    y = torch.randn(num_nodes * horizon, out_channels)
    return model, a_hat, x, y


def measure(
    inner_steps_per_task: int = 90,
    tasks_per_epoch: int = 4,
    timed_reps: int = 3,
    **kwargs,
) -> dict:
    """Measure per-step times and compose the reference meta-epoch time."""
    import torch
    import torch.nn as nn

    model, a_hat, x, y = build_torch_workload(**kwargs)
    criterion = nn.MSELoss()

    # Inner step: fwd + bwd + clip + SGD step on a deepcopy (one rep of the
    # 90x-per-task hot loop).
    temp = copy.deepcopy(model)
    opt = torch.optim.SGD(temp.parameters(), lr=0.01)
    times = []
    for rep in range(timed_reps + 1):
        t0 = time.perf_counter()
        opt.zero_grad()
        loss = criterion(temp(x, a_hat), y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(temp.parameters(), 1.0)
        opt.step()
        dt = time.perf_counter() - t0
        if rep > 0:  # first rep warms up allocators/threads
            times.append(dt)
    t_inner = sum(times) / len(times)

    t0 = time.perf_counter()
    copy.deepcopy(model)
    t_deepcopy = time.perf_counter() - t0

    meta_epoch_seconds = tasks_per_epoch * (
        t_deepcopy + inner_steps_per_task * t_inner + t_inner  # query ~ one step
    )
    return {
        "t_inner_step_seconds": t_inner,
        "t_deepcopy_seconds": t_deepcopy,
        "tasks_per_epoch": tasks_per_epoch,
        "inner_steps_per_task": inner_steps_per_task,
        "meta_epoch_seconds": meta_epoch_seconds,
        "meta_steps_per_sec": 1.0 / meta_epoch_seconds,
        "device": "cpu",
        "framework": "torch",
        "method": (
            "single-step timing composed arithmetically: "
            "epoch = tasks * (deepcopy + 91 * inner_step)"
        ),
    }


if __name__ == "__main__":
    print(json.dumps(measure(), indent=2))
