"""Cross-framework forward parity: reference-style torch model vs imported JAX.

VERDICT r1 item 7: the importer was only shape-tested. Here we build a
fresh torch module with the REFERENCE's forward semantics (dense GCNConv
math `A_hat @ (x W^T) + b`, flattened [W*N] graph wiring, batched LSTM —
mathematically identical to the per-node loop of hybrid_model.py:94-102),
export its state dict in the reference checkpoint schema, import it with
`params_from_state_dicts`, and compare forwards on identical inputs with
dropout off.

Divergence contract (docs/REFERENCE_SEMANTICS.md #10/#12): our forward
applies the graph convolution PER TIME SLICE, while the reference's
flattened [W*N]-row forward only wires the oldest slice (SURVEY.md 3.3).
Therefore:
  * W == 1 -> the two forwards must agree to float tolerance (the quirk
    has no effect with a single slice);
  * W > 1 -> our forward must agree with the torch *per-timestep* variant
    (the intended semantics), while the torch *flattened* variant must
    measurably differ — proving the documented quirk is the ONLY
    divergence.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from weatherforecast_stgcn_maml_tpu.config import ModelConfig  # noqa: E402
from weatherforecast_stgcn_maml_tpu.graph import build_region_graph  # noqa: E402
from weatherforecast_stgcn_maml_tpu.models.hybrid import apply_hybrid  # noqa: E402
from weatherforecast_stgcn_maml_tpu.utils.torch_import import (  # noqa: E402
    params_from_state_dicts,
)

HIDDEN = 12
LSTM_HIDDEN = 7
HORIZON = 3
KOPPEN_DIM = 5
KOPPEN_CODE = 8
IN_CH = 12 + 4 + KOPPEN_DIM  # weather + time + koppen


class _RefConv(torch.nn.Module):
    """GCNConv-equivalent: out = A @ (x @ lin.weight^T) + bias.

    Matches PyG's dense math and its state-dict layout (`.lin.weight`
    [out, in], separate `.bias`), reference model.py:23-26.
    """

    def __init__(self, d_in, d_out):
        super().__init__()
        self.lin = torch.nn.Linear(d_in, d_out, bias=False)
        self.bias = torch.nn.Parameter(torch.randn(d_out) * 0.1)

    def forward(self, a, x):
        return a @ self.lin(x) + self.bias


class _RefBase(torch.nn.Module):
    def __init__(self, gcn_layers, d_in, hidden):
        super().__init__()
        for i in range(1, gcn_layers + 1):
            setattr(self, f"conv{i}", _RefConv(d_in if i == 1 else hidden, hidden))
        self.n_layers = gcn_layers


class _RefHybrid(torch.nn.Module):
    """Reference HybridSTGCN_LSTM semantics (hybrid_model.py:60-117), fresh
    implementation: conv stack (ReLU all layers, no dropout in eval) over a
    [W*N, C] flattened window, reshape to [N, W, hidden], batched LSTM
    (identical math to the reference's per-node loop), last hidden state,
    linear head, [N, H, 12] output."""

    def __init__(self, gcn_layers, lstm_layers):
        super().__init__()
        self.base_stgcn = _RefBase(gcn_layers, IN_CH, HIDDEN)
        self.lstm = torch.nn.LSTM(
            HIDDEN, LSTM_HIDDEN, num_layers=lstm_layers, batch_first=True
        )
        self.output_layer = torch.nn.Linear(LSTM_HIDDEN, 12 * HORIZON)

    def forward(self, x_flat, a_big, w, n):
        h = x_flat
        for i in range(1, self.base_stgcn.n_layers + 1):
            conv = getattr(self.base_stgcn, f"conv{i}")
            h = torch.relu(conv(a_big, h))  # dropout is a no-op in eval
        h = h.view(w, n, HIDDEN).permute(1, 0, 2)  # [N, W, hidden]
        out, _ = self.lstm(h)
        feat = out[:, -1, :]  # [N, lstm_hidden]
        return self.output_layer(feat).view(n, HORIZON, 12)


def _setup(window, gcn_layers=3, lstm_layers=2, seed=0):
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)

    lats = np.arange(10.0, 11.01, 0.25)  # 5 x 5 = 25 nodes
    lons = np.arange(20.0, 21.01, 0.25)
    graph = build_region_graph(lats, lons, k_neighbors=4)
    n = graph.num_nodes

    cfg = ModelConfig(
        hidden_channels=HIDDEN,
        gcn_layers=gcn_layers,
        lstm_hidden=LSTM_HIDDEN,
        lstm_layers=lstm_layers,
        window=window,
        horizon=HORIZON,
        koppen_dim=KOPPEN_DIM,
        gcn_dropout=0.0,
        lstm_dropout=0.0,
    )

    model = _RefHybrid(gcn_layers, lstm_layers).eval()
    koppen_embed = torch.nn.Embedding(31, KOPPEN_DIM)
    hybrid_state = dict(model.state_dict())
    koppen_state = {"embedding.weight": koppen_embed.state_dict()["weight"]}
    params = params_from_state_dicts(hybrid_state, koppen_state, cfg)

    x16 = rng.standard_normal((window, n, 16)).astype(np.float32)
    # The reference bakes the (detached) Koppen embedding into the feature
    # channels at preprocessing time (featurePreprocessor.py:169-177); our
    # model looks it up internally from the code. Same numbers both ways.
    emb = koppen_embed.weight.detach().numpy()[KOPPEN_CODE]
    x24 = np.concatenate(
        [x16, np.broadcast_to(emb, (window, n, KOPPEN_DIM))], axis=-1
    ).astype(np.float32)

    return cfg, graph, model, params, x16, x24, n


def _jax_forward(cfg, graph, params, x16):
    n_pad = graph.a_hat.shape[0]
    x_pad = np.zeros((cfg.window, n_pad, 16), np.float32)
    x_pad[:, : x16.shape[1], :] = x16
    out = apply_hybrid(
        params,
        jnp.asarray(graph.a_hat),
        jnp.asarray(x_pad),
        jnp.int32(KOPPEN_CODE),
        cfg,
        train=False,
    )
    return np.asarray(out)[:, : x16.shape[1], :]  # [H, n, 12]


def _torch_forward(model, a_big, x24, w, n):
    with torch.no_grad():
        out = model(
            torch.from_numpy(x24.reshape(w * n, -1)), a_big, w, n
        )
    return out.numpy().transpose(1, 0, 2)  # [H, n, 12]


def test_w1_forward_matches_reference_to_float_tolerance():
    """With a single time slice the flattened-graph quirk vanishes: the
    imported params must reproduce the reference forward numerically."""
    cfg, graph, model, params, x16, x24, n = _setup(window=1)
    a = torch.from_numpy(np.ascontiguousarray(graph.a_hat[:n, :n]))

    ours = _jax_forward(cfg, graph, params, x16)
    ref = _torch_forward(model, a, x24, 1, n)

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_w3_matches_intended_semantics_and_only_quirk_diverges():
    """W>1: ours == torch per-timestep variant (intended semantics); the
    torch flattened variant (reference wiring: block_diag(a_hat, I) over
    [W*N] rows) must differ — the documented quirk is the only divergence."""
    w = 3
    cfg, graph, model, params, x16, x24, n = _setup(window=w)
    a = torch.from_numpy(np.ascontiguousarray(graph.a_hat[:n, :n]))

    # Per-timestep torch variant: block-diagonal A with a_hat on EVERY slice.
    a_per_slice = torch.block_diag(*([a] * w))
    # Reference flattened wiring: edges only among the first N rows (oldest
    # slice); remaining rows keep only their (normalized) self-loop.
    a_flat = torch.block_diag(a, torch.eye((w - 1) * n))

    ours = _jax_forward(cfg, graph, params, x16)
    ref_intended = _torch_forward(model, a_per_slice, x24, w, n)
    ref_flattened = _torch_forward(model, a_flat, x24, w, n)

    np.testing.assert_allclose(ours, ref_intended, rtol=2e-4, atol=2e-5)
    assert np.abs(ref_intended - ref_flattened).max() > 1e-3, (
        "flattened and per-timestep semantics should measurably differ for "
        "W>1; if they agree the quirk documentation is wrong"
    )
