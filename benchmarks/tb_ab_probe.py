"""A/B the time-blocked (tb) merged LSTM kernels on the production meta step.

benchmarks/pipe_chain_probe.json put the chained LSTM grad at ~0.95 ms per
grad at b=512 — ~3.3x its FLOP floor — with grid-step overhead (per-time-
slice block streaming setup) as the prime suspect, mirroring what
_TIME_BLOCK=4 fixed for the GCN train kernel (gcn_block_probe.json). This
probe measures _TB_MAX = 1 (old one-slice-per-program grid) vs 4 on the
full reference-scale meta step and the isolated LSTM-stack gradient,
interleaved round-robin in one window.

Output: benchmarks/tb_ab_probe.json.
Run: cd /root/repo && python benchmarks/tb_ab_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)


def main(rounds: int = 8) -> int:
    import jax
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from weatherforecast_stgcn_maml_tpu.config import (
        DataConfig,
        MetaConfig,
        ModelConfig,
    )
    from weatherforecast_stgcn_maml_tpu.data.synthetic import (
        synthetic_region_for_box,
    )
    from weatherforecast_stgcn_maml_tpu.ops import fused_lstm_stack as fls
    from weatherforecast_stgcn_maml_tpu.train import maml
    from weatherforecast_stgcn_maml_tpu.train.tasks import (
        build_meta_tasks,
        stack_tasks,
    )
    from weatherforecast_stgcn_maml_tpu.utils.prng import make_key

    model_cfg = ModelConfig(compute_dtype="bfloat16")
    meta_cfg = MetaConfig()
    boxes = [(10.0 + 6 * i, 15.0 + 6 * i, 20.0, 25.0) for i in range(4)]
    regions = [
        synthetic_region_for_box(b, num_timesteps=160, seed=i)
        for i, b in enumerate(boxes)
    ]
    built = build_meta_tasks(regions, model_cfg, meta_cfg, DataConfig())
    tasks = jax.tree.map(jnp.asarray, stack_tasks([b.task for b in built]))
    key = make_key(7, meta_cfg.rng_impl)

    report: dict = {"backend": jax.default_backend(),
                    "nodes": int(tasks.a_hat.shape[-1])}

    n = int(tasks.a_hat.shape[-1])
    rng = np.random.default_rng(0)
    lstm_params = {
        "layers": [
            {
                "wx": jnp.asarray(rng.normal(
                    size=(model_cfg.hidden_channels if l == 0
                          else model_cfg.lstm_hidden, 4 * model_cfg.lstm_hidden)
                ).astype(np.float32) * 0.05),
                "wh": jnp.asarray(rng.normal(
                    size=(model_cfg.lstm_hidden, 4 * model_cfg.lstm_hidden)
                ).astype(np.float32) * 0.05),
                "b": jnp.asarray(rng.normal(
                    size=(4 * model_cfg.lstm_hidden,)).astype(np.float32)),
            }
            for l in range(model_cfg.lstm_layers)
        ]
    }
    xl = jnp.asarray(rng.normal(
        size=(n, model_cfg.window, model_cfg.hidden_channels)
    ).astype(np.float32), jnp.bfloat16)

    arms = {}
    outs = {}
    for tbmax in (1, 4):
        fls._TB_MAX = tbmax
        step = jax.jit(maml.make_meta_step(model_cfg, meta_cfg))
        st = maml.init_meta_state(jax.random.key(1), model_cfg, meta_cfg)
        outs[f"meta_loss_tb{tbmax}"] = float(
            np.asarray(step(st, tasks, key)[1]["meta_loss"])
        )

        def lstm_loss(p, x):
            return fls.lstm_stack_last_all(
                p, x, compute_dtype=jnp.bfloat16
            ).astype(jnp.float32).sum()

        gfn = jax.jit(jax.grad(lstm_loss))
        np.asarray(jax.tree.leaves(gfn(lstm_params, xl))[0])

        def rep_meta(step=step, st=st):
            np.asarray(step(st, tasks, key)[1]["meta_loss"])

        def rep_grad(gfn=gfn):
            np.asarray(jax.tree.leaves(gfn(lstm_params, xl))[0])

        arms[f"meta_tb{tbmax}"] = rep_meta
        arms[f"lstmgrad_tb{tbmax}"] = rep_grad
    fls._TB_MAX = 4

    report["meta_loss_check"] = outs
    timed = run_interleaved(arms, rounds, "tb-ab")
    report["raw"] = timed
    for k in sorted(arms):
        print(f"[tb-ab] {k}: best {timed[k]['best_ms']:.2f} ms "
              f"median {timed[k]['median_ms']:.2f} ms", file=sys.stderr)

    with open(os.path.join(SELF_DIR, "tb_ab_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
