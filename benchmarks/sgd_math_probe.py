"""Split the inner loop's per-step param-tree math cost (clip + SGD update).

meta_component_probe.json: 90 chained clip+update passes on the real
~860K-param tree cost 0.321 ms/iter — FLOP-negligible (3 elementwise
passes over 3.4 MB ~ 12 us at HBM BW) but sitting on the inner loop's
dependent chain 182 times per meta step (~58 ms of the 288 ms step).
Hypothesis: ~23 leaves x (sumsq reduce + scale + update) lower to ~50
back-to-back tiny TPU ops, each paying pipeline ramp/drain.

Arms (90 chained iterations each, interleaved in one window):
  update_only — p - lr*g per leaf (no clip): the floor of the tree-math.
  clip_update — the real clip_global_norm_tree + update (the inner step's).
  flat        — same math on ONE flattened vector: ravel+concat once,
                one fused sumsq, one fused scale+update, slice back.
  flat_noclip — flat update without clip (attribution).

Output: benchmarks/sgd_math_probe.json.
Run: cd /root/repo && python benchmarks/sgd_math_probe.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

SELF_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(SELF_DIR))
sys.path.insert(0, SELF_DIR)

ITERS = 90


def main(rounds: int = 8) -> int:
    import time

    import jax
    import jax.numpy as jnp

    from _interleave import run_interleaved
    from weatherforecast_stgcn_maml_tpu.config import ModelConfig
    from weatherforecast_stgcn_maml_tpu.models.registry import init_model
    from weatherforecast_stgcn_maml_tpu.train.optimizers import (
        clip_global_norm_tree,
    )

    cfg = ModelConfig(compute_dtype="bfloat16")
    params = init_model(jax.random.key(0), cfg)
    lr = 0.01
    clip = 1.0

    leaves, treedef = jax.tree.flatten(params)
    sizes = [l.size for l in leaves]
    shapes = [l.shape for l in leaves]
    offs = np.concatenate([[0], np.cumsum(sizes)]).tolist()
    total = int(offs[-1])
    print(f"[sgd-math] {len(leaves)} leaves, {total} params", file=sys.stderr)

    def chain(body):
        def run(p):
            def link(pp, _):
                return body(pp), None

            p, _ = jax.lax.scan(link, p, None, length=ITERS)
            return jax.tree.leaves(p)[0].astype(jnp.float32).sum()

        return jax.jit(run)

    def fake_grad(p):
        return jax.tree.map(lambda a: a * 1e-6, p)

    def update_only(p):
        g = fake_grad(p)
        return jax.tree.map(lambda a, b: a - lr * b, p, g)

    def clip_update(p):
        g = fake_grad(p)
        g, _ = clip_global_norm_tree(g, clip)
        return jax.tree.map(lambda a, b: a - lr * b, p, g)

    def to_flat(p):
        return jnp.concatenate(
            [l.reshape(-1) for l in jax.tree.leaves(p)]
        )

    def from_flat(v):
        ls = [
            jax.lax.dynamic_slice(v, (offs[i],), (sizes[i],)).reshape(shapes[i])
            for i in range(len(sizes))
        ]
        return jax.tree.unflatten(treedef, ls)

    def flat(p):
        v = to_flat(p)
        g = v * 1e-6
        norm = jnp.sqrt(jnp.sum(jnp.square(g)))
        scale = jnp.where(norm > clip, clip / (norm + 1e-6), 1.0)
        v = v - (lr * scale) * g
        return from_flat(v)

    def flat_noclip(p):
        v = to_flat(p)
        g = v * 1e-6
        v = v - lr * g
        return from_flat(v)

    arms = {}
    for name, body in [
        ("update_only", update_only), ("clip_update", clip_update),
        ("flat", flat), ("flat_noclip", flat_noclip),
    ]:
        fn = chain(body)
        t0 = time.perf_counter()
        np.asarray(fn(params))
        print(f"[sgd-math] {name} compiled {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

        def rep(fn=fn):
            np.asarray(fn(params))

        arms[name] = rep

    timed = run_interleaved(arms, rounds, "sgd-math")
    report = {
        "backend": jax.default_backend(),
        "iters": ITERS,
        "num_leaves": len(leaves),
        "num_params": total,
        "raw": timed,
        "per_iter_ms": {k: timed[k]["best_ms"] / ITERS for k in timed},
    }
    for k in timed:
        print(f"[sgd-math] {k}: {timed[k]['best_ms'] / ITERS * 1000:.1f} us/iter",
              file=sys.stderr)
    with open(os.path.join(SELF_DIR, "sgd_math_probe.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "raw"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
